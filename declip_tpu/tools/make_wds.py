"""Pack a reference-layout dataset into webdataset tar shards.

Migration companion to ``data/wds.py``: the reference keeps training data as
loose image files addressed by a JSONL metafile
(prototype/data/datasets/clip_dataset.py:66-91); pod training wants few large
sequentially-written objects on GCS instead of millions of small ones. This
tool streams metafile entries into ``shard-%05d.tar`` archives of
``<key>.jpg`` + ``<key>.txt`` (+ ``<key>.json`` when the entry carries
label/label_name/tag) that ``type: clip_wds`` serves directly.

Image bytes are copied verbatim (no decode/re-encode — lossless and fast);
unreadable files are skipped with a count. Output paths may be ``gs://``
(written through fsspec). Usage::

    python -m declip_tpu.tools.make_wds \
        --meta train.jsonl --root /data/images \
        --out gs://bucket/wds/shard-%05d.tar --samples-per-shard 10000
"""

from __future__ import annotations

import argparse
import io
import json
import os.path as osp
import tarfile
from typing import IO, Iterator, Tuple


def _iter_meta(meta_path: str) -> Iterator[dict]:
    from declip_tpu.data.dataset import _open_meta

    with _open_meta(meta_path) as f:
        for line in f:
            if line.strip():
                yield json.loads(line)


def _open_out(path: str) -> IO[bytes]:
    if "://" in path:
        import fsspec

        return fsspec.open(path, "wb").open()
    return open(path, "wb")


def _add(tf: tarfile.TarFile, name: str, data: bytes) -> None:
    ti = tarfile.TarInfo(name)
    ti.size = len(data)
    tf.addfile(ti, io.BytesIO(data))


def pack(meta: str, root: str, out_pattern: str, samples_per_shard: int,
         caption_key: str = "caption") -> Tuple[int, int, int]:
    """-> (n_samples, n_shards, n_skipped). ``out_pattern`` must contain a
    printf-style integer field (e.g. ``shard-%05d.tar``)."""
    n = shard_i = skipped = 0
    tf = raw = None

    def open_shard(i: int):
        nonlocal tf, raw
        raw = _open_out(out_pattern % i)
        tf = tarfile.open(fileobj=raw, mode="w")

    def close_shard():
        if tf is not None:
            tf.close()
            raw.close()

    for entry in _iter_meta(meta):
        caption = entry.get(caption_key, "")
        if isinstance(caption, list):
            caption = caption[0] if caption else ""
        fname = entry.get("filename", "")
        try:
            with open(osp.join(root, fname), "rb") as f:
                img = f.read()
        except OSError:
            skipped += 1
            continue
        if n % samples_per_shard == 0:
            close_shard()
            open_shard(shard_i)
            shard_i += 1
        key = f"{n:09d}"
        ext = osp.splitext(fname)[1].lstrip(".").lower() or "jpg"
        if ext == "jpeg":
            ext = "jpg"
        _add(tf, f"{key}.{ext}", img)
        _add(tf, f"{key}.txt", str(caption).encode())
        side = {k: entry[k] for k in ("label", "label_name", "tag")
                if k in entry}
        if side:
            _add(tf, f"{key}.json", json.dumps(side).encode())
        n += 1
    close_shard()
    return n, shard_i, skipped


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--meta", required=True, help="JSONL metafile")
    ap.add_argument("--root", default="", help="image root dir")
    ap.add_argument("--out", required=True,
                    help="output pattern, e.g. gs://b/wds/shard-%%05d.tar")
    ap.add_argument("--samples-per-shard", type=int, default=10000)
    ap.add_argument("--caption-key", default="caption")
    args = ap.parse_args(argv)
    n, shards, skipped = pack(args.meta, args.root, args.out,
                              args.samples_per_shard, args.caption_key)
    print(json.dumps({"samples": n, "shards": shards, "skipped": skipped}))


if __name__ == "__main__":
    main()
