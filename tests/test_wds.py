"""WebDataset tar-shard dataset (declip_tpu/data/wds.py).

Beyond-reference data format: LAION-style ``<key>.jpg`` + ``<key>.txt`` tar
shards served map-style through the ClipDataset item protocol, locally and
from (fake, in-memory) ``gs://`` object storage.
"""

import io
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from declip_tpu.data.wds import (
    WdsClipDataset,
    build_tar_index,
    expand_shards,
)


def _jpeg_bytes(color, size=16) -> bytes:
    img = Image.new("RGB", (size, size), color)
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return buf.getvalue()


def _add(tf: tarfile.TarFile, name: str, data: bytes):
    ti = tarfile.TarInfo(name)
    ti.size = len(data)
    tf.addfile(ti, io.BytesIO(data))


def _write_shard(path, samples, writer_pad=False):
    """samples: list of (key, members dict ext->bytes)."""
    with tarfile.open(path, "w") as tf:
        for key, members in samples:
            for ext, data in members.items():
                _add(tf, f"{key}.{ext}", data)
    if writer_pad:
        with open(path, "ab") as f:
            f.write(b"\0" * 1024)


@pytest.fixture
def shards(tmp_path):
    s0 = tmp_path / "shard-0000.tar"
    _write_shard(s0, [
        ("000/a", {"jpg": _jpeg_bytes((255, 0, 0)),
                   "txt": b"a red square\n"}),
        ("000/b", {"jpeg": _jpeg_bytes((0, 255, 0)),
                   "json": json.dumps({"caption": "a green square",
                                       "label": 3,
                                       "label_name": "green"}).encode()}),
        # txt caption wins over json's when both exist (wds convention:
        # .txt IS the caption)
        ("000/c", {"png": _png_bytes((0, 0, 255)),
                   "txt": b"a blue square",
                   "json": json.dumps({"caption": "ignored"}).encode(),
                   "cls": b"7"}),
        # metadata-only key: no image member -> skipped entirely
        ("000/meta_only", {"json": b"{}"}),
        # bad caption: empty -> __getitem__ resamples another index
        ("000/bad", {"jpg": _jpeg_bytes((9, 9, 9)), "txt": b""}),
    ])
    s1 = tmp_path / "shard-0001.tar"
    _write_shard(s1, [
        ("111/d", {"jpg": _jpeg_bytes((128, 128, 0)),
                   "txt": b"a yellow square"}),
    ], writer_pad=True)  # trailing zero pad between appends is tolerated
    return [str(s0), str(s1)]


def _png_bytes(color, size=16) -> bytes:
    img = Image.new("RGB", (size, size), color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_expand_shards_brace():
    got = expand_shards("pre-{0008..0011}.tar")
    assert got == ["pre-0008.tar", "pre-0009.tar",
                   "pre-0010.tar", "pre-0011.tar"]
    # zero-padding follows the left endpoint; lists concatenate in order
    assert expand_shards(["x-{08..10}.tar", "y.tar"]) == [
        "x-08.tar", "x-09.tar", "x-10.tar", "y.tar"]


def test_expand_shards_glob(tmp_path, shards):
    got = expand_shards(str(tmp_path / "shard-*.tar"))
    assert got == shards


def test_index_and_sidecar_cache(shards):
    idx = build_tar_index(shards[0])
    names = [n for n, _, _ in idx]
    assert "000/a.jpg" in names and "000/c.cls" in names
    # every (offset, size) range reads back the member's exact bytes
    with open(shards[0], "rb") as f:
        for name, off, size in idx:
            f.seek(off)
            data = f.read(size)
            if name == "000/a.txt":
                assert data == b"a red square\n"
    sidecar = shards[0] + ".idx.json"
    assert os.path.exists(sidecar)
    # cache hit: poison the sidecar members and confirm they are served
    with open(sidecar) as f:
        d = json.load(f)
    d["members"][0][0] = "POISON"
    with open(sidecar, "w") as f:
        json.dump(d, f)
    assert build_tar_index(shards[0])[0][0] == "POISON"
    # size change invalidates: append a member -> rebuild (no POISON)
    with tarfile.open(shards[0], "a") as tf:
        _add(tf, "zzz/e.jpg", _jpeg_bytes((1, 2, 3)))
    names2 = [n for n, _, _ in build_tar_index(shards[0])]
    assert "POISON" not in names2 and "zzz/e.jpg" in names2


def test_dataset_items(shards):
    ds = WdsClipDataset(shards, transform=None)
    # 5 keys minus the metadata-only one, plus shard-0001's single sample
    assert len(ds) == 5
    a = ds[0]
    assert a["caption"] == "a red square"
    assert a["label"] == -1
    assert isinstance(a["image"], Image.Image)
    assert np.asarray(a["image"])[0, 0, 0] > 200  # red
    b = ds[1]
    assert b["caption"] == "a green square"
    assert b["label"] == 3 and b["label_name"] == "green"
    c = ds[2]
    assert c["caption"] == "a blue square"  # .txt wins over .json
    assert c["label"] == 7  # .cls wins over json label
    d = ds[4]
    assert d["caption"] == "a yellow square"
    assert shards[1] in d["filename"]


def test_bad_caption_resamples(shards):
    ds = WdsClipDataset(shards, transform=None, seed=0)
    # index 3 is the empty-caption sample -> must come back as some OTHER
    # valid sample instead of raising
    item = ds[3]
    assert item["caption"] in {"a red square", "a green square",
                               "a blue square", "a yellow square"}


def test_zero_shot_prompts(shards):
    ds = WdsClipDataset(shards, transform=None)
    texts, matrix = ds.get_label_texts()
    assert any("green" in t for t in texts)
    assert matrix.shape[0] == matrix.shape[1]


def test_dataloader_end_to_end(shards):
    from declip_tpu.data.dataloader import build_clip_dataloader

    loader = build_clip_dataloader({
        "type": "clip_wds",
        "tar_files": shards,
        "batch_size": 4,
        "num_workers": 2,
        "max_iter": 2,
        "transforms": {"type": "ONECROP"},
        "sampler": {"type": "distributed_iteration"},
    })
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b["images"].shape == (4, 224, 224, 3)
        assert b["tokens"].shape == (4, 77)


@pytest.fixture
def fake_gs(monkeypatch):
    import fsspec
    from fsspec.implementations.memory import MemoryFileSystem

    MemoryFileSystem.store.clear()
    MemoryFileSystem.pseudo_dirs = [""]

    class FakeGCS(MemoryFileSystem):
        protocol = "gs"

        @classmethod
        def _strip_protocol(cls, path):
            path = str(path)
            if path.startswith("gs://"):
                path = "/" + path[len("gs://"):]
            return super()._strip_protocol(path)

    fsspec.register_implementation("gs", FakeGCS, clobber=True)
    yield FakeGCS()
    MemoryFileSystem.store.clear()
    MemoryFileSystem.pseudo_dirs = [""]


def test_gs_shards(shards, fake_gs, tmp_path, monkeypatch):
    # serve shard-0000 from the fake object store; index sidecar goes to the
    # local cache dir (object stores are not sidecar-writable)
    monkeypatch.setenv("DECLIP_META_CACHE", str(tmp_path / "metacache"))
    with open(shards[0], "rb") as f:
        data = f.read()
    with fake_gs.open("gs://bkt/wds/shard-0000.tar", "wb") as f:
        f.write(data)
    ds = WdsClipDataset("gs://bkt/wds/shard-{0000..0000}.tar",
                        transform=None)
    assert len(ds) == 4
    item = ds[0]
    assert item["caption"] == "a red square"
    assert np.asarray(item["image"])[0, 0, 0] > 200
    # glob over the fake bucket also resolves
    ds2 = WdsClipDataset("gs://bkt/wds/shard-*.tar", transform=None)
    assert len(ds2) == 4


def test_solver_trains_from_wds(shards, tmp_path):
    """Full Solver integration: `data.train.type: clip_wds` trains end-to-end
    (loader build, sampler, train steps, scalars) straight from tar shards."""
    import shutil

    from declip_tpu.config import override, parse_config
    from declip_tpu.solver import Solver

    src = os.path.join(os.path.dirname(__file__), "..", "experiments",
                       "unit", "tiny_clip", "config.yaml")
    shutil.copy(src, tmp_path / "config.yaml")
    cfg = parse_config(str(tmp_path / "config.yaml"))
    cfg = override(cfg, "lr_scheduler.kwargs.max_iter", 2)
    cfg = override(cfg, "saver.val_freq", 0)
    cfg["data"]["train"] = {
        "type": "clip_wds",
        "tar_files": shards,
        "batch_size": 4,
        "num_workers": 2,
        "transforms": {"type": "ONECROP"},
        "sampler": {"type": "distributed_iteration"},
    }
    cfg["_config_path"] = str(tmp_path / "config.yaml")
    solver = Solver(cfg)
    solver.train()
    scalars = (tmp_path / "events" / "scalars.jsonl").read_text().splitlines()
    assert any('"loss"' in ln for ln in scalars)


def test_make_wds_roundtrip(tmp_path):
    """tools/make_wds packs a reference-layout JSONL metafile + image tree
    into shards that WdsClipDataset round-trips exactly."""
    from declip_tpu.tools.make_wds import pack

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    metas = []
    for i in range(5):
        name = f"img_{i}.jpg"
        with open(img_dir / name, "wb") as f:
            f.write(_jpeg_bytes((i * 40, 0, 0)))
        m = {"filename": name, "caption": f"caption number {i}"}
        if i == 2:
            m.update({"label": 9, "label_name": "nine", "tag": "t"})
        metas.append(m)
    metas.append({"filename": "missing.jpg", "caption": "gone"})
    meta = tmp_path / "train.jsonl"
    meta.write_text("\n".join(json.dumps(m) for m in metas))

    out = str(tmp_path / "shard-%05d.tar")
    n, shards, skipped = pack(str(meta), str(img_dir), out,
                              samples_per_shard=2)
    assert (n, shards, skipped) == (5, 3, 1)

    ds = WdsClipDataset(str(tmp_path / "shard-*.tar"), transform=None)
    assert len(ds) == 5
    caps = [ds[i]["caption"] for i in range(5)]
    assert caps == [f"caption number {i}" for i in range(5)]
    assert ds[2]["label"] == 9 and ds[2]["label_name"] == "nine"
    assert ds[2]["tag"] == "t"
    # image bytes copied verbatim: decoded pixels match the source file
    src = np.asarray(Image.open(img_dir / "img_3.jpg"))
    np.testing.assert_array_equal(np.asarray(ds[3]["image"]), src)


def test_cls_only_shard(tmp_path):
    """Eval-style labeled shards (<key>.jpg + <key>.cls, NO caption) must be
    servable: the caption-less labeled sample gets the '-' placeholder
    (same convention as ImageNetDataset) instead of tripping ClipDataset's
    bad-caption resample loop."""
    s = tmp_path / "eval-0000.tar"
    _write_shard(s, [
        ("e/0", {"jpg": _jpeg_bytes((255, 0, 0)), "cls": b"0"}),
        ("e/1", {"jpg": _jpeg_bytes((0, 255, 0)), "cls": b"1"}),
    ])
    ds = WdsClipDataset([str(s)], transform=None)
    assert len(ds) == 2
    a, b = ds[0], ds[1]
    assert a["label"] == 0 and b["label"] == 1
    assert a["caption"] == "-" and b["caption"] == "-"
