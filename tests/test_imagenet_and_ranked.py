import json

import numpy as np

from declip_tpu.data.dataset import ClipDatasetRanked
from declip_tpu.data.imagenet import (
    build_imagenet_test_dataloader,
    build_imagenet_train_dataloader,
)


def _imagenet_meta(tmp_path, n=12):
    meta = tmp_path / "train.txt"
    lines = [f"img_{i}.jpg {i % 3}" for i in range(n)]
    meta.write_text("\n".join(lines))
    return str(meta)


def test_imagenet_train_loader(tmp_path):
    meta = _imagenet_meta(tmp_path)
    loader = build_imagenet_train_dataloader(
        {"meta_file": meta, "batch_size": 4, "max_iter": 2,
         "read_from": "synthetic", "root_dir": "",
         "transforms": {"type": "ONECROP"}},
    )
    # synthetic read ignores the file bytes; labels flow from the metafile
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["images"].shape == (4, 224, 224, 3)
    assert set(np.asarray(batches[0]["labels"]).tolist()) <= {0, 1, 2}


def test_imagenet_test_dataset(tmp_path):
    meta = _imagenet_meta(tmp_path, 6)
    ds = build_imagenet_test_dataloader(
        {"meta_file": meta, "read_from": "synthetic", "root_dir": "",
         "transforms": {"type": "ONECROP"}})
    assert len(ds) == 6
    item = ds[0]
    assert item["label"] == 0


def test_ranked_dataset_partition(tmp_path):
    meta = tmp_path / "m.jsonl"
    with open(meta, "w") as f:
        for i in range(20):
            f.write(json.dumps({"filename": f"{i}.jpg",
                                "caption": f"c {i}"}) + "\n")
    sizes = []
    seen = set()
    for r in range(4):
        ds = ClipDatasetRanked(root_dir=str(tmp_path), meta_file=str(meta),
                               world_size=4, rank=r)
        sizes.append(len(ds))
        for i in range(len(ds)):
            seen.add(ds._meta(i)["filename"])
    assert len(set(sizes)) == 1  # padded to equal length
    assert len(seen) == 20  # full coverage across ranks
