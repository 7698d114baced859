import io
import json
import os
import os.path as osp

import numpy as np
import pytest

from declip_tpu.data import (
    ClipDataLoader,
    ClipDataset,
    DistributedGivenIterationSampler,
    ImageNetEvaluator,
    build_common_augmentation,
    compute_total_iter,
)
from declip_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


@pytest.fixture(scope="module")
def synth_dataset():
    return ClipDataset(root_dir="", meta_file="64", read_from="synthetic",
                       transform=build_common_augmentation("ONECROP"))


def test_synthetic_dataset_items(synth_dataset):
    item = synth_dataset[3]
    assert item["image"].shape == (224, 224, 3)
    assert item["caption"].startswith("a photo of pattern")
    assert len(synth_dataset) == 64


def test_jsonl_dataset_and_prompts(tmp_path):
    meta = tmp_path / "meta.jsonl"
    with open(meta, "w") as f:
        for i in range(4):
            f.write(json.dumps({"filename": f"x{i}.jpg", "caption": f"cap {i}",
                                "label": i % 2,
                                "label_name": ["cat", "dog"][i % 2]}) + "\n")
    ds = ClipDataset(root_dir=str(tmp_path), meta_file=str(meta),
                     label_texts_ensemble="prompt80")
    texts, matrix = ds.get_label_texts()
    assert len(texts) == 2 * 80  # 80 prompt templates x 2 classes
    assert matrix.shape == (2, 2)
    assert "cat" in texts[0]

    # fseek mode reads identical metadata
    ds2 = ClipDataset(root_dir=str(tmp_path), meta_file=str(meta), fseek=True)
    assert len(ds2) == 4
    assert ds2._meta(2)["caption"] == "cap 2"


def test_bad_caption_resample(tmp_path):
    meta = tmp_path / "meta.jsonl"
    with open(meta, "w") as f:
        f.write(json.dumps({"filename": "a.jpg", "caption": "一只猫"}) + "\n")
        f.write(json.dumps({"filename": "b.jpg", "caption": "good cat"}) + "\n")
    from declip_tpu.data.dataset import contains_chinese

    assert contains_chinese("一只猫")
    assert not contains_chinese("good cat")


def test_sampler_determinism_and_resume():
    s1 = DistributedGivenIterationSampler(
        dataset_size=100, total_iter=10, batch_size=4, world_size=2, rank=0)
    s2 = DistributedGivenIterationSampler(
        dataset_size=100, total_iter=10, batch_size=4, world_size=2, rank=0)
    assert np.array_equal(s1.indices, s2.indices)
    # resume at iter 3 skips exactly 3 batches
    s3 = DistributedGivenIterationSampler(
        dataset_size=100, total_iter=10, batch_size=4, world_size=2, rank=0,
        last_iter=2)
    assert list(s3)[:4] == s1.indices[12:16].tolist()
    # ranks partition the stream
    r1 = DistributedGivenIterationSampler(
        dataset_size=100, total_iter=10, batch_size=4, world_size=2, rank=1)
    assert not np.array_equal(s1.indices, r1.indices)


def test_compute_total_iter():
    assert compute_total_iter({"max_iter": 5}, 100, 4) == 5
    assert compute_total_iter({"max_epoch": 2, "batch_size": 5}, 100, 4) == 10


def test_dataloader_batches(synth_dataset):
    sampler = DistributedGivenIterationSampler(
        dataset_size=64, total_iter=3, batch_size=8)
    loader = ClipDataLoader(
        synth_dataset, sampler, 8, eda=True, text_mask_type="MLM",
        num_workers=2,
    )
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["images"].shape == (8, 224, 224, 3)
    assert b["tokens"].shape == (8, 77)
    assert b["tokens_aug"].shape == (8, 77)
    assert b["mlm_tokens"].shape == (8, 77)
    assert (b["mlm_labels"] != -100).sum() > 0
    # determinism: rebuilding the loader gives identical batches
    loader2 = ClipDataLoader(
        synth_dataset,
        DistributedGivenIterationSampler(dataset_size=64, total_iter=3,
                                         batch_size=8),
        8, eda=True, text_mask_type="MLM", num_workers=2,
    )
    b2 = next(iter(loader2))
    np.testing.assert_array_equal(b["tokens"], b2["tokens"])
    np.testing.assert_array_equal(b["mlm_tokens"], b2["mlm_tokens"])
    np.testing.assert_array_equal(b["tokens_aug"], b2["tokens_aug"])


def test_multiview_transforms():
    from PIL import Image

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (300, 400, 3), np.uint8))
    two = build_common_augmentation("MOCOV2")(img)
    assert two.shape == (224, 224, 6)
    slip = build_common_augmentation("SLIP")(img)
    assert slip.shape == (224, 224, 9)
    one = build_common_augmentation("ONECROP")(img)
    assert one.shape == (224, 224, 3)
    # normalization applied
    raw = np.asarray(img.resize((224, 224)), np.float32) / 255
    assert abs(one.mean()) < abs(((raw - 0.45) / 0.25).mean()) + 3


def test_evaluator():
    ev = ImageNetEvaluator()
    scores = np.asarray([[0.9, 0.1, 0], [0.1, 0.8, 0.1], [0.3, 0.3, 0.4]])
    labels = np.asarray([0, 1, 0])
    m = ev.eval_arrays(scores, labels)
    assert m["top1"] == pytest.approx(100 * 2 / 3)
    assert m["n"] == 3


def test_imagenet_fs_mode_attributes(tmp_path):
    """Regression: ImageNetDataset must work outside synthetic mode (it was
    missing server_cfg/image_reader_type and crashed on _meta/_load_image)."""
    import numpy as np
    from PIL import Image

    from declip_tpu.data.dataset import ImageNetDataset
    from declip_tpu.data import build_common_augmentation

    img_path = tmp_path / "img.jpg"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
    ).save(img_path)
    meta = tmp_path / "meta.txt"
    meta.write_text("img.jpg 1\nimg.jpg 0\n")
    ds = ImageNetDataset(str(tmp_path), str(meta),
                         transform=build_common_augmentation("ONECROP"),
                         read_from="fake")
    item = ds[0]
    assert item["image"].shape == (224, 224, 3)
    assert item["label"] == 1


def test_fake_cache_is_per_instance(tmp_path):
    import numpy as np
    from PIL import Image

    from declip_tpu.data.dataset import ClipDataset

    import json
    for name, shade in (("a", 10), ("b", 240)):
        Image.fromarray(np.full((32, 32, 3), shade, np.uint8)).save(
            tmp_path / f"{name}.png")
        (tmp_path / f"{name}.jsonl").write_text(
            json.dumps({"filename": f"{name}.png", "caption": "x"}) + "\n")
    ds_a = ClipDataset(str(tmp_path), str(tmp_path / "a.jsonl"),
                       read_from="fake")
    ds_b = ClipDataset(str(tmp_path), str(tmp_path / "b.jsonl"),
                       read_from="fake")
    img_a = np.asarray(ds_a[0]["image"])
    img_b = np.asarray(ds_b[0]["image"])
    assert img_a.mean() < 50 and img_b.mean() > 200


def test_autoaug_clsa_cutout_dispatch():
    """Reference names from imagenet_dataloader.py:14-150 all build and
    produce correct shapes/view counts."""
    import random

    from PIL import Image

    from declip_tpu.data.transforms import (
        build_common_augmentation,
        build_transformer,
    )

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (300, 260, 3), np.uint8),
        "RGB")
    rng = random.Random(0)

    out = build_common_augmentation("AUTOAUG", rng)(img)
    assert out.shape == (224, 224, 3) and out.dtype == np.float32

    # explicit strong resolutions: 2 base views + one per resolution
    views = build_common_augmentation("CLSA5-16-32", rng)(img)
    assert isinstance(views, list) and len(views) == 4
    assert views[0].shape == views[1].shape == (224, 224, 3)
    assert views[2].shape == (16, 16, 3)
    assert views[3].shape == (32, 32, 3)

    # range spec: one strong resolution drawn from [lo, hi]
    views = build_common_augmentation("CLSA5-96_128", rng)(img)
    assert len(views) == 3
    assert 96 <= views[2].shape[0] <= 128

    # list-style pipeline with the cutout registry entry
    # (transforms.py:160-210)
    t = build_transformer([
        {"type": "random_resized_crop", "kwargs": {"size": 64}},
        {"type": "to_tensor"},
        {"type": "normalize"},
        {"type": "cutout", "kwargs": {"n_holes": 1, "length": 16,
                                      "prob": 1.0}},
    ])
    arr = t(img)
    assert arr.shape == (64, 64, 3)
    assert (arr == 0.0).any()  # cutout hole present


def test_list_style_transforms_via_dataset_builder():
    from declip_tpu.data.dataloader import build_clip_dataset

    ds = build_clip_dataset({
        "read_from": "synthetic", "meta_file": "8",
        "transforms": [
            {"type": "resize", "kwargs": {"size": 32}},
            {"type": "center_crop", "kwargs": {"size": 32}},
            {"type": "to_tensor"},
            {"type": "normalize"},
        ],
    })
    assert ds[0]["image"].shape == (32, 32, 3)


def test_gcs_backend_reads_bytes(tmp_path):
    """read_from: gcs — GCS object bytes via an injected client (the real
    google.cloud.storage.Client is wired lazily; hermetic test uses a stub
    with the same bucket/blob surface)."""
    import io
    import json as _json

    from PIL import Image

    from declip_tpu.data.dataset import ClipDataset, _split_gcs_path

    assert _split_gcs_path("gs://bkt/a/b.jpg") == ("bkt", "a/b.jpg")
    assert _split_gcs_path("bkt/a.jpg") == ("bkt", "a.jpg")

    buf = io.BytesIO()
    Image.new("RGB", (48, 48), (10, 200, 30)).save(buf, "JPEG")
    payload = buf.getvalue()

    class FakeBlob:
        def __init__(self, key):
            self.key = key

        def download_as_bytes(self):
            assert self.key == "images/img_0.jpg"
            return payload

    class FakeBucket:
        def __init__(self, name):
            assert name == "mybucket"

        def blob(self, key):
            return FakeBlob(key)

    class FakeClient:
        def bucket(self, name):
            return FakeBucket(name)

    meta = tmp_path / "m.jsonl"
    meta.write_text(_json.dumps(
        {"filename": "img_0.jpg", "caption": "a green square"}) + "\n")
    ds = ClipDataset(
        root_dir="gs://mybucket/images", meta_file=str(meta),
        read_from="gcs", gcs_client=FakeClient())
    item = ds[0]
    assert item["caption"] == "a green square"
    assert np.asarray(item["image"]).shape == (48, 48, 3)


def test_gcs_metafiles_all_paths(tmp_path, monkeypatch):
    """gs:// metafiles work on EVERY meta-reading path: the in-RAM scan
    (_open_meta), the fseek byte-offset scan (_localize_meta downloads to a
    local cache once — object stores have no random access), and
    ImageNetDataset's whitespace metafile."""
    import json as _json
    import sys
    import types

    from declip_tpu.data import dataset as ds_mod

    jsonl = b"".join(
        _json.dumps({"filename": f"i_{i}.jpg", "caption": f"cap {i}"}
                    ).encode() + b"\n" for i in range(5))
    in_meta = b"n01/a.JPEG 0\nn02/b.JPEG 1\n"
    store = {"gs://bkt/train.jsonl": jsonl, "gs://bkt/val.txt": in_meta}

    class FakeFile(io.BytesIO):
        def __init__(self, data, mode):
            super().__init__(data)
            self._text = "b" not in mode

        def open(self):
            return (io.TextIOWrapper(io.BytesIO(self.getvalue()))
                    if self._text else io.BytesIO(self.getvalue()))

        def __enter__(self):
            return self.open() if self._text else self

        def __exit__(self, *a):
            return False

    fake = types.ModuleType("fsspec")
    fake.open = lambda path, mode="r": FakeFile(store[path], mode)
    monkeypatch.setitem(sys.modules, "fsspec", fake)
    monkeypatch.setenv("DECLIP_META_CACHE", str(tmp_path / "meta_cache"))

    # in-RAM scan
    d1 = ds_mod.ClipDataset(root_dir="", meta_file="gs://bkt/train.jsonl",
                            read_from="fake")
    assert len(d1) == 5 and d1._meta(2)["caption"] == "cap 2"
    # fseek scan: downloaded once, offsets point at the LOCAL cache file
    d2 = ds_mod.ClipDataset(root_dir="", meta_file="gs://bkt/train.jsonl",
                            read_from="fake", fseek=True)
    assert len(d2) == 5
    local_path = d2._offsets[0][0]
    assert not local_path.startswith("gs://") and osp.exists(local_path)
    assert d2._meta(3)["caption"] == "cap 3"
    # second construction hits the cache (no fsspec call): poison the store
    store.pop("gs://bkt/train.jsonl")
    d3 = ds_mod.ClipDataset(root_dir="", meta_file="gs://bkt/train.jsonl",
                            read_from="fake", fseek=True)
    assert d3._meta(1)["caption"] == "cap 1"
    # ImageNet whitespace metafile
    d4 = ds_mod.ImageNetDataset(root_dir="", meta_file="gs://bkt/val.txt")
    assert len(d4) == 2 and d4._meta(1)["label"] == 1
