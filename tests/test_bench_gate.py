"""Throughput-regression gate in bench.py (VERDICT r4 #5).

The driver records BENCH_r{N}.json each round; bench.py's driver mode must
compare its fresh numbers against the newest one and flag any model whose
pairs/s dropped more than 2% — CLIP ViT-B/32's 0.45% margin above the 2x
bar means a silent regression is one refactor away.
"""

import json

import bench


PREV = {
    "metric": "image-text pairs/sec/chip (DeCLIP-R50 train, bf16)",
    "value": 729.9, "unit": "pairs/s/chip", "vs_baseline": 2.433,
    "extra": {
        "clip_vitb32": {"metric": "...", "value": 2008.6,
                        "unit": "pairs/s/chip", "vs_baseline": 2.009},
        "clip_vitl14": {"metric": "...", "value": 156.9,
                        "unit": "pairs/s/chip", "vs_baseline": 1.961},
    },
}


def _current(r50=729.9, b32=2008.6, l14=156.9):
    return {
        "metric": "image-text pairs/sec/chip (DeCLIP-R50 train, bf16)",
        "value": r50, "unit": "pairs/s/chip",
        "extra": {
            "clip_vitb32": {"metric": "...", "value": b32,
                            "unit": "pairs/s/chip"},
            "clip_vitl14": {"metric": "...", "value": l14,
                            "unit": "pairs/s/chip"},
        },
    }


def test_no_regression_no_flag():
    out = _current()
    assert bench.check_regression(out, prev_line=PREV) == {}
    assert "regression" not in out


def test_small_drop_within_threshold():
    out = _current(b32=2008.6 * 0.99)  # -1% < 2% threshold
    assert bench.check_regression(out, prev_line=PREV) == {}


def test_synthetic_regression_flagged():
    out = _current(b32=2008.6 * 0.95, l14=156.9 * 0.90)
    drops = bench.check_regression(out, prev_line=PREV)
    assert set(drops) == {"clip_vitb32", "clip_vitl14"}
    assert abs(drops["clip_vitb32"]["drop_pct"] - 5.0) < 0.1
    assert out["regression"]["models"]["clip_vitl14"]["drop_pct"] > 9
    # the line must still be a valid single-JSON artifact with the flag in
    json.dumps(out)


def test_headline_regression_flagged():
    out = _current(r50=729.9 * 0.9)
    drops = bench.check_regression(out, prev_line=PREV)
    assert "declip_res50" in drops


def test_loads_previous_round_artifact():
    """The repo's real BENCH_r*.json history parses into model->pairs."""
    prev = bench.load_previous_bench()
    assert prev, "no BENCH_r*.json found in repo root"
    vals = bench._bench_values(prev["line"])
    assert vals.get("declip_res50", 0) > 0


def test_input_bench_smoke():
    """Composed input path (VERDICT r4 #3): wds shards -> process workers ->
    native decode -> geometry crops runs end-to-end and reports a margin
    table against the recorded chip rates."""
    out = bench.run_input_bench(n_images=64, batch=16, workers=2, steps=3)
    assert out["img_per_s"] > 0
    assert out["vs_chip"]["models"]["declip_res50"]["chip_img_per_s"] > 0
    assert out["vs_chip"]["models"]["declip_res50"]["workers_for_1x"] >= 1


def test_geometry_transforms_pickle():
    """Geometry transforms must pickle (the device-aug override rides into
    worker_type: process loader workers via the proc spec)."""
    import pickle

    from declip_tpu.data.transforms import (
        build_common_augmentation,
        build_geometry_augmentation,
    )

    from PIL import Image
    import numpy as np

    img = Image.new("RGB", (320, 240), (120, 30, 60))
    for preset in ("STANDARD_CLIP", "ONECROP", "MOCOV2", "SLIP"):
        t = pickle.loads(pickle.dumps(build_geometry_augmentation(preset)))
        out = t(img)
        assert out.dtype == np.uint8
    t = pickle.loads(pickle.dumps(build_common_augmentation("MOCOV2")))
    assert t(img) is not None
