"""int8 quantized inference (ops/quant.py) — the TPU-native analogue of the
reference's NNIE/Caffe INT8 deploy targets
(/root/reference/prototype/tools/convert.py:31-60).

Checks: (a) dynamic-int8 Dense interception tracks the fp32 towers closely,
(b) the min_dim gate really no-ops, (c) a --quantize int8 serving export
round-trips standalone and matches the in-process quantized outputs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "experiments", "unit", "tiny_clip", "config.yaml")


@pytest.fixture(scope="module")
def tiny_clip():
    from declip_tpu.models import model_entry

    model = model_entry({"type": "clip_vitb32", "kwargs": {
        "image_encode": {"embed_dim": 64, "input_resolution": 64,
                         "patch_size": 16, "width": 64, "layers": 2,
                         "heads": 2},
        "text_encode": {"embed_dim": 64, "transformer_width": 64,
                        "transformer_heads": 2, "transformer_layers": 2,
                        "vocab_size": 128},
        "clip": {"use_allgather": False}}})
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32),
        "tokens": jnp.asarray(rng.integers(1, 128, (4, 77)), jnp.int32),
    }
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=True))()
    return model, variables, batch


def _cos(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))


def test_int8_tracks_fp32_towers(tiny_clip):
    from declip_tpu.ops.quant import int8_jit

    model, variables, batch = tiny_clip
    img_fn = lambda v, x: model.apply(v, x, method="encode_image")  # noqa
    txt_fn = lambda v, t: model.apply(v, t, method="encode_text")  # noqa

    ref_img = jax.jit(img_fn)(variables, batch["images"])
    ref_txt = jax.jit(txt_fn)(variables, batch["tokens"])
    # int8_jit (not jit-under-context): img_fn's fp32 trace above would be
    # silently reused otherwise — jit caches by function identity
    q_img = int8_jit(img_fn, min_dim=32)(variables, batch["images"])
    q_txt = int8_jit(txt_fn, min_dim=32)(variables, batch["tokens"])

    assert _cos(ref_img, q_img).min() > 0.995
    assert _cos(ref_txt, q_txt).min() > 0.995
    # and it actually changed the numbers (the interception fired)
    assert not np.allclose(np.asarray(ref_img), np.asarray(q_img))


def test_min_dim_gate_noops(tiny_clip):
    from declip_tpu.ops.quant import int8_inference

    model, variables, batch = tiny_clip
    fn = lambda v, x: model.apply(v, x, method="encode_image")  # noqa
    ref = jax.jit(fn)(variables, batch["images"])
    with int8_inference(min_dim=10_000):  # no Dense is this wide
        gated = jax.jit(fn)(variables, batch["images"])
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(gated))


def test_quantized_dense_vs_exact():
    """Row/col scale algebra: an int8 Dense on well-conditioned inputs is
    within the 1/127 quantization budget of the exact product."""
    import flax.linen as nn

    from declip_tpu.ops.quant import int8_inference

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 96)), jnp.float32)
    dense = nn.Dense(128)
    variables = dense.init(jax.random.PRNGKey(0), x)
    want = dense.apply(variables, x)
    with int8_inference(min_dim=64):
        got = dense.apply(variables, x)
    err = np.abs(np.asarray(got) - np.asarray(want))
    scale = np.abs(np.asarray(want)).max()
    assert err.max() / scale < 0.02


def test_quantized_serving_export_roundtrip(tmp_path):
    from jax import export as jexport

    from declip_tpu.tools._common import load_eval_model
    from declip_tpu.tools.convert import export_serving

    files = export_serving(CONFIG, str(tmp_path), quantize="int8")
    by_name = {os.path.basename(p).split(".")[0]: p for p in files}
    assert set(by_name) == {"encode_image", "encode_text"}

    model, variables = load_eval_model(CONFIG)  # same seed as the export
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 224, 224, 3)), jnp.float32)

    with open(by_name["encode_image"], "rb") as f:
        img_fn = jexport.deserialize(f.read())
    got = np.asarray(img_fn.call(img))

    # NOTE: dynamic int8 graphs are not bit-stable across separate
    # compilations (round() at half-LSB boundaries amplifies 1-ulp fusion
    # differences), so the artifact is compared against the fp32 reference
    # with the quantization error budget, not against a live int8 trace.
    fp32 = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False,
                                 method="encode_image"))(variables, img))
    assert _cos(got, fp32).min() > 0.995
    # and the artifact really is the quantized graph, not an fp32 re-export
    assert not np.allclose(got, fp32, rtol=1e-5, atol=1e-6)
