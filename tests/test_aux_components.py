"""Aux component tests: converter roundtrip, flops, mixup, crash handler,
comms helpers, AutoAugment/CLSA, SSL builders, native lib."""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_convert_roundtrip():
    """ours -> torch state_dict -> ours must be identical (ViT CLIP)."""
    from declip_tpu.convert_pth import torch_state_to_variables
    from declip_tpu.models import model_entry
    from declip_tpu.tools.convert import variables_to_torch_state

    model = model_entry({
        "type": "clip_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": 16, "input_resolution": 64,
                             "patch_size": 32, "width": 32, "layers": 2,
                             "heads": 2},
            "text_encode": {"embed_dim": 16, "transformer_width": 32,
                            "transformer_heads": 2, "transformer_layers": 2},
            "clip": {},
        },
    })
    batch = {"images": jnp.zeros((1, 64, 64, 3)),
             "tokens": jnp.ones((1, 77), jnp.int32)}
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=True))()
    torch_state = variables_to_torch_state(
        {"params": jax.device_get(variables["params"])})
    back = torch_state_to_variables(torch_state)
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = jax.tree_util.tree_leaves_with_path(back["params"])
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=str),
                                  sorted(flat_b, key=str)):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-6,
                                   err_msg=str(pa))


def test_count_params_and_flops():
    from declip_tpu.utils.flops import (
        count_params,
        count_params_by_top_module,
        estimate_flops,
    )

    params = {"a": {"w": jnp.zeros((10, 10))}, "b": jnp.zeros((5,))}
    c = count_params(params)
    assert c["total"] == 105
    by = count_params_by_top_module(params)
    assert by == {"a": 100, "b": 5}
    fl = estimate_flops(lambda x: x @ x, jnp.zeros((64, 64)))
    assert fl is None or fl > 0


def test_mixup_cutmix():
    from declip_tpu.utils.mixup import cutmix_data, mixup_data

    x = jnp.arange(4 * 8 * 8 * 3, dtype=jnp.float32).reshape(4, 8, 8, 3)
    y = jnp.arange(4)
    mx, ya, yb, lam = mixup_data(jax.random.PRNGKey(0), x, y, alpha=1.0)
    assert mx.shape == x.shape and 0 <= float(lam) <= 1
    cx, ya, yb, lam2 = cutmix_data(jax.random.PRNGKey(1), x, y, alpha=1.0)
    assert cx.shape == x.shape and 0 <= float(lam2) <= 1


def test_crash_handler(tmp_path):
    from declip_tpu.utils.debug import install_crash_handler

    old_hook = sys.excepthook
    try:
        install_crash_handler(str(tmp_path))
        try:
            raise ValueError("boom")
        except ValueError:
            sys.excepthook(*sys.exc_info())
        report = json.loads((tmp_path / "crash_report.json").read_text())
        assert report["type"] == "ValueError"
        assert report["message"] == "boom"
    finally:
        sys.excepthook = old_hook


def test_comms_single_host():
    from declip_tpu.parallel.comms import broadcast_object, global_mean, group_split

    from declip_tpu.parallel.comms import gather_object

    assert broadcast_object({"x": 1}) == {"x": 1}
    assert gather_object({"x": 1}) == [{"x": 1}]
    assert group_split(8, 4) == [[0, 1, 2, 3], [4, 5, 6, 7]]
    np.testing.assert_allclose(global_mean([1.0, 2.0]), [1.0, 2.0])


def test_autoaugment_and_clsa():
    import random

    from PIL import Image

    from declip_tpu.data.transforms_extra import CLSAAug, ImageNetPolicy

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8))
    out = ImageNetPolicy(random.Random(0))(img)
    assert out.size == (64, 64)
    out2 = CLSAAug(5, random.Random(1))(img)
    assert out2.size == (64, 64)


def test_moco_builder():
    from declip_tpu.models.ssl_builders import (
        enqueue_keys,
        init_moco_state,
        momentum_update,
    )
    from declip_tpu.train.method_losses import moco_losses

    params = {"w": jnp.ones((4, 4))}
    st = init_moco_state(params, jax.random.PRNGKey(0), queue_size=16, dim=8)
    st2 = momentum_update(st, {"w": jnp.zeros((4, 4))}, m=0.9)
    np.testing.assert_allclose(np.asarray(st2.key_params["w"]),
                               0.9 * np.ones((4, 4)))
    q = jnp.ones((4, 8))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    st3 = enqueue_keys(st2, q)
    assert int(st3.queue_ptr) == 4
    loss, metrics = moco_losses({"q": q}, None, k=q, queue=st3.queue)
    assert np.isfinite(float(loss))
    # positive (identical q==k) must beat the random negatives
    assert float(metrics["top1"]) > 0


def test_clsa_ddm_and_simclr():
    """CLSA DDM grads flow through BOTH the strong and the weak branch
    (clsa_builder.py:157 computes p_weak WITH gradient)."""
    from declip_tpu.train.method_losses import moco_losses, simclr_losses

    rng = np.random.default_rng(0)
    z1 = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    z2 = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    z1 = z1 / jnp.linalg.norm(z1, axis=-1, keepdims=True)
    z2 = z2 / jnp.linalg.norm(z2, axis=-1, keepdims=True)
    loss, _ = simclr_losses({"q": z1, "z2": z2}, None)
    assert np.isfinite(float(loss))

    queue = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    queue = queue / jnp.linalg.norm(queue, axis=-1, keepdims=True)

    def ddm_only(q, q_s):
        total, m = moco_losses(
            {"q": q, "q_strong": (q_s,)}, None, k=z2, queue=queue)
        return m["ddm_loss"]

    gq, gs = jax.grad(ddm_only, argnums=(0, 1))(z1, z2)
    assert float(jnp.abs(gq).sum()) > 0  # weak branch gets gradient
    assert float(jnp.abs(gs).sum()) > 0  # strong branch gets gradient


def test_native_lib_if_available(tmp_path):
    from declip_tpu.data import native

    if not native.available():
        pytest.skip("native fastload not built")
    import io

    from PIL import Image

    arr = np.random.default_rng(0).integers(0, 255, (120, 160, 3), np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "JPEG", quality=95)
    data = b.getvalue()
    assert native.jpeg_dims(data) == (160, 120)
    dec = native.decode_jpeg(data)
    assert dec.shape == (120, 160, 3)
    out = native.decode_crop_resize(data, (10, 10, 100, 100), (56, 56))
    assert out.shape == (56, 56, 3)
    meta = tmp_path / "m.jsonl"
    meta.write_text('{"a":1}\n{"b":2}\n')
    assert native.scan_offsets(str(meta)).tolist() == [0, 8]


def test_solver_cli_aliases_importable():
    import importlib

    for m in ("clip", "slip", "filip", "declip", "defilip"):
        mod = importlib.import_module(f"declip_tpu.solver.{m}_solver")
        assert hasattr(mod, "main")


def test_scalar_writer_tb_sink(tmp_path, monkeypatch):
    """ScalarWriter: JSONL always; tensorboard event files alongside when
    tensorboardX/torch-TB is importable (reference surface,
    clip_solver.py:119-120), with the reference's tag names; DECLIP_TB=0
    disables the TB sink."""
    import glob
    import json as _json

    from declip_tpu.utils.logging import ScalarWriter

    monkeypatch.setenv("DECLIP_TB", "1")  # conftest default-disables it
    d = tmp_path / "events"
    w = ScalarWriter(str(d))
    w.add_scalar("loss", 1.5, 0)
    w.add_scalar("lr", 0.1, 0)
    w.flush()
    w.close()
    rows = [_json.loads(ln) for ln in
            (d / "scalars.jsonl").read_text().splitlines()]
    assert {r["tag"] for r in rows} == {"loss", "lr"}
    has_tb = ScalarWriter._make_tb(str(tmp_path / "probe")) is not None
    events = glob.glob(str(d / "events.out.tfevents.*"))
    if has_tb:
        assert events and os.path.getsize(events[0]) > 0
        # reference tag aliasing: 'loss' lands in TB as 'loss_train'
        blob = b"".join(open(p, "rb").read() for p in events)
        assert b"loss_train" in blob and b"lr" in blob

    monkeypatch.setenv("DECLIP_TB", "0")
    d2 = tmp_path / "events2"
    w2 = ScalarWriter(str(d2))
    w2.add_scalar("loss", 1.0, 1)
    w2.close()
    assert not glob.glob(str(d2 / "events.out.tfevents.*"))
    assert (d2 / "scalars.jsonl").exists()
