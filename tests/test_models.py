import jax
import jax.numpy as jnp
import numpy as np
import pytest

from declip_tpu.config import parse_config
from declip_tpu.models import model_entry

B = 2
RES = 32  # tiny resolution: ViT patch 32 -> 1 patch; ResNet -> 1x1 attnpool

TINY_IMAGE_VIT = {"embed_dim": 64, "input_resolution": RES, "patch_size": 32,
                  "width": 32, "layers": 2, "heads": 2}
TINY_IMAGE_R50 = {"embed_dim": 64, "input_resolution": RES, "width": 16,
                  "layers": [1, 1, 1, 1], "heads": 4}
TINY_TEXT = {"embed_dim": 64, "transformer_width": 32, "transformer_heads": 2,
             "transformer_layers": 2}


def build(model_type, clip_kwargs, image=TINY_IMAGE_VIT):
    cfg = parse_config("x: 1")
    node = {"type": model_type, "kwargs": {
        "image_encode": dict(image), "text_encode": dict(TINY_TEXT),
        "clip": dict(clip_kwargs)}}
    return model_entry(node)


def batch_for(views: int, mlm: bool = False, aug: bool = False):
    rng = np.random.default_rng(0)
    b = {
        "images": jnp.asarray(rng.normal(size=(B, RES, RES, 3 * views)), jnp.float32),
        "tokens": jnp.asarray(rng.integers(1, 100, size=(B, 77)), jnp.int32),
    }
    if aug:
        b["tokens_aug"] = jnp.asarray(rng.integers(1, 100, size=(B, 77)), jnp.int32)
    if mlm:
        b["mlm_tokens"] = b["tokens"]
        b["mlm_labels"] = jnp.full((B, 77), -100, jnp.int64)
    return b


def init_apply(model, batch):
    init = jax.jit(lambda: model.init(jax.random.PRNGKey(0), batch, train=True))
    variables = init()
    apply = jax.jit(
        lambda v, b: model.apply(v, b, train=True, mutable=["batch_stats"])
    )
    out, updates = apply(variables, batch)
    return variables, out, updates


def test_clip_vit():
    model = build("clip_vitb32", {"use_allgather": True})
    _, out, _ = init_apply(model, batch_for(1))
    assert out["image_embed"].shape == (B, 64)
    assert out["text_embed"].shape == (B, 64)
    np.testing.assert_allclose(
        np.linalg.norm(out["image_embed"], axis=-1), 1.0, rtol=1e-4
    )
    # logit_scale starts at 1/0.07
    assert np.isclose(float(out["logit_scale"]), 1 / 0.07, rtol=1e-3)


def test_clip_resnet_batch_stats():
    model = build("clip_res50", {"use_allgather": True}, image=TINY_IMAGE_R50)
    variables, out, updates = init_apply(model, batch_for(1))
    assert out["image_embed"].shape == (B, 64)
    assert "batch_stats" in variables
    # train forward must update running stats
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_slip():
    model = build("slip_vitb32", {"use_allgather": True, "return_sim": True,
                                  "feature_dim": 32, "sim_dim": 16})
    _, out, _ = init_apply(model, batch_for(3))
    assert out["image_sim_1"].shape == (B, 16)
    assert out["image_sim_2"].shape == (B, 16)


def test_declip_mlm():
    model = build(
        "declip_vitb32",
        {"use_allgather": True, "text_mask_type": "MLM", "return_nn_bank": True,
         "feature_dim": 64},
    )
    _, out, _ = init_apply(model, batch_for(2, mlm=True, aug=True))
    assert out["image_embed_1"].shape == (B, 64)
    assert out["image_embed_2"].shape == (B, 64)
    assert out["text_embed_aug"].shape == (B, 64)
    p1, z1, p2, z2 = out["simsiam"]
    assert p1.shape == z1.shape == (B, 1024)
    # vocab-sized logits only on the (<=24) compact masked positions
    assert out["mlm_logits"].shape[:2] == (B, 24)
    assert out["mlm_labels"].shape == (B, 24)


def test_compact_mlm_matches_full():
    """The compact MLM head (vocab logits only on masked positions,
    clip_model.compact_mlm) gives a bit-identical CE to the reference's
    full [B, L, vocab] path whenever masked-count <= the cap."""
    from declip_tpu.losses import mlm_loss

    kwargs = {"use_allgather": True, "text_mask_type": "MLM",
              "feature_dim": 64}
    compact = build("declip_vitb32", kwargs)
    full = build("declip_vitb32", {**kwargs, "mlm_max_positions": 0})
    assert compact.mlm_max_positions == 24

    batch = batch_for(2, mlm=True, aug=True)
    labels = np.full((B, 77), -100, np.int64)
    labels[0, [1, 5, 9, 30]] = [7, 8, 9, 10]  # 4 masked, scattered
    labels[1, [0, 76]] = [3, 4]
    batch["mlm_labels"] = jnp.asarray(labels)

    variables = jax.jit(
        lambda: full.init(jax.random.PRNGKey(0), batch, train=True))()
    out_f, _ = full.apply(variables, batch, train=True,
                          mutable=["batch_stats"])
    out_c, _ = compact.apply(variables, batch, train=True,
                             mutable=["batch_stats"])
    assert out_f["mlm_logits"].shape[1] == 77
    assert out_c["mlm_logits"].shape[1] == 24
    lf = float(mlm_loss(out_f["mlm_logits"], out_f["mlm_labels"]))
    lc = float(mlm_loss(out_c["mlm_logits"], out_c["mlm_labels"]))
    np.testing.assert_allclose(lc, lf, rtol=1e-5)

    # gradients through the text tower agree too
    def loss_of(model):
        def f(params):
            out, _ = model.apply(
                {**variables, "params": params}, batch, train=True,
                mutable=["batch_stats"])
            return mlm_loss(out["mlm_logits"], out["mlm_labels"])
        return jax.grad(f)(variables["params"])

    gf, gc = loss_of(full), loss_of(compact)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_filip_dense():
    model = build(
        "filip_vitb32",
        {"use_allgather": True, "return_dense": True, "select_topk": True,
         "top_k": 1, "text_mask_type": "MLM"},
    )
    _, out, _ = init_apply(model, batch_for(2, mlm=True))
    # full-token dense features (query side) + top-k selections (key side)
    assert out["dense_image"].shape == (B, 1, 256)  # RES=32/patch32 -> 1 tok
    assert out["dense_text"].shape == (B, 77, 256)
    assert out["dense_image_sel"].shape == (B, 1, 256)
    assert out["dense_text_sel"].shape == (B, 1, 256)  # top_k=1
    assert out["logit_scale_dense"].shape == ()


def test_defilip():
    model = build(
        "defilip_vitb32",
        {"use_allgather": True, "text_mask_type": "MLM", "return_filip": True,
         "return_nn_bank": True, "select_topk": True, "top_k": 1,
         "dense_aug": True},
    )
    _, out, _ = init_apply(model, batch_for(2, mlm=True, aug=True))
    assert "dense_image_1" in out and "dense_text_aug" in out
    assert out["simsiam"][0].shape == (B, 1024)


def test_text_eot_pooling_ignores_mask_token():
    """First-eot pooling must be insensitive to tokens after eot and to
    high-id mask tokens (reference argmax pooling breaks there)."""
    from declip_tpu.models.text import TextTransformer
    from declip_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer()
    m = TextTransformer(vocab_size=tok.vocab_size, embed_dim=16,
                        transformer_width=32, transformer_heads=2,
                        transformer_layers=1, eot_id=tok.eot_id)
    ids = np.zeros((1, 77), np.int32)
    ids[0, 0] = tok.sot_id
    ids[0, 1] = 5
    ids[0, 2] = tok.mask_id  # mask id > eot id
    ids[0, 3] = tok.eot_id
    v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), jnp.asarray(ids)))()
    out = jax.jit(lambda v, x: m.apply(v, x))(v, jnp.asarray(ids))
    assert out.shape == (1, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_return_flags():
    from declip_tpu.models.vit import VisualTransformer

    m = VisualTransformer(input_resolution=64, patch_size=32, width=32,
                          layers=1, heads=2, embed_dim=16)
    x = jnp.zeros((2, 64, 64, 3))
    v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()
    out, dense, feat = jax.jit(
        lambda v, x: m.apply(v, x, return_dense=True, return_feature=True)
    )(v, x)
    assert out.shape == (2, 16)
    assert dense.shape == (2, 4, 32)
    assert feat.shape == (2, 32)


def test_modified_resnet_fc_embed_variant():
    """modified_resnet_modified.py:119-218: fc_embed routes attnpool to the
    raw width*32 feature + separate fc; return_feature exposes the pre-fc
    vector."""
    from declip_tpu.models.resnet import ModifiedResNet

    m = ModifiedResNet(layers=(1, 1, 1, 1), embed_dim=16, heads=4,
                       input_resolution=64, width=8, fc_embed=True)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    pooled, dense, feature = m.apply(
        variables, x, train=False, return_dense=True, return_feature=True)
    assert pooled.shape == (2, 16)
    assert feature.shape == (2, 8 * 32)  # raw attnpool output, pre-fc
    assert dense.shape == (2, 4, 8 * 32)
    # default mode: attnpool projects straight to embed_dim, no fc
    m2 = ModifiedResNet(layers=(1, 1, 1, 1), embed_dim=16, heads=4,
                        input_resolution=64, width=8)
    v2 = m2.init(jax.random.PRNGKey(0), x, train=False)
    assert "fc" not in v2["params"]
    out2, feat2 = m2.apply(v2, x, train=False, return_feature=True)
    assert out2.shape == feat2.shape == (2, 16)


def test_remat_policy_variants_match():
    """remat_policy is a memory/recompute knob only — outputs and gradients
    must be identical across policy/dots/all (models/layers.py)."""
    import jax
    import jax.numpy as jnp

    from declip_tpu.models import model_entry

    def build(policy):
        return model_entry({
            "type": "clip_vitb32",
            "kwargs": {
                "image_encode": {"embed_dim": 32, "input_resolution": 32,
                                 "patch_size": 32, "width": 32, "layers": 2,
                                 "heads": 2, "remat_policy": policy},
                "text_encode": {"embed_dim": 32, "transformer_width": 32,
                                "transformer_heads": 2,
                                "transformer_layers": 2,
                                "remat_policy": policy},
                "clip": {"use_allgather": True},
            },
        })

    rng_np = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng_np.normal(size=(4, 32, 32, 3)), jnp.float32),
        "tokens": jnp.asarray(rng_np.integers(1, 100, (4, 77)), jnp.int32),
    }
    ref_model = build("policy")
    variables = jax.jit(
        lambda: ref_model.init(jax.random.PRNGKey(0), batch, train=True))()

    def loss(model, params):
        out = model.apply({"params": params}, batch, train=True)
        return (out["image_embed"].sum() + out["text_embed"].sum())

    ref_val, ref_grad = jax.value_and_grad(
        lambda p: loss(ref_model, p))(variables["params"])
    for policy in ("dots", "all"):
        m = build(policy)
        val, grad = jax.value_and_grad(
            lambda p: loss(m, p))(variables["params"])
        np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(ref_grad), jax.tree.leaves(grad)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_scan_unroll_variants_match():
    """scan_unroll is a scheduling knob only — outputs and gradients must be
    identical across rolled (1), partial (2), full (0), and auto (-1)
    (models/layers.py Transformer._resolve_unroll)."""
    import jax
    import jax.numpy as jnp

    from declip_tpu.models import model_entry

    def build(unroll):
        return model_entry({
            "type": "clip_vitb32",
            "kwargs": {
                "image_encode": {"embed_dim": 32, "input_resolution": 32,
                                 "patch_size": 32, "width": 32, "layers": 3,
                                 "heads": 2, "scan_unroll": unroll},
                "text_encode": {"embed_dim": 32, "transformer_width": 32,
                                "transformer_heads": 2,
                                "transformer_layers": 3,
                                "scan_unroll": unroll},
                "clip": {"use_allgather": True},
            },
        })

    rng_np = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng_np.normal(size=(4, 32, 32, 3)), jnp.float32),
        "tokens": jnp.asarray(rng_np.integers(1, 100, (4, 77)), jnp.int32),
    }
    ref_model = build(1)
    variables = jax.jit(
        lambda: ref_model.init(jax.random.PRNGKey(0), batch, train=True))()

    def loss(model, params):
        out = model.apply({"params": params}, batch, train=True)
        return (out["image_embed"].sum() + out["text_embed"].sum())

    ref_val, ref_grad = jax.value_and_grad(
        lambda p: loss(ref_model, p))(variables["params"])
    for unroll in (2, 0, -1):
        m = build(unroll)
        val, grad = jax.value_and_grad(
            lambda p: loss(m, p))(variables["params"])
        np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(ref_grad), jax.tree.leaves(grad)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_bank_query_matches_naive():
    """query_topk's fused form (no normalized-bank materialization; argmax
    at k=1) equals the reference's normalize-both-then-top_k math
    (nn_memory_bank.py:56-65) — raw rows returned, indices invariant to the
    query scale and to the bank-copy normalization."""
    from declip_tpu.models.memory_bank import BankState, query_topk

    rng = np.random.default_rng(3)
    # RAW (unnormalized) rows, as enqueued mid-training; mixed magnitudes
    bank = jnp.asarray(rng.normal(size=(96, 16)) * rng.uniform(
        0.1, 8.0, size=(96, 1)), jnp.float32)
    state = BankState(bank, jnp.zeros((), jnp.int32))
    x = jnp.asarray(rng.normal(size=(7, 16)) * 5.0, jnp.float32)

    def naive(x, bank, k):
        xn = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        bn = bank / jnp.linalg.norm(bank, axis=-1, keepdims=True)
        sim = xn @ bn.T
        _, idx = jax.lax.top_k(sim, k)
        return tuple(bank[idx[:, i]] for i in range(k))

    for k in (1, 3):
        got = query_topk(state, x, k)
        want = naive(x, bank, k)
        assert len(got) == k
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-6)


def test_vitl14_factories():
    """ViT-L/14 factories (beyond-reference scale): all five methods build
    with the OpenAI L/14 pairing — 1024-wide/24-layer/16-head image tower,
    768-wide/12-head text tower, 768-dim joint space."""
    from declip_tpu.models import model_entry

    for t in ("clip_vitl14", "declip_vitl14", "slip_vitl14",
              "filip_vitl14", "defilip_vitl14"):
        m = model_entry({"type": t, "kwargs": {}})
        assert m.visual.width == 1024 and m.visual.layers == 24
        assert m.visual.heads == 16 and m.visual.patch_size == 14
        assert m.visual.embed_dim == 768
        assert m.text.transformer_width == 768
        assert m.text.transformer_heads == 12
        assert m.text.embed_dim == 768
    # @336 high-res variant: 577 image tokens on the same towers
    m = model_entry({"type": "clip_vitl14_336", "kwargs": {}})
    assert m.visual.input_resolution == 336 and m.visual.patch_size == 14
    assert m.visual.width == 1024 and m.text.transformer_width == 768
    # explicit kwargs still override the L14 defaults
    m = model_entry({"type": "clip_vitl14", "kwargs": {
        "image_encode": {"embed_dim": 512},
        "text_encode": {"embed_dim": 512, "transformer_width": 256},
    }})
    assert m.visual.embed_dim == 512
    assert m.text.transformer_width == 256
