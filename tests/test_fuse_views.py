"""fuse_views: single-[2B]-call fusion of DeCLIP/DeFILIP's two text passes
and (ViT towers only) two image views.

The fused and unfused paths must be numerically interchangeable — the towers
involved are LayerNorm-only, so per-row statistics don't couple across the
concatenated batch (unlike the reference's ResNet BatchNorm, declip.py:225-232,
which is why fusion never applies to ResNet towers). Perf note: fusion is
measured SLOWER on v5e for DeCLIP-R50 (README), hence default-off; these
tests pin the equivalence so the knob stays safe to flip either way.
"""

import jax
import jax.numpy as jnp
import numpy as np

from test_models import TINY_IMAGE_R50, batch_for, build, init_apply


def _tree_allclose(a, b, rtol=2e-4, atol=1e-3):
    # atol 1e-3: grads of the abs-sum probe loss reach ~1e4-1e5, so
    # near-zero elements carry ~1e-4 of accumulated reduction-order noise
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64),
                                   rtol=rtol, atol=atol)


def _outputs(model, variables, batch):
    out, _ = jax.jit(
        lambda v, b: model.apply(v, b, train=True, mutable=["batch_stats"])
    )(variables, batch)
    # drop non-array entries for tree comparison
    return {k: v for k, v in out.items()
            if isinstance(v, (jax.Array, tuple))}


def _grads(model, variables, batch):
    def loss(params):
        out, _ = model.apply({**variables, "params": params}, batch,
                             train=True, mutable=["batch_stats"])
        tot = 0.0
        # smooth probe (mean of squares): an abs/sign-based probe is
        # non-differentiable at 0 and amplifies reduction-order noise on
        # near-zero elements into discrete grad jumps
        for leaf in jax.tree.leaves(
                {k: v for k, v in out.items() if k != "mlm_labels"}):
            tot = tot + jnp.mean(jnp.square(leaf.astype(jnp.float32)))
        return tot

    return jax.jit(jax.grad(loss))(variables["params"])


def _fused_pair(model_type, clip_kwargs, image=None, mlm=True):
    kw = dict(image=image) if image is not None else {}
    plain = build(model_type, dict(clip_kwargs), **kw)
    fused = build(model_type, {**clip_kwargs, "fuse_views": True}, **kw)
    batch = batch_for(2, mlm=mlm, aug=True)
    variables = jax.jit(
        lambda: plain.init(jax.random.PRNGKey(0), batch, train=True))()
    # same param tree: fusion changes call pattern, not parameters
    fv = jax.jit(
        lambda: fused.init(jax.random.PRNGKey(0), batch, train=True))()
    assert (jax.tree.structure(fv["params"])
            == jax.tree.structure(variables["params"]))
    return plain, fused, variables, batch


def test_declip_vit_fused_matches_unfused():
    """ViT DeCLIP: text passes AND image views fuse; outputs + grads agree."""
    kwargs = {"use_allgather": True, "text_mask_type": "MLM",
              "return_simsiam_text": True, "return_simsiam_nn_text": True,
              "feature_dim": 64}
    plain, fused, variables, batch = _fused_pair("declip_vitb32", kwargs)
    _tree_allclose(_outputs(plain, variables, batch),
                   _outputs(fused, variables, batch))
    _tree_allclose(_grads(plain, variables, batch),
                   _grads(fused, variables, batch))


def test_declip_vit_fused_no_mlm():
    kwargs = {"use_allgather": True, "feature_dim": 64}
    plain, fused, variables, batch = _fused_pair(
        "declip_vitb32", kwargs, mlm=False)
    _tree_allclose(_outputs(plain, variables, batch),
                   _outputs(fused, variables, batch))


def test_declip_r50_fuses_text_only():
    """ResNet tower: fuse_views fuses ONLY the text passes (BatchNorm forbids
    image-view fusion); outputs still agree because the image path is
    unchanged and the text tower is LN-only."""
    kwargs = {"use_allgather": True, "text_mask_type": "MLM",
              "feature_dim": 64}
    plain, fused, variables, batch = _fused_pair(
        "declip_res50", kwargs, image=TINY_IMAGE_R50)
    _tree_allclose(_outputs(plain, variables, batch),
                   _outputs(fused, variables, batch))


def test_defilip_fused_matches_unfused():
    """DeFILIP: dense (FILIP) heads consume per-view dense tokens — the
    fused split must route words/words_aug and the two image-dense halves
    to the same places as the two-call path."""
    kwargs = {"use_allgather": True, "text_mask_type": "MLM",
              "return_filip": True, "return_nn_bank": True,
              "select_topk": True, "top_k": 1, "dense_aug": True}
    plain, fused, variables, batch = _fused_pair("defilip_vitb32", kwargs)
    _tree_allclose(_outputs(plain, variables, batch),
                   _outputs(fused, variables, batch))
    _tree_allclose(_grads(plain, variables, batch),
                   _grads(fused, variables, batch))


def test_moe_text_tower_never_fuses():
    """MoE routing has batch-coupled capacity/aux-loss semantics: fuse_views
    must leave MoE towers on the two-call path (identical outputs to the
    un-fused MoE model, including the sown aux loss)."""
    moe_text = {"embed_dim": 64, "transformer_width": 32,
                "transformer_heads": 2, "transformer_layers": 2,
                "moe": {"num_experts": 2, "top_k": 1}}
    from declip_tpu.models import model_entry

    def build_moe(fuse):
        node = {"type": "declip_vitb32", "kwargs": {
            "image_encode": {"embed_dim": 64, "input_resolution": 32,
                             "patch_size": 32, "width": 32, "layers": 2,
                             "heads": 2},
            "text_encode": dict(moe_text),
            "clip": {"use_allgather": True, "feature_dim": 64,
                     "fuse_views": fuse}}}
        return model_entry(node)

    batch = batch_for(2, aug=True)
    plain, fused = build_moe(False), build_moe(True)
    variables = jax.jit(
        lambda: plain.init(jax.random.PRNGKey(0), batch, train=True))()

    def moe_out(model):
        out, ups = jax.jit(lambda v, b: model.apply(
            v, b, train=True, mutable=["batch_stats", "moe"]))(
                variables, batch)
        return out["text_embed"], out["text_embed_aug"], ups.get("moe", {})

    te_p, ta_p, moe_p = moe_out(plain)
    te_f, ta_f, moe_f = moe_out(fused)
    np.testing.assert_allclose(np.asarray(te_p), np.asarray(te_f), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ta_p), np.asarray(ta_f), rtol=1e-5)
    # identical aux-loss tree (same two sown values -> fusion did NOT happen)
    _tree_allclose(moe_p, moe_f, rtol=1e-5)
