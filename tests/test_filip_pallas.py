"""Fused Pallas late-interaction kernel vs the chunked XLA path.

Forward and gradients (d1, d2, scale) must agree on awkward shapes —
odd query-token counts (77 text / 50 image rows), non-tile GB, bf16 —
including the padded-row routing in the backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from declip_tpu.ops.filip_ops import late_interaction_logits
from declip_tpu.ops.filip_pallas import late_interaction_logits_pallas


def _data(rng, b, n1, gb, n2, d, dtype=jnp.float32):
    def unit(shape):
        x = rng.normal(size=shape).astype(np.float32)
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    return (jnp.asarray(unit((b, n1, d)), dtype),
            jnp.asarray(unit((gb, n2, d)), dtype),
            jnp.asarray(2.5, jnp.float32))


@pytest.mark.parametrize("b,n1,gb,n2,d", [
    (8, 77, 128, 16, 256),    # text query x selected image keys
    (8, 50, 130, 16, 256),    # image query, GB not a tile multiple
    (6, 5, 40, 3, 64),        # tiny odd everything
])
def test_pallas_li_forward_matches_xla(rng, b, n1, gb, n2, d):
    d1, d2, scale = _data(rng, b, n1, gb, n2, d)
    ref = late_interaction_logits(d1, d2, scale)
    out = late_interaction_logits_pallas(d1, d2, scale, interpret=True)
    assert out.shape == (b, gb) and out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_li_grads_match_xla(rng):
    b, n1, gb, n2, d = 8, 9, 40, 4, 64
    d1, d2, scale = _data(rng, b, n1, gb, n2, d)
    w = jnp.asarray(rng.normal(size=(b, gb)).astype(np.float32))

    def loss(fn):
        def f(d1_, d2_, s_):
            return (fn(d1_, d2_, s_) * w).sum()
        return jax.grad(f, argnums=(0, 1, 2))

    g_ref = loss(late_interaction_logits)(d1, d2, scale)
    g_pal = loss(lambda a, b_, s: late_interaction_logits_pallas(
        a, b_, s, interpret=True))(d1, d2, scale)
    for a, r in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-5)


def test_dispatch_selection(rng, monkeypatch):
    """Config > env > backend-default selection; wide key sets fall back."""
    from declip_tpu.ops import filip_ops

    monkeypatch.delenv("DECLIP_FILIP_LI_IMPL", raising=False)
    assert filip_ops.dispatch_late_interaction(
        {"filip_dense": {"impl": "xla"}}) is filip_ops.late_interaction_logits
    # CPU backend default: xla
    assert filip_ops.dispatch_late_interaction(
        {}) is filip_ops.late_interaction_logits
    monkeypatch.setenv("DECLIP_FILIP_LI_IMPL", "pallas")
    fn = filip_ops.dispatch_late_interaction({})
    assert fn is not filip_ops.late_interaction_logits
    # wide (un-selected) key sets route back to XLA inside the wrapper,
    # and the numbers agree either way
    d1, d2, scale = _data(rng, 4, 5, 8, 40, 32)
    np.testing.assert_allclose(
        np.asarray(fn(d1, d2, scale)),
        np.asarray(filip_ops.late_interaction_logits(d1, d2, scale)),
        rtol=1e-5, atol=1e-5)


def test_pallas_li_bf16_close(rng):
    b, n1, gb, n2, d = 8, 25, 128, 16, 128
    d1, d2, scale = _data(rng, b, n1, gb, n2, d, dtype=jnp.bfloat16)
    ref = late_interaction_logits(
        d1.astype(jnp.float32), d2.astype(jnp.float32), scale)
    out = late_interaction_logits_pallas(d1, d2, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
