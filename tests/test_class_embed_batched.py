"""Batched zero-shot class-embedding encode == the reference's serial
per-class math (clip_solver.py:688-700, filip_solver.py:845-860).

The solver packs classes into fixed-shape chunks (one compile, far fewer
dispatches) — this must be a pure scheduling change: per-class embeddings
bit-match the naive one-class-at-a-time loop, including the padded tail
chunk when n_class % classes_per_call != 0.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from declip_tpu.models.clip_model import l2_normalize
from declip_tpu.solver import batched_class_embeddings, make_class_embed_fn


def _fake_apply(params, ids):
    # [rows, L] int tokens -> [rows, D] "embeddings": a fixed random
    # projection of one-hot token counts — deterministic, nonlinear enough
    # to catch reduction/reshape mistakes.
    table = params["table"]  # [V, D]
    counts = jnp.take(table, ids, axis=0)  # [rows, L, D]
    return jnp.tanh(counts.sum(axis=1))


def _fake_apply_dense(params, ids):
    table = params["table"]
    return jnp.tanh(jnp.take(table, ids, axis=0))  # [rows, L, D]


@pytest.mark.parametrize("dense", [False, True])
@pytest.mark.parametrize("n_class,prompts,cpc", [(7, 3, 2), (5, 1, 5),
                                                 (4, 4, 3)])
def test_batched_matches_serial(rng, dense, n_class, prompts, cpc):
    V, L, D = 31, 11, 16
    params = {"table": jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))}
    ids = rng.integers(0, V, size=(n_class * prompts, L)).astype(np.int32)
    apply_fn = _fake_apply_dense if dense else _fake_apply

    embed = make_class_embed_fn(apply_fn, prompts, cpc)
    got = np.asarray(
        batched_class_embeddings(embed, params, ids, n_class, prompts, cpc))

    # naive serial reference math, one class per forward
    want = []
    for c in range(n_class):
        emb = apply_fn(params, jnp.asarray(ids[c * prompts:(c + 1) * prompts]))
        emb = l2_normalize(emb)
        want.append(np.asarray(l2_normalize(emb.mean(axis=0))))
    want = np.stack(want)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
