"""Fused Pallas kernel for FILIP late-interaction logits (SURVEY §5.7).

Contract (same as ops/filip_ops.late_interaction_logits):
``out[b, l] = mean_n max_m <d1[b, n, :], d2[l, m, :]>`` — the reference's
get_weighted_dense_logits max/mean (prototype/model/filip.py:96-105).

Why a kernel: the XLA path materializes the per-chunk similarity tensor
([B*N1, C*N2] fp32) in HBM between the matmul and the max/mean reduce —
for B=128, N1=77, GB=8192, N2=16 that is ~5 GB of round-trip traffic per
direction. Here the similarity tile never leaves VMEM: per (batch-tile,
key-tile) grid cell the kernel runs N2 MXU matmuls ([TB*N1, D] x [D, TL],
one per key token, avoiding any lane-dim reshape), folds them into a
running max, and reduces the query-token mean with one more small matmul
against a constant selection matrix (which also masks the padded query
rows). Backward recomputes the tile (flash-style) and routes gradients
through the max winners — ties split evenly, matching jnp.max autodiff
(the XLA path's semantics; torch routes to the first winner, a
measure-zero difference).

Scale is applied OUTSIDE the kernel by the wrapper so autodiff produces
d(scale) for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only exists on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mean_matrix(tb: int, n1p: int, n1: int):
    """[TB, TB*N1p] constant: row b averages the n1 VALID query rows of
    batch item b (padded rows contribute 0)."""
    rows = tb * n1p
    r = jax.lax.broadcasted_iota(jnp.int32, (tb, rows), 1)
    b = jax.lax.broadcasted_iota(jnp.int32, (tb, rows), 0)
    sel = (r // n1p == b) & (r % n1p < n1)
    return sel.astype(jnp.float32) / float(n1)


def _row_valid(rows: int, tl: int, n1p: int, n1: int):
    """[rows, TL] mask: 1 for real query rows, 0 for padding."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, tl), 0)
    return (r % n1p < n1).astype(jnp.float32)


def _expand_rows(g, tb: int, n1p: int):
    """[TB, TL] -> [TB*N1p, TL] with row b repeated n1p times consecutively.

    Done as a matmul against a constant 0/1 matrix: pltpu.repeat TILES the
    array (np.tile, not np.repeat), and jnp.repeat lane/sublane reshapes
    lower poorly in Mosaic."""
    rows = tb * n1p
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, tb), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (rows, tb), 1)
    e = (r // n1p == b).astype(jnp.float32)
    return jax.lax.dot_general(
        e, g, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _sims(d1, d2_ref, n2):
    """The N2 per-key-token similarity tiles, each [TB*N1p, TL] fp32.

    One MXU matmul per key token keeps the lane dim = TL (>=128) and avoids
    splitting lanes into (TL, N2) — a reshape Mosaic lowers poorly."""
    return [
        jax.lax.dot_general(
            d1, d2_ref[:, m, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for m in range(n2)
    ]


def _fwd_kernel(d1_ref, d2_ref, o_ref, *, n1, n1p, tb, n2):
    d1 = d1_ref[:]
    sms = _sims(d1, d2_ref, n2)
    smax = functools.reduce(jnp.maximum, sms)
    o_ref[:] = jax.lax.dot_general(
        _mean_matrix(tb, n1p, n1), smax, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _winner_weights(sms, smax, g_rows, n1, valid):
    """Per-m gradient weights: upstream/(N1*ties) on max winners."""
    cnt = functools.reduce(
        jnp.add, [(sm == smax).astype(jnp.float32) for sm in sms])
    w = g_rows * valid / (float(n1) * cnt)
    return [w * (sm == smax).astype(jnp.float32) for sm in sms]


def _bwd_d1_kernel(d1_ref, d2_ref, g_ref, o_ref, *, n1, n1p, tb, n2):
    d1 = d1_ref[:]
    sms = _sims(d1, d2_ref, n2)
    smax = functools.reduce(jnp.maximum, sms)
    rows, tl = sms[0].shape
    g_rows = _expand_rows(g_ref[:], tb, n1p)
    dsm = _winner_weights(sms, smax, g_rows, n1,
                          _row_valid(rows, tl, n1p, n1))
    acc = functools.reduce(jnp.add, [
        jax.lax.dot_general(
            dsm[m], d2_ref[:, m, :].astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        for m in range(n2)
    ])

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += acc.astype(o_ref.dtype)


def _bwd_d2_kernel(d1_ref, d2_ref, g_ref, o_ref, *, n1, n1p, tb, n2):
    d1 = d1_ref[:]
    sms = _sims(d1, d2_ref, n2)
    smax = functools.reduce(jnp.maximum, sms)
    rows, tl = sms[0].shape
    g_rows = _expand_rows(g_ref[:], tb, n1p)
    dsm = _winner_weights(sms, smax, g_rows, n1,
                          _row_valid(rows, tl, n1p, n1))

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for m in range(n2):
        # dd2[l, m, :] += dsm[m].T @ d1
        o_ref[:, m, :] += jax.lax.dot_general(
            dsm[m], d1.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _grid_specs(bp, n1p, gbp, n2, dp, tb, tl):
    vmem = pltpu.VMEM if _HAS_PLTPU else None
    d1_spec = pl.BlockSpec((tb * n1p, dp), lambda i, j: (i, 0),
                           memory_space=vmem)
    d2_spec = pl.BlockSpec((tl, n2, dp), lambda i, j: (j, 0, 0),
                           memory_space=vmem)
    g_spec = pl.BlockSpec((tb, tl), lambda i, j: (i, j), memory_space=vmem)
    return d1_spec, d2_spec, g_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _li_raw(d1f, d2p, n1, n1p, tiles, n2, interpret):
    return _li_raw_fwd(d1f, d2p, n1, n1p, tiles, n2, interpret)[0]


def _li_raw_fwd(d1f, d2p, n1, n1p, tiles, n2, interpret):
    # forward folds the N2 similarity tiles into ONE running max (a single
    # tile live in VMEM), so it affords much larger tiles than the backward
    # (which holds all N2 tiles for winner routing) — measured ~1.4x on the
    # fwd pass at (16, 256) vs the bwd-safe (8, 128).
    (tb, tl), _ = tiles
    bn, dp = d1f.shape
    gbp = d2p.shape[0]
    bp = bn // n1p
    d1_spec, d2_spec, _ = _grid_specs(bp, n1p, gbp, n2, dp, tb, tl)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n1=n1, n1p=n1p, tb=tb, n2=n2),
        out_shape=jax.ShapeDtypeStruct((bp, gbp), jnp.float32),
        grid=(bp // tb, gbp // tl),
        in_specs=[d1_spec, d2_spec],
        out_specs=pl.BlockSpec((tb, tl), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM if _HAS_PLTPU
                               else None),
        interpret=interpret,
    )(d1f, d2p)
    return out, (d1f, d2p)


def _li_raw_bwd(n1, n1p, tiles, n2, interpret, res, g):
    d1f, d2p = res
    _, (tb, tl) = tiles
    bn, dp = d1f.shape
    gbp = d2p.shape[0]
    bp = bn // n1p
    g = g.astype(jnp.float32)
    d1_spec, d2_spec, g_spec = _grid_specs(bp, n1p, gbp, n2, dp, tb, tl)
    vmem = pltpu.VMEM if _HAS_PLTPU else None
    # dd1: grid (b-tile, key-tile) — the key-tile loop is minor-most so the
    # output block stays resident in VMEM while accumulating over it
    dd1 = pl.pallas_call(
        functools.partial(_bwd_d1_kernel, n1=n1, n1p=n1p, tb=tb, n2=n2),
        out_shape=jax.ShapeDtypeStruct(d1f.shape, d1f.dtype),
        grid=(bp // tb, gbp // tl),
        in_specs=[d1_spec, d2_spec, g_spec],
        out_specs=pl.BlockSpec((tb * n1p, dp), lambda i, j: (i, 0),
                               memory_space=vmem),
        interpret=interpret,
    )(d1f, d2p, g)
    # dd2: transposed grid — accumulate over batch tiles per key tile
    dd2 = pl.pallas_call(
        functools.partial(_bwd_d2_kernel, n1=n1, n1p=n1p, tb=tb, n2=n2),
        out_shape=jax.ShapeDtypeStruct(d2p.shape, d2p.dtype),
        grid=(gbp // tl, bp // tb),
        in_specs=[
            pl.BlockSpec((tb * n1p, dp), lambda j, i: (i, 0),
                         memory_space=vmem),
            pl.BlockSpec((tl, n2, dp), lambda j, i: (j, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((tb, tl), lambda j, i: (i, j), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((tl, n2, dp), lambda j, i: (j, 0, 0),
                               memory_space=vmem),
        interpret=interpret,
    )(d1f, d2p, g)
    return dd1, dd2


_li_raw.defvjp(_li_raw_fwd, _li_raw_bwd)


def late_interaction_logits_pallas(
    dense_1: jax.Array,
    dense_2_gathered: jax.Array,
    scale: jax.Array,
    *,
    tb: int = 8,
    tl: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused late-interaction logits: dense_1 [B, N1, D] (normalized),
    dense_2_gathered [GB, N2, D] -> [B, GB] fp32. Drop-in for
    ops/filip_ops.late_interaction_logits."""
    b, n1, d = dense_1.shape
    gb, n2, _ = dense_2_gathered.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # sublane granularity: TB*N1p rows must be a multiple of 8 (fp32) /
    # 16 (bf16); even n1p covers both at tb>=8. The forward runs larger
    # tiles than the backward (see _li_raw_fwd); padding covers both.
    tb_fwd, tl_fwd = max(tb, 16), max(tl, 256)
    n1p = _round_up(n1, 2)
    dp = _round_up(d, 128)
    bp = _round_up(b, max(tb, tb_fwd))
    gbp = _round_up(gb, max(tl, tl_fwd))

    d1 = jnp.pad(dense_1, ((0, bp - b), (0, n1p - n1), (0, dp - d)))
    d1f = d1.reshape(bp * n1p, dp)
    d2p = jnp.pad(dense_2_gathered, ((0, gbp - gb), (0, 0), (0, dp - d)))

    raw = _li_raw(d1f, d2p, n1, n1p,
                  ((tb_fwd, tl_fwd), (tb, tl)), n2, interpret)
    return scale.astype(jnp.float32) * raw[:b, :gb]
