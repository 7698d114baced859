"""Global-batch contrastive logits + InfoNCE.

TPU-native replacement for the reference's manual AllGather autograd op +
rank-offset-label InfoNCE (prototype/model/clip.py:25-49,136-144,
prototype/loss_functions/loss.py:24-47).

Two execution modes share one math definition:

1. **SPMD mode (default)** — the train step is one ``jax.jit`` over a Mesh
   with the batch sharded along the 'data' axis. Features are *logically
   global* arrays; ``logits = scale * img @ txt.T`` is a sharded matmul for
   which XLA inserts the all-gather over ICI itself, and labels are simply
   ``arange(global_batch)``. This is exactly the reference computation with
   the collective moved into the compiler.

2. **shard_map mode** — when called under ``shard_map`` with ``axis_name``
   set, features are per-shard ``[B_local, D]``; we ``lax.all_gather`` one
   side (tiled) and offset labels by ``axis_index * B_local``, mirroring
   loss.py:42's ``rank*bs + arange``. The backward of ``all_gather`` is a
   ``psum_scatter``, the same gradient the reference implements by hand
   (clip.py:42-49). This mode is the building block for the Pallas ring
   kernel (blockwise logits that never materialize [B, W*B]).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _ring_axes(axis_name) -> tuple:
    """Normalize a mesh-axis spec (str or tuple of str) to a tuple."""
    return (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)


def gather_features(feat: jax.Array, axis_name) -> jax.Array:
    """Differentiable all-gather along one or more mesh axes (identity
    without one)."""
    if axis_name is None:
        return feat
    return lax.all_gather(feat, axis_name, tiled=True)


def similarity_logits(
    feat_a: jax.Array,
    feat_b_gathered: jax.Array,
    scale: jax.Array,
) -> jax.Array:
    """[B_local, D] x [B_global, D] -> [B_local, B_global] in fp32."""
    sim = jnp.einsum(
        "nd,md->nm", feat_a, feat_b_gathered, preferred_element_type=jnp.float32
    )
    return scale.astype(jnp.float32) * sim


def infonce_labels(
    batch_size: int, axis_name=None
) -> jax.Array:
    """Positive indices: ``axis_index * B + arange(B)`` (loss.py:37-42).

    axis_name may be a tuple of mesh axes (multi-slice: ('dcn', 'data'));
    the global rank is then row-major over the axes, matching the
    concatenation order of ``lax.all_gather`` over the same tuple."""
    base = jnp.arange(batch_size, dtype=jnp.int32)
    if axis_name is None:
        return base
    axes = _ring_axes(axis_name)
    idx = jnp.zeros((), jnp.int32)
    for ax in axes:
        idx = idx * lax.axis_size(ax) + lax.axis_index(ax)
    return idx * batch_size + base


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over rows; logits fp32 [N, C], labels int [N]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return nll.mean()


def clip_infonce(
    logits_per_image: jax.Array,
    logits_per_text: jax.Array,
    labels: jax.Array,
) -> jax.Array:
    """Symmetric InfoNCE (ClipInfoCELoss, loss.py:37-47)."""
    li = cross_entropy(logits_per_image, labels)
    lt = cross_entropy(logits_per_text, labels)
    return (li + lt) / 2


def clip_pair_loss(
    image_embed: jax.Array,
    text_embed: jax.Array,
    scale: jax.Array,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full gathered CLIP loss for one (image, text) feature pair.

    Returns (loss, logits_per_image, labels) — logits/labels feed accuracy
    meters like the reference solvers do (clip_solver.py:421-430).
    """
    g_img = gather_features(image_embed, axis_name)
    g_txt = gather_features(text_embed, axis_name)
    logits_i = similarity_logits(image_embed, g_txt, scale)
    logits_t = similarity_logits(text_embed, g_img, scale)
    labels = infonce_labels(image_embed.shape[0], axis_name)
    return clip_infonce(logits_i, logits_t, labels), logits_i, labels


def chunked_cross_entropy(
    feat_a: jax.Array,
    feat_b_gathered: jax.Array,
    scale: jax.Array,
    labels: jax.Array,
    chunk_size: int = 1024,
) -> jax.Array:
    """Row-wise CE over ``scale * feat_a @ feat_b_gathered.T`` WITHOUT
    materializing the [B, GB] logits matrix.

    The pod-wide InfoNCE similarity matrix is the memory-critical tensor at
    scale (SURVEY.md §5.7: [GB, GB] fp32 at GB=32k is 4.3GB/chip). This
    computes the per-row logsumexp blockwise over column chunks with a
    rematerialized scan body, so peak memory is one [B, chunk] block and the
    backward pass recomputes each block instead of saving it — the
    XLA-native equivalent of a ring/blockwise kernel (gradients flow through
    both operands).
    """
    b, d = feat_a.shape
    gb = feat_b_gathered.shape[0]
    c = min(chunk_size, gb)
    # pad to a chunk multiple instead of shrinking c (a prime gb would
    # otherwise degrade to c=1, i.e. a gb-step serial scan); padded rows are
    # masked out of the logsumexp below
    nchunks = -(-gb // c)
    pad = nchunks * c - gb
    padded = jnp.pad(feat_b_gathered, ((0, pad), (0, 0)))
    chunks = padded.reshape(nchunks, c, d)
    scale32 = scale.astype(jnp.float32)

    @jax.checkpoint
    def body(carry, inp):
        m, s = carry  # running max [B], running sum of exp [B]
        idx, blk = inp
        logits = scale32 * jnp.einsum(
            "nd,md->nm", feat_a, blk, preferred_element_type=jnp.float32
        )
        col = idx * c + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < gb, logits, -jnp.inf)
        bmax = jnp.maximum(logits.max(axis=-1), -1e30)  # all-pad chunk safe
        new_m = jnp.maximum(m, bmax)
        s = s * jnp.exp(m - new_m) + jnp.exp(
            logits - new_m[:, None]
        ).sum(axis=-1)
        return (new_m, s), None

    init = (jnp.full((b,), -jnp.inf, jnp.float32), jnp.zeros((b,), jnp.float32))
    (m, s), _ = lax.scan(body, init, (jnp.arange(nchunks), chunks))
    lse = m + jnp.log(s)

    # positive logit: one [B] gather + dot, no matrix
    pos_feat = feat_b_gathered[labels]
    pos = scale32 * jnp.einsum(
        "nd,nd->n", feat_a, pos_feat, preferred_element_type=jnp.float32
    )
    return (lse - pos).mean()


def chunked_clip_pair_loss(
    image_embed: jax.Array,
    text_embed: jax.Array,
    scale: jax.Array,
    axis_name: Optional[str] = None,
    chunk_size: int = 1024,
) -> jax.Array:
    """Memory-bounded symmetric InfoNCE (drop-in for clip_pair_loss when the
    global batch is large)."""
    g_img = gather_features(image_embed, axis_name)
    g_txt = gather_features(text_embed, axis_name)
    labels = infonce_labels(image_embed.shape[0], axis_name)
    li = chunked_cross_entropy(image_embed, g_txt, scale, labels, chunk_size)
    lt = chunked_cross_entropy(text_embed, g_img, scale, labels, chunk_size)
    return (li + lt) / 2


def _varying(x, axes: tuple):
    """Mark constants as device-varying over the given mesh axes so scan
    carries typecheck under shard_map's manual-axes tracking."""
    if hasattr(lax, "pcast"):
        return lax.pcast(x, axes, to="varying")
    try:
        return lax.pvary(x, axes)
    except AttributeError:  # older jax
        return x


def _nested_ring(blk: jax.Array, carry, tile_fn, axes: tuple):
    """Hierarchical ring schedule over one or more mesh axes.

    ``tile_fn(carry, blk, is_first) -> carry`` folds one local
    [B_local, B_local] tile; ``is_first`` marks the tile whose key block
    originated on this shard (the positives' diagonal). The LAST axis
    rotates fastest: a full inner cycle of ``ppermute`` hops (the fast
    links — intra-slice ICI) runs between consecutive single shifts of
    each outer axis (the slow links — inter-slice DCN under
    ``parallelism: {slices: N}``), so a W_dcn x W_data ring sends each
    block across DCN only W_dcn times total instead of making the
    slice-boundary devices cross DCN on every one of the W_dcn*W_data
    tile steps (the flat-ring schedule's bottleneck). Gradients flow
    through ppermute (its transpose is the reverse permutation)."""

    def run(carry, blk, axes, is_first):
        ax = axes[0]
        w = lax.axis_size(ax)
        perm = [(i, (i + 1) % w) for i in range(w)]

        def body(c, step):
            carry, blk = c
            first = jnp.logical_and(is_first, step == 0)
            if len(axes) == 1:
                carry = tile_fn(carry, blk, first)
            else:
                carry, blk = run(carry, blk, axes[1:], first)
            blk = lax.ppermute(blk, ax, perm)
            return (carry, blk), None

        (carry, blk), _ = lax.scan(body, (carry, blk), jnp.arange(w))
        return carry, blk

    carry, _ = run(carry, blk, axes, jnp.bool_(True))
    return carry


def ring_cross_entropy(
    feat_a: jax.Array,
    feat_b_local: jax.Array,
    scale: jax.Array,
    axis_name,
) -> jax.Array:
    """Gather-free ring InfoNCE CE under shard_map.

    Instead of all-gathering the B-side features ([GB, D] per chip), the
    local [B_local, D] block circulates around the ring via ``ppermute``
    (SURVEY.md §5.7's prescription): each of the W steps computes one
    [B_local, B_local] logits tile and folds it into a running logsumexp.
    Peak memory is one tile; comms ride ICI neighbor links and overlap with
    the tile matmul.

    ``axis_name`` may be a tuple of mesh axes (multi-slice:
    ('dcn', 'data')) — the ring then runs hierarchically via
    ``_nested_ring``, inner cycles on ICI and one DCN shift per cycle.

    Positive logits: row i's positive is column i of the tile that
    originated on this shard (labels = own global rows).
    """
    axes = _ring_axes(axis_name)
    b = feat_a.shape[0]
    scale32 = scale.astype(jnp.float32)

    def tile(carry, blk, first):
        m, s, pos = carry
        logits = scale32 * jnp.einsum(
            "nd,md->nm", feat_a, blk, preferred_element_type=jnp.float32
        )
        bmax = logits.max(axis=-1)
        new_m = jnp.maximum(m, bmax)
        s = s * jnp.exp(m - new_m) + jnp.exp(
            logits - new_m[:, None]
        ).sum(axis=-1)
        pos = jnp.where(first, jnp.diagonal(logits), pos)
        return (new_m, s, pos)

    init = (
        _varying(jnp.full((b,), -jnp.inf, jnp.float32), axes),
        _varying(jnp.zeros((b,), jnp.float32), axes),
        _varying(jnp.zeros((b,), jnp.float32), axes),
    )
    m, s, pos = _nested_ring(feat_b_local, init, tile, axes)
    lse = m + jnp.log(s)
    return (lse - pos).mean()


def ring_clip_pair_loss(
    image_embed: jax.Array,
    text_embed: jax.Array,
    scale: jax.Array,
    axis_name: str,
) -> jax.Array:
    """Symmetric ring InfoNCE — the fully gather-free CLIP loss."""
    li = ring_cross_entropy(image_embed, text_embed, scale, axis_name)
    lt = ring_cross_entropy(text_embed, image_embed, scale, axis_name)
    return (li + lt) / 2


def _split_scale(scale) -> Tuple[jax.Array, jax.Array]:
    """The pair-loss protocol passes ``scale`` either bare or as a
    ``(scale, logit_bias)`` tuple (models emit ``logit_bias`` when built with
    ``clip: {logit_bias_init: ...}`` — see method_losses._pair_scale).
    Returns (scale, bias) with bias defaulting to 0."""
    if isinstance(scale, tuple):
        s, b = scale
        return s, jnp.asarray(b, jnp.float32)
    return scale, jnp.zeros((), jnp.float32)


def sigmoid_pair_logits(
    feat_a: jax.Array,
    feat_b_gathered: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
) -> jax.Array:
    return similarity_logits(feat_a, feat_b_gathered, scale) + bias


def sigmoid_pair_loss(
    image_embed: jax.Array,
    text_embed: jax.Array,
    scale: jax.Array,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """SigLIP pairwise sigmoid loss (Zhai et al. 2023) — beyond-reference.

    ``L = -1/B * sum_ij log sigmoid(z_ij * (scale * x_i . y_j + bias))`` with
    ``z_ij = +1`` for matched pairs, ``-1`` otherwise. Unlike InfoNCE there is
    no softmax normalization over the global batch, so the loss decomposes
    EXACTLY over column blocks — the chunked and ring variants below are the
    same objective term-for-term, not a logsumexp reformulation. This is the
    TPU-native pod-scale contrastive loss: the ring schedule in the SigLIP
    paper is literally ``ring_sigmoid_pair_loss``. One [B, GB] matrix covers
    every (image, text) pair once; no symmetric transpose term exists.
    """
    s, bias = _split_scale(scale)
    g_txt = gather_features(text_embed, axis_name)
    logits = sigmoid_pair_logits(image_embed, g_txt, s, bias)
    labels = infonce_labels(image_embed.shape[0], axis_name)
    gb = logits.shape[1]
    z = 2.0 * jax.nn.one_hot(labels, gb, dtype=jnp.float32) - 1.0
    loss = -jax.nn.log_sigmoid(z * logits).sum(axis=-1).mean()
    return loss, logits, labels


def chunked_sigmoid_pair_loss(
    image_embed: jax.Array,
    text_embed: jax.Array,
    scale: jax.Array,
    axis_name: Optional[str] = None,
    chunk_size: int = 1024,
) -> jax.Array:
    """Blockwise SigLIP loss: scans column chunks of the gathered text side,
    never materializing [B, GB]. Exact (the sigmoid loss is a plain sum over
    pairs); the scan body is rematerialized like chunked_cross_entropy."""
    s, bias = _split_scale(scale)
    feat_a = image_embed
    feat_b_gathered = gather_features(text_embed, axis_name)
    labels = infonce_labels(feat_a.shape[0], axis_name)
    b, d = feat_a.shape
    gb = feat_b_gathered.shape[0]
    c = min(chunk_size, gb)
    nchunks = -(-gb // c)
    pad = nchunks * c - gb
    padded = jnp.pad(feat_b_gathered, ((0, pad), (0, 0)))
    chunks = padded.reshape(nchunks, c, d)
    s32 = s.astype(jnp.float32)

    @jax.checkpoint
    def body(acc, inp):
        idx, blk = inp
        logits = s32 * jnp.einsum(
            "nd,md->nm", feat_a, blk, preferred_element_type=jnp.float32
        ) + bias
        col = idx * c + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        z = jnp.where(col == labels[:, None], 1.0, -1.0)
        term = -jax.nn.log_sigmoid(z * logits)
        term = jnp.where(col < gb, term, 0.0)  # mask pad columns
        return acc + term.sum(axis=-1), None

    acc, _ = lax.scan(
        body, jnp.zeros((b,), jnp.float32), (jnp.arange(nchunks), chunks))
    return acc.mean()


def ring_sigmoid_pair_loss(
    image_embed: jax.Array,
    text_embed: jax.Array,
    scale: jax.Array,
    axis_name,
) -> jax.Array:
    """Gather-free ring SigLIP loss under shard_map — the SigLIP paper's
    'chunked' device schedule: the local text block circulates via
    ``ppermute``; each of the W steps adds one [B_local, B_local] tile's
    pairwise terms. Because the sigmoid loss has no normalizer there is no
    running-max/logsumexp carry — each tile's contribution is final.
    ``axis_name`` may be a tuple of axes (multi-slice hierarchical ring,
    see ``_nested_ring``)."""
    s, bias = _split_scale(scale)
    axes = _ring_axes(axis_name)
    b = image_embed.shape[0]
    s32 = s.astype(jnp.float32)
    eye = jnp.eye(b, dtype=jnp.float32)

    def tile(acc, blk, first):
        logits = s32 * jnp.einsum(
            "nd,md->nm", image_embed, blk,
            preferred_element_type=jnp.float32) + bias
        # the first block is our own: positives sit on its diagonal
        z = jnp.where(first, 2.0 * eye - 1.0, -jnp.ones_like(logits))
        return acc + (-jax.nn.log_sigmoid(z * logits)).sum(axis=-1)

    init = _varying(jnp.zeros((b,), jnp.float32), axes)
    acc = _nested_ring(text_embed, init, tile, axes)
    return acc.mean()


def loss_impl_kind(cfg) -> str:
    """Read the configured contrastive-loss implementation: ``loss_impl:
    {type: full|chunked|ring, ...}`` (or a bare string). Default 'full'."""
    node = (cfg or {}).get("loss_impl") or {}
    if isinstance(node, str):
        node = {"type": node}
    return str(node.get("type", "full"))


def make_pair_loss(cfg, *, mesh=None, axis_name: Optional[str] = None):
    """Config-selected symmetric InfoNCE: ``pair_loss(img, txt, scale) ->
    (loss, logits_for_acc, labels_for_acc)``.

    - ``full`` — gathered [B, GB] logits (clip.py:136-144 semantics).
    - ``chunked`` — blockwise logsumexp, never materializes [B, GB]
      (SURVEY.md §5.7). Accuracy metrics come from a diagonal proxy block of
      ``acc_window`` rows (the meter, not the objective).
    - ``ring`` — ppermute ring under shard_map, gather-free. Needs either
      ``axis_name`` (already inside shard_map) or ``mesh`` (wrapped in a
      shard_map over the 'data' axis from inside the jitted step).
    - ``sigmoid`` / ``sigmoid_chunked`` / ``sigmoid_ring`` — the SigLIP
      pairwise sigmoid loss (beyond-reference): no global softmax coupling,
      so chunked/ring are the exact objective, not a reformulation. Models
      built with ``clip: {logit_bias_init: -10}`` contribute their learnable
      bias through the ``(scale, bias)`` tuple the method losses pack.

    All variants are grad-parity tested against each other
    (tests/test_loss_impl.py, test_ring_contrastive.py,
    test_chunked_contrastive.py, test_sigmoid_loss.py)."""
    node = (cfg or {}).get("loss_impl") or {}
    if isinstance(node, str):
        node = {"type": node}
    kind = str(node.get("type", "full"))
    chunk = int(node.get("chunk_size", 1024))
    acc_k = int(node.get("acc_window", 1024))

    def acc_proxy(img, txt, scale):
        s, _ = _split_scale(scale)
        k = min(img.shape[0], acc_k)
        logits = similarity_logits(img[:k], txt[:k], s)
        return logits, jnp.arange(k, dtype=jnp.int32)

    if kind == "full":
        def pair(img, txt, scale):
            s, _ = _split_scale(scale)
            return clip_pair_loss(img, txt, s, axis_name)

        return pair
    if kind == "chunked":
        def pair(img, txt, scale):
            s, _ = _split_scale(scale)
            loss = chunked_clip_pair_loss(img, txt, s, axis_name, chunk)
            return (loss, *acc_proxy(img, txt, scale))

        return pair
    if kind == "sigmoid":
        def pair(img, txt, scale):
            return sigmoid_pair_loss(img, txt, scale, axis_name)

        return pair
    if kind == "sigmoid_chunked":
        def pair(img, txt, scale):
            loss = chunked_sigmoid_pair_loss(img, txt, scale, axis_name, chunk)
            return (loss, *acc_proxy(img, txt, scale))

        return pair
    if kind == "sigmoid_ring":
        if axis_name is not None:
            def pair(img, txt, scale):
                loss = lax.pmean(
                    ring_sigmoid_pair_loss(img, txt, scale, axis_name),
                    axis_name)
                return (loss, *acc_proxy(img, txt, scale))

            return pair
        if mesh is None:
            raise ValueError(
                "loss_impl 'sigmoid_ring' needs a mesh (SPMD mode) or an "
                "axis_name (shard_map mode)")
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        from declip_tpu.parallel.mesh import batch_axes

        axis = batch_axes(mesh)  # ('dcn', 'data') on a multi-slice mesh
        bspec = axis if len(axis) > 1 else axis[0]

        def ring_fn(i, t, s, b):
            return lax.pmean(
                ring_sigmoid_pair_loss(i, t, (s, b), axis), axis)

        ring_sm = shard_map(
            ring_fn, mesh=mesh,
            in_specs=(P(bspec), P(bspec), P(), P()), out_specs=P())

        def pair(img, txt, scale):
            s, b = _split_scale(scale)
            return (ring_sm(img, txt, s, b), *acc_proxy(img, txt, scale))

        return pair
    if kind == "ring":
        if axis_name is not None:
            def pair(img, txt, scale):
                s, _ = _split_scale(scale)
                loss = lax.pmean(
                    ring_clip_pair_loss(img, txt, s, axis_name),
                    axis_name)
                return (loss, *acc_proxy(img, txt, scale))

            return pair
        if mesh is None:
            raise ValueError(
                "loss_impl 'ring' needs a mesh (SPMD mode) or an axis_name "
                "(shard_map mode)")
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        from declip_tpu.parallel.mesh import batch_axes

        axis = batch_axes(mesh)  # ('dcn', 'data') on a multi-slice mesh
        bspec = axis if len(axis) > 1 else axis[0]

        def ring_fn(i, t, s):
            return lax.pmean(ring_clip_pair_loss(i, t, s, axis), axis)

        ring_sm = shard_map(
            ring_fn, mesh=mesh,
            in_specs=(P(bspec), P(bspec), P()), out_specs=P())

        def pair(img, txt, scale):
            s, _ = _split_scale(scale)
            return (ring_sm(img, txt, s), *acc_proxy(img, txt, scale))

        return pair
    raise NotImplementedError(f"loss_impl type {kind!r}")


def topk_accuracy(
    logits: jax.Array, labels: jax.Array, ks: Tuple[int, ...] = (1, 5)
) -> Tuple[jax.Array, ...]:
    """Top-k accuracies in percent (reference accuracy(), misc.py)."""
    order = jnp.argsort(-logits, axis=-1)
    out = []
    for k in ks:
        hit = (order[:, :k] == labels[:, None]).any(axis=-1)
        out.append(100.0 * hit.mean())
    return tuple(out)
