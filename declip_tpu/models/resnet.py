"""CLIP ModifiedResNet (anti-aliased, attention-pooled).

Rebuilds prototype/model/image_encoder/modified_resnet.py: 3-conv stem with
avgpool, Bottleneck blocks with avgpool-before-stride anti-aliasing, and a
QKV AttentionPool2d head.

TPU/JAX design notes:
- NHWC layout (TPU-native conv layout).
- BatchNorm: flax ``nn.BatchNorm`` with fp32 statistics. Under pjit/SPMD with
  the batch sharded over the mesh 'data' axis, batch statistics are computed
  over the *global* batch automatically (the mean over a sharded axis is an
  XLA psum) — SyncBN with bn_group == world_size. The reference's OTHER BN
  modes (modified_resnet.py:116-142) are honored via ``bn_stats_groups``:
  contiguous reshape-groups of the global batch axis reproduce per-rank
  plain BN (``use_sync_bn: False``) and grouped SyncBN (``bn_group_size``)
  exactly, with no collective outside each shard group
  (tests/test_bn_stats_groups.py). ``bn_axis_name`` + group lists support
  the same under shard_map.
- AttentionPool computes attention only for the pooled (mean) query token
  instead of full self-attention + row 0 (modified_resnet.py:75-96) —
  numerically identical, 50x less attention work.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from declip_tpu.ops.attention import dot_product_attention, merge_heads, split_heads

Dtype = Any


class BatchNorm(nn.Module):
    """BatchNorm2d/1d with fp32 stats; optionally synced over a mesh axis.

    Grouped statistics come in two flavors:

    - ``stats_groups > 1`` (the SPMD/jit path): the reference's grouped
      SyncBN / per-rank plain BN (modified_resnet.py:121-142) expressed as
      pure batch math — the global [N] batch axis is reshaped to
      [G, N/G] and moments are taken per contiguous group. With the batch
      sharded over the mesh 'data' axis in rank order, group g covers
      exactly ranks [g*W/G, (g+1)*W/G) — the same contiguous rank groups
      simple_group_split builds (dist.py:39-46). G == data-parallel world
      reproduces ``use_sync_bn: False`` (plain per-rank BatchNorm2d);
      G == world/bn_group_size reproduces grouped SyncBN. XLA keeps the
      reduction local to each shard group (no global collective).
    - ``axis_name + axis_index_groups`` (the shard_map path): computed
      manually via an axis all-gather + static group mask: jax does not
      lower ``pmean`` with ``axis_index_groups`` under shard_map."""

    dtype: Dtype = jnp.float32
    zero_scale: bool = False
    axis_name: Optional[str] = None
    axis_index_groups: Optional[Sequence[Sequence[int]]] = None
    stats_groups: int = 1
    # fp32 is the default (and the reference's numerics); bfloat16 is an
    # opt-in experiment knob (bench.py --bn-bf16-stats) — moments and the
    # normalize math run in bf16, running stats stay fp32
    stats_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        sd = self.stats_dtype
        if train and self.stats_groups > 1 and self.axis_name is None:
            return self._grouped_batch(x.astype(sd)).astype(self.dtype)
        if (self.axis_name is not None and self.axis_index_groups is not None
                and train):
            return self._grouped(x.astype(sd)).astype(self.dtype)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=sd,
            param_dtype=jnp.float32,
            scale_init=(
                nn.initializers.zeros if self.zero_scale else nn.initializers.ones
            ),
            axis_name=self.axis_name,
        )(x.astype(sd))
        return y.astype(self.dtype)

    def _grouped_batch(self, x: jax.Array) -> jax.Array:
        """Per-group statistics over contiguous batch groups (jit/SPMD path).

        Normalizes each sample with the moments of its batch group; running
        statistics are updated with the GLOBAL moments so they stay
        replica-consistent (delta: the reference keeps per-group running
        stats per rank and checkpoints rank 0's — documented in PARITY.md)."""
        g = self.stats_groups
        n = x.shape[0]
        if n % g:
            raise ValueError(
                f"BatchNorm stats_groups={g} must divide the batch axis "
                f"({n}); check batch_size x data-parallel ways vs "
                f"use_sync_bn/bn_group_size")
        xs = x.reshape((g, n // g) + x.shape[1:])
        axes = tuple(range(1, xs.ndim - 1))
        mean = xs.mean(axis=axes, keepdims=True)                 # [G,1..1,C]
        sq = (xs * xs).mean(axis=axes, keepdims=True)
        var = jnp.maximum(sq - mean * mean, 0.0)
        gmean = mean.mean(axis=0).reshape(-1)                    # [C]
        gvar = jnp.maximum(
            sq.mean(axis=0).reshape(-1) - gmean * gmean, 0.0)
        y = _GroupedScaleBias(
            zero_scale=self.zero_scale, name="BatchNorm_0"
        )(xs, mean, var, global_mean=gmean, global_var=gvar)
        return y.reshape(x.shape)

    def _grouped(self, x: jax.Array) -> jax.Array:
        """Normalize with statistics pooled over this device's rank group
        (all-gather of per-rank moment sums + static group-membership mask).
        Running statistics are updated with the GLOBAL moments so they stay
        replica-consistent (delta: the reference keeps per-group running
        stats per rank)."""
        c = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        local_sum = x.sum(axis=reduce_axes)
        local_sq = (x * x).sum(axis=reduce_axes)
        local_n = float(np.prod([x.shape[a] for a in reduce_axes]))

        sums = jax.lax.all_gather(local_sum, self.axis_name)  # [W, C]
        sqs = jax.lax.all_gather(local_sq, self.axis_name)
        w = sums.shape[0]
        idx = jax.lax.axis_index(self.axis_name)
        rank_to_group = np.zeros((w,), np.int32)
        member = np.zeros((len(self.axis_index_groups), w), np.float32)
        for g, ranks in enumerate(self.axis_index_groups):
            member[g, list(ranks)] = 1.0
            rank_to_group[list(ranks)] = g
        row = jnp.asarray(member)[jnp.asarray(rank_to_group)[idx]]  # [W]

        gsum = (row[:, None] * sums).sum(0)
        gsq = (row[:, None] * sqs).sum(0)
        gn = row.sum() * local_n
        mean = gsum / gn
        var = jnp.maximum(gsq / gn - mean * mean, 0.0)

        return _GroupedScaleBias(
            zero_scale=self.zero_scale, name="BatchNorm_0"
        )(x, mean, var,
          global_mean=sums.sum(0) / (w * local_n),
          global_var=jnp.maximum(
              sqs.sum(0) / (w * local_n)
              - (sums.sum(0) / (w * local_n)) ** 2, 0.0))


class _GroupedScaleBias(nn.Module):
    """scale/bias + running stats with the standard flax BatchNorm variable
    layout, applied around externally-computed group statistics."""

    zero_scale: bool = False

    @nn.compact
    def __call__(self, x, mean, var, *, global_mean, global_var):
        c = x.shape[-1]
        scale = self.param(
            "scale",
            nn.initializers.zeros if self.zero_scale else nn.initializers.ones,
            (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        if not self.is_initializing():
            ra_mean.value = 0.9 * ra_mean.value + 0.1 * global_mean
            ra_var.value = 0.9 * ra_var.value + 0.1 * global_var
        xhat = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return xhat * scale + bias


def _conv(features: int, kernel: int, name: str, dtype: Dtype):
    return nn.Conv(
        features,
        (kernel, kernel),
        padding="SAME" if kernel > 1 else "VALID",
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> (avgpool if stride>1) -> 1x1, all convs stride 1
    (modified_resnet.py:14-57)."""

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    expansion: int = 4
    bn_stats_groups: int = 1
    bn_stats_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        inplanes = x.shape[-1]
        out_planes = self.planes * self.expansion
        bn = partial(BatchNorm, self.dtype, axis_name=self.bn_axis_name,
                     stats_groups=self.bn_stats_groups,
                     stats_dtype=self.bn_stats_dtype)

        out = _conv(self.planes, 1, "conv1", self.dtype)(x)
        out = nn.relu(bn(name="bn1")(out, train=train))
        out = _conv(self.planes, 3, "conv2", self.dtype)(out)
        out = nn.relu(bn(name="bn2")(out, train=train))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride), (self.stride, self.stride))
        out = _conv(out_planes, 1, "conv3", self.dtype)(out)
        out = bn(zero_scale=True, name="bn3")(out, train=train)

        if self.stride > 1 or inplanes != out_planes:
            identity = nn.avg_pool(
                x, (self.stride, self.stride), (self.stride, self.stride)
            ) if self.stride > 1 else x
            identity = _conv(out_planes, 1, "downsample_conv", self.dtype)(identity)
            identity = bn(name="downsample_bn")(identity, train=train)
        else:
            identity = x
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """QKV pooling over spatial positions + mean token
    (modified_resnet.py:60-96)."""

    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32
    # grid size the positional embedding is parameterized at; inputs at other
    # spatial sizes bilinearly interpolate it (used by the SSL builders'
    # multi-resolution views). None = parameterize at the first-seen size.
    trained_grid: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, H, W, C] -> tokens [B, HW, C]
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean_tok = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # [B, HW+1, C]
        g0 = self.trained_grid or h
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=c ** -0.5),
            (g0 * g0 + 1, c),
        )
        if (h, w) != (g0, g0):
            grid = pos[1:].reshape(g0, g0, c).astype(jnp.float32)
            grid = jax.image.resize(grid, (h, w, c), method="bilinear")
            pos = jnp.concatenate(
                [pos[:1].astype(jnp.float32), grid.reshape(h * w, c)], axis=0)
        tokens = tokens + pos.astype(self.dtype)

        std = c ** -0.5
        dense = lambda feats, name: nn.Dense(  # noqa: E731
            feats,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=std),
            name=name,
        )
        q = dense(c, "q_proj")(tokens[:, :1])  # only the pooled query
        k = dense(c, "k_proj")(tokens)
        v = dense(c, "v_proj")(tokens)
        q = split_heads(q, self.num_heads)
        k = split_heads(k, self.num_heads)
        v = split_heads(v, self.num_heads)
        o = merge_heads(dot_product_attention(q, k, v))[:, 0]
        return dense(self.output_dim, "c_proj")(o)


class ModifiedResNet(nn.Module):
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    embed_dim: int = 1024
    heads: int = 32
    input_resolution: int = 224
    width: int = 64
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    # reference-config BN knobs (modified_resnet.py:116-142). Under SPMD they
    # resolve to bn_stats_groups at build time (clip_model.build_towers):
    # use_sync_bn=False -> one group per data-parallel replica (plain
    # BatchNorm2d semantics); bn_group_size=G -> world/G contiguous rank
    # groups (grouped SyncBN). bn_stats_groups=1 = global-batch stats.
    bn_group_size: int = 1
    bn_sync_stats: bool = False
    use_sync_bn: bool = True
    bn_stats_groups: int = 1
    bn_stats_dtype: Dtype = jnp.float32
    # modified_resnet_modified.py variant: attnpool emits the raw width*32
    # feature and a separate fc projects to embed_dim (fc_embed=True)
    fc_embed: bool = False
    # route EVERY resolution through attnpool (pos-emb interpolated) instead
    # of the reference's mean+fc fallback for non-input_resolution inputs —
    # the SSL builders need one consistent head across CLSA's multi-res views
    attnpool_all_res: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool = True,
        return_dense: bool = False, return_feature: bool = False,
    ):
        """x: [B, H, W, 3] NHWC -> [B, embed_dim]."""
        x = x.astype(self.dtype)
        w = self.width
        bn = partial(BatchNorm, self.dtype, axis_name=self.bn_axis_name,
                     stats_groups=self.bn_stats_groups,
                     stats_dtype=self.bn_stats_dtype)

        # 3-layer stem (modified_resnet.py:149-157); stride-2 first conv
        x = nn.Conv(w // 2, (3, 3), strides=2, padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(bn(name="bn1")(x, train=train))
        x = _conv(w // 2, 3, "conv2", self.dtype)(x)
        x = nn.relu(bn(name="bn2")(x, train=train))
        x = _conv(w, 3, "conv3", self.dtype)(x)
        x = nn.relu(bn(name="bn3")(x, train=train))
        x = nn.avg_pool(x, (2, 2), (2, 2))

        for stage, (blocks, planes, stride) in enumerate(
            zip(self.layers, (w, w * 2, w * 4, w * 8), (1, 2, 2, 2))
        ):
            for i in range(blocks):
                x = Bottleneck(
                    planes,
                    stride=stride if i == 0 else 1,
                    dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name,
                    bn_stats_groups=self.bn_stats_groups,
                    bn_stats_dtype=self.bn_stats_dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train=train)

        dense = x.reshape(x.shape[0], -1, x.shape[-1])  # [B, HW, C]
        if x.shape[1] == self.input_resolution // 32 or self.attnpool_all_res:
            pool_dim = w * 32 if self.fc_embed else self.embed_dim
            feature = AttentionPool2d(
                self.heads, pool_dim, dtype=self.dtype,
                trained_grid=self.input_resolution // 32, name="attnpool"
            )(x)
            pooled = nn.Dense(
                self.embed_dim, dtype=self.dtype, name="fc"
            )(feature) if self.fc_embed else feature
        else:
            # non-224 eval path (modified_resnet.py:205-210); feature is the
            # pre-fc pooled vector (modified_resnet_modified.py:206-210)
            feature = x.mean(axis=(1, 2))
            pooled = nn.Dense(self.embed_dim, dtype=self.dtype, name="fc")(
                feature)
        ret = [pooled]
        if return_dense:
            ret.append(dense)
        if return_feature:
            ret.append(feature)
        return ret[0] if len(ret) == 1 else tuple(ret)

    def frozen_param_paths(self) -> Tuple[str, ...]:
        return ()


def modified_resnet_R50(**kwargs) -> ModifiedResNet:
    defaults = dict(layers=(3, 4, 6, 3), heads=32, input_resolution=224, width=64)
    defaults.update(kwargs)
    return ModifiedResNet(**defaults)


def modified_resnet_R101(**kwargs) -> ModifiedResNet:
    defaults = dict(layers=(3, 4, 23, 3), heads=32, input_resolution=224, width=64)
    defaults.update(kwargs)
    return ModifiedResNet(**defaults)
