"""Legacy pure-vision SSL pretraining builders: MoCo, SimCLR, CLSA.

Rebuilds prototype/utils/{moco,simclr,clsa}_builder.py (SURVEY.md §2.7 —
support machinery predating the CLIP solvers, kept for capability parity).

TPU translation notes:
- MoCo's momentum encoder + negatives queue are functional state (like the
  NN memory bank); ShuffleBN (moco_builder's group-split batch shuffling, a
  workaround for per-GPU BN statistics leaking) is unnecessary under SPMD —
  BatchNorm statistics are already global across the mesh, which removes the
  information leak ShuffleBN patches; an optional batch permutation is kept
  for strict parity experiments.
- SimCLR is a thin projector head + NT-Xent.
- CLSA adds the stronger-augmentation DDM loss on top of MoCo.
- The loss math lives in ONE place — train/method_losses.py
  ({moco,simclr}_losses) — this module holds the model/state machinery only.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp



class MoCoState(NamedTuple):
    key_params: Any  # EMA (momentum) encoder params
    queue: jax.Array  # [K, dim] normalized negatives
    queue_ptr: jax.Array  # int32
    # the key encoder's own BN running statistics (the reference's encoder_k
    # buffers, which update through key forwards but are never momentum-mixed)
    key_batch_stats: Any = None


def init_moco_state(params, rng: jax.Array, queue_size: int, dim: int,
                    batch_stats=None) -> MoCoState:
    q = jax.random.normal(rng, (queue_size, dim))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return MoCoState(jax.tree.map(jnp.copy, params), q,
                     jnp.zeros((), jnp.int32),
                     jax.tree.map(jnp.copy, batch_stats)
                     if batch_stats is not None else None)


def momentum_update(state: MoCoState, params, m: float = 0.999) -> MoCoState:
    new_key = jax.tree.map(
        lambda k, p: m * k + (1 - m) * p, state.key_params, params
    )
    return state._replace(key_params=new_key)


def enqueue_keys(state: MoCoState, keys: jax.Array) -> MoCoState:
    k = keys.shape[0]
    size = state.queue.shape[0]
    start = jnp.minimum(state.queue_ptr, size - k)
    queue = jax.lax.dynamic_update_slice(
        state.queue, jax.lax.stop_gradient(keys), (start, 0))
    ptr = jnp.where(state.queue_ptr + k >= size, 0, state.queue_ptr + k)
    return state._replace(queue=queue, queue_ptr=ptr)


class SimCLRHead(nn.Module):
    """2-layer projection head (simclr_builder.py)."""

    hidden_dim: int = 2048
    out_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)


class SSLModel(nn.Module):
    """Pure-vision SSL model: encoder + projection head, method-dispatched
    by the train step (declip_tpu/train/train_step.py ssl branch).

    The end-to-end training paths the reference builders enable
    (moco_builder.py:106-161, simclr_builder.py, clsa_builder.py:110-180):

    - moco: query path here; key path = same module applied with the
      momentum params held in MoCoState (train-step orchestrated, the
      functional form of encoder_k). ShuffleBN is unnecessary under SPMD —
      BN statistics are global over the mesh, which removes the per-GPU
      leak ShuffleBN patches (moco_builder.py:74-118).
    - simclr: both weak views through the query path + gathered NT-Xent.
    - clsa: moco + DDM terms on the multi-resolution strong views.
    """

    visual: nn.Module
    ssl_method: str = "moco"  # moco | simclr | clsa
    dim: int = 128
    K: int = 65536
    m: float = 0.999
    T: float = 0.07
    mlp: bool = True
    hidden_dim: int = 2048  # encoder output width (head input)
    clsa_ratio: float = 1.0
    clsa_avg: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        # multi-method module (encode called 2+ times per step) -> setup(),
        # not nn.compact (CLAUDE.md convention)
        if self.ssl_method == "simclr":
            self.head = SimCLRHead(hidden_dim=self.hidden_dim,
                                   out_dim=self.dim, dtype=self.dtype)
        elif self.mlp:  # MoCo-v2 mlp head (moco_builder.py:25-28)
            self.head_fc1 = nn.Dense(self.hidden_dim, dtype=self.dtype)
            self.head_fc2 = nn.Dense(self.dim, dtype=self.dtype)
        else:
            self.head_fc2 = nn.Dense(self.dim, dtype=self.dtype)

    def _head(self, feat: jax.Array) -> jax.Array:
        if self.ssl_method == "simclr":
            return self.head(feat)
        if self.mlp:
            feat = nn.relu(self.head_fc1(feat))
        return self.head_fc2(feat)

    def encode(self, images: jax.Array, *, train: bool = True) -> jax.Array:
        """images [B, H, W, 3] -> L2-normalized [B, dim]."""
        feat = self.visual(images.astype(self.dtype), train=train)
        z = self._head(feat).astype(jnp.float32)
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def __call__(self, batch, *, train: bool = True):
        images = batch["images"] if isinstance(batch, dict) else batch
        if images.shape[-1] < 6:
            # a single-view transform (e.g. STANDARD_CLIP) silently yields a
            # zero-channel second view downstream — refuse at trace time
            raise ValueError(
                f"{self.ssl_method} needs a two-view transform (6-channel "
                f"images, e.g. MOCOV2); got {images.shape[-1]} channels")
        x1 = images[..., :3]
        out = {"q": self.encode(x1, train=train)}
        if self.ssl_method == "simclr":
            out["z2"] = self.encode(images[..., 3:6], train=train)
        elif self.ssl_method == "clsa" and isinstance(batch, dict):
            strong = []
            i = 0
            while f"images_strong_{i}" in batch:
                strong.append(self.encode(
                    batch[f"images_strong_{i}"], train=train))
                i += 1
            out["q_strong"] = tuple(strong)
        return out


def _build_ssl(method: str, kwargs: dict) -> SSLModel:
    from declip_tpu.models.resnet import (
        modified_resnet_R50,
        modified_resnet_R101,
    )
    from declip_tpu.models.vit import (
        visual_transformer_B16,
        visual_transformer_B32,
    )

    kwargs = dict(kwargs or {})
    image_kwargs = dict(kwargs.pop("image_encode", None) or {})
    dtype = kwargs.pop("dtype", jnp.float32)
    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)
    image_kwargs.setdefault("dtype", dtype)
    arch = kwargs.pop("arch", "res50")
    factory = {"res50": modified_resnet_R50, "res101": modified_resnet_R101,
               "vitb32": visual_transformer_B32,
               "vitb16": visual_transformer_B16}[arch]
    image_kwargs.setdefault("embed_dim", 2048)
    if arch.startswith("res"):
        # one consistent pooling head across CLSA's multi-resolution views
        # (the reference's base_encoder pools identically at every size);
        # ViT handles off-resolution inputs natively (pos-emb interpolation)
        image_kwargs.setdefault("attnpool_all_res", True)
    ssl = dict(kwargs.pop("ssl", None) or {})
    ssl.update(kwargs)  # flat kwargs also accepted
    ssl.setdefault("hidden_dim", int(image_kwargs["embed_dim"]))
    if method == "simclr":
        ssl.setdefault("T", 0.5)  # SimCLR temperature (simclr_builder.py)
    return SSLModel(visual=factory(**image_kwargs), ssl_method=method,
                    dtype=dtype, **ssl)


def _register_ssl_models():
    from declip_tpu.utils.registry import MODELS

    for method in ("moco", "simclr", "clsa"):
        for arch in ("res50", "res101", "vitb32", "vitb16"):
            def build(method=method, arch=arch, **kwargs):
                kwargs.setdefault("arch", arch)
                return _build_ssl(method, kwargs)

            MODELS.register(build, name=f"{method}_{arch}")


_register_ssl_models()
