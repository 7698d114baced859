"""Method heads: SimSiam projection/prediction MLPs, FILIP dense mappings.

References: prototype/model/declip.py:33-130 (projection_MLP with BN on every
fc, prediction_MLP bottleneck with BN only on hidden), prototype/model/
slip.py:49-109 (projection_MLP with SyncBN and optional out_bn — SLIP's
``predictor_sim`` uses hidden 4096 -> 256 with out_bn=False),
prototype/model/filip.py:40-41 (linear image/text mappings to dense_embed_dim).

BatchNorm here is over the batch axis of [B, D] activations; under pjit/SPMD
with batch sharded over the mesh the statistics are global (the reference
needed SyncBatchNorm kernels for this, slip.py:22).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from declip_tpu.models.resnet import BatchNorm

Dtype = Any


class ProjectionMLP(nn.Module):
    """3-layer SimSiam projector; BN after every fc, no ReLU after the last."""

    hidden_dim: int = 1024
    out_dim: int = 1024
    num_layers: int = 3
    out_bn: bool = True
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="linear1")(x)
        x = BatchNorm(self.dtype, axis_name=self.bn_axis_name, name="bn1")(x, train=train)
        x = nn.relu(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="linear2")(x)
        x = BatchNorm(self.dtype, axis_name=self.bn_axis_name, name="bn2")(x, train=train)
        if self.num_layers == 3:
            x = nn.relu(x)
            x = nn.Dense(self.out_dim, dtype=self.dtype, name="linear3")(x)
            if self.out_bn:
                x = BatchNorm(self.dtype, axis_name=self.bn_axis_name, name="bn3")(x, train=train)
        return x


class PredictionMLP(nn.Module):
    """2-layer SimSiam predictor bottleneck; BN+ReLU on hidden only."""

    hidden_dim: int = 512
    out_dim: int = 1024
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="linear1")(x)
        x = BatchNorm(self.dtype, axis_name=self.bn_axis_name, name="bn1")(x, train=train)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="layer2")(x)
