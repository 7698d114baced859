"""On-device (XLA) photometric augmentation.

The BASELINE.json north star moves the reference's DALI/PIL augmentation
pipeline onto the device: the host does geometry only (decode + random
crop + resize, via native/fastload.cc or PIL) and ships **uint8** crops
(4x less host->device traffic than float32); everything photometric —
color jitter, grayscale, gaussian blur, horizontal flip, normalize —
runs fused inside the jitted train step on the TPU's VPU.

Parity: parameter ranges and probabilities match the reference's MOCOV2
preset (imagenet_dataloader.py:66-74); the ops use standard linear-RGB
definitions (torchvision semantics for brightness/contrast/saturation, YIQ
rotation for hue, separable gaussian for blur). Exact PIL bit-parity is not a
goal — augmentation is stochastic; what matters is the distribution.

All randomness is derived from a single JAX key (fold_in of the step), so
augmentation is reproducible and resume-exact.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from declip_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

# YIQ conversion for hue rotation
_RGB2YIQ = jnp.array([
    [0.299, 0.587, 0.114],
    [0.596, -0.274, -0.322],
    [0.211, -0.523, 0.312],
], jnp.float32)
_YIQ2RGB = jnp.linalg.inv(_RGB2YIQ)


def _grayscale(x: jax.Array) -> jax.Array:
    w = jnp.array([0.299, 0.587, 0.114], x.dtype)
    g = (x * w).sum(-1, keepdims=True)
    return jnp.broadcast_to(g, x.shape)


def _blur_kernel(sigma: jax.Array, radius: int = 4) -> jax.Array:
    """Per-sample 1-D gaussian taps [B, 2r+1]."""
    t = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(t[None, :] ** 2) / (2.0 * sigma[:, None] ** 2))
    return k / k.sum(-1, keepdims=True)


def _separable_blur(x: jax.Array, taps: jax.Array) -> jax.Array:
    """x: [B, H, W, 3]; taps: [B, K] per-sample gaussian. Whole-batch
    shifted-slice einsum (no per-sample conv, fuses into K fma passes)."""
    k = taps.shape[-1]
    pad = k // 2
    h, w = x.shape[1], x.shape[2]

    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="edge")
    out = jnp.zeros_like(x)
    for i in range(k):
        out = out + xp[:, :, i:i + w, :] * taps[:, i, None, None, None]
    xp = jnp.pad(out, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="edge")
    out2 = jnp.zeros_like(x)
    for i in range(k):
        out2 = out2 + xp[:, i:i + h, :, :] * taps[:, i, None, None, None]
    return out2


def photometric_augment(
    rng: jax.Array,
    images_u8: jax.Array,
    *,
    jitter: Tuple[float, float, float, float] = (0.4, 0.4, 0.4, 0.1),
    p_jitter: float = 0.8,
    p_gray: float = 0.2,
    p_blur: float = 0.5,
    blur_sigma: Tuple[float, float] = (0.1, 2.0),
    p_flip: float = 0.5,
    dtype=jnp.float32,
) -> jax.Array:
    """uint8 [B, H, W, 3] -> normalized [B, H, W, 3] with MOCOV2-style
    per-sample photometric augmentation, fully on device."""
    b = images_u8.shape[0]
    x = images_u8.astype(jnp.float32) / 255.0
    keys = jax.random.split(rng, 10)

    def u(key, lo, hi, shape=(b, 1, 1, 1)):
        return jax.random.uniform(key, shape, jnp.float32, lo, hi)

    bj, cj, sj, hj = jitter
    apply_j = (jax.random.uniform(keys[0], (b, 1, 1, 1)) < p_jitter)

    # brightness
    f = jnp.where(apply_j, u(keys[1], 1 - bj, 1 + bj), 1.0)
    x = x * f
    # contrast (torchvision: blend with the mean of the grayscale image)
    f = jnp.where(apply_j, u(keys[2], 1 - cj, 1 + cj), 1.0)
    mean_g = _grayscale(x).mean(axis=(1, 2, 3), keepdims=True)
    x = mean_g + f * (x - mean_g)
    # saturation (blend with per-pixel grayscale)
    f = jnp.where(apply_j, u(keys[3], 1 - sj, 1 + sj), 1.0)
    x = _grayscale(x) + f * (x - _grayscale(x))
    # hue: rotate the IQ chroma plane
    theta = jnp.where(
        apply_j, u(keys[4], -hj, hj), 0.0)[:, 0, 0, 0] * 2.0 * jnp.pi
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.zeros((b, 3, 3), jnp.float32)
    rot = rot.at[:, 0, 0].set(1.0)
    rot = rot.at[:, 1, 1].set(cos).at[:, 1, 2].set(-sin)
    rot = rot.at[:, 2, 1].set(sin).at[:, 2, 2].set(cos)
    m = jnp.einsum("ij,bjk,kl->bil", _YIQ2RGB, rot, _RGB2YIQ)
    x = jnp.einsum("bhwc,bdc->bhwd", x, m)

    # random grayscale
    g = jax.random.uniform(keys[5], (b, 1, 1, 1)) < p_gray
    x = jnp.where(g, _grayscale(x), x)

    # gaussian blur
    do_blur = jax.random.uniform(keys[6], (b,)) < p_blur
    sigma = jax.random.uniform(keys[7], (b,), jnp.float32, *blur_sigma)
    blurred = _separable_blur(x, _blur_kernel(sigma))
    x = jnp.where(do_blur[:, None, None, None], blurred, x)

    # horizontal flip
    flip = jax.random.uniform(keys[8], (b, 1, 1, 1)) < p_flip
    x = jnp.where(flip, x[:, :, ::-1, :], x)

    x = jnp.clip(x, 0.0, 1.0)
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return x.astype(dtype)


def normalize_only(images_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    x = images_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return x.astype(dtype)


# which views of each preset get the strong MOCOV2 photometrics; the others
# are normalize-only (matching the host presets: SLIP's base view is
# crop+normalize, STANDARD_SLIP; STANDARD_CLIP has no photometrics at all)
_PRESET_STRONG_VIEWS = {
    "MOCOV2": (True, True),
    "SIMCLR": (True, True),
    "SIMSIAM": (True, True),
    "SLIP": (False, True, True),
    "STANDARD_CLIP": (False,),
    "ONECROP": (False,),
}


def augment_views(rng: jax.Array, crops_u8: jax.Array, *, views: int,
                  preset: str = "MOCOV2", dtype=jnp.float32, **kw
                  ) -> jax.Array:
    """uint8 [B, H, W, 3*views] (independent host-side crops stacked on the
    channel axis) -> normalized [B, H, W, 3*views]. Per-view treatment
    follows the named preset: strong views get independent MOCOV2
    photometric draws, weak views (SLIP base, CLIP single view) are
    normalized only."""
    strong = _PRESET_STRONG_VIEWS.get(preset, (True,) * views)
    outs = []
    for v in range(views):
        view = crops_u8[..., 3 * v:3 * (v + 1)]
        if v < len(strong) and not strong[v]:
            outs.append(normalize_only(view, dtype=dtype))
        else:
            outs.append(
                photometric_augment(
                    jax.random.fold_in(rng, v), view, dtype=dtype, **kw,
                )
            )
    return jnp.concatenate(outs, axis=-1)
