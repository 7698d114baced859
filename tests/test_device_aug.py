"""On-device augmentation: shapes, determinism, distributional sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from declip_tpu.data.device_aug import augment_views, photometric_augment
from declip_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    build_geometry_augmentation,
)


def _u8(rng, b=8, h=32, w=32, c=3):
    return jnp.asarray(rng.integers(0, 255, (b, h, w, c)), jnp.uint8)


def test_shapes_and_dtype(rng):
    x = _u8(rng)
    out = photometric_augment(jax.random.PRNGKey(0), x, dtype=jnp.bfloat16)
    assert out.shape == (8, 32, 32, 3)
    assert out.dtype == jnp.bfloat16


def test_deterministic(rng):
    x = _u8(rng)
    a = photometric_augment(jax.random.PRNGKey(3), x)
    b = photometric_augment(jax.random.PRNGKey(3), x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = photometric_augment(jax.random.PRNGKey(4), x)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_normalization_range(rng):
    # all-off augmentation == plain normalize
    x = _u8(rng)
    out = photometric_augment(
        jax.random.PRNGKey(0), x, p_jitter=0.0, p_gray=0.0, p_blur=0.0,
        p_flip=0.0,
    )
    expected = (np.asarray(x, np.float32) / 255 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_grayscale_forced(rng):
    x = _u8(rng)
    out = photometric_augment(
        jax.random.PRNGKey(0), x, p_jitter=0.0, p_gray=1.0, p_blur=0.0,
        p_flip=0.0,
    )
    # un-normalize: all three channels equal
    un = np.asarray(out) * IMAGENET_STD + IMAGENET_MEAN
    np.testing.assert_allclose(un[..., 0], un[..., 1], atol=1e-5)
    np.testing.assert_allclose(un[..., 1], un[..., 2], atol=1e-5)


def test_flip_forced(rng):
    x = _u8(rng)
    out = photometric_augment(
        jax.random.PRNGKey(0), x, p_jitter=0.0, p_gray=0.0, p_blur=0.0,
        p_flip=1.0,
    )
    expected = (np.asarray(x, np.float32)[:, :, ::-1] / 255 - IMAGENET_MEAN
                ) / IMAGENET_STD
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_blur_smooths(rng):
    x = _u8(rng)
    out = photometric_augment(
        jax.random.PRNGKey(0), x, p_jitter=0.0, p_gray=0.0, p_blur=1.0,
        blur_sigma=(2.0, 2.0), p_flip=0.0,
    )
    plain = photometric_augment(
        jax.random.PRNGKey(0), x, p_jitter=0.0, p_gray=0.0, p_blur=0.0,
        p_flip=0.0,
    )
    # blur reduces high-frequency energy
    def hf(a):
        a = np.asarray(a)
        return np.abs(np.diff(a, axis=1)).mean() + np.abs(
            np.diff(a, axis=2)).mean()

    assert hf(out) < hf(plain) * 0.8


def test_multiview_and_geometry(rng):
    x2 = _u8(rng, c=6)
    out = augment_views(jax.random.PRNGKey(0), x2, views=2)
    assert out.shape == (8, 32, 32, 6)
    # views get independent draws
    assert not np.allclose(np.asarray(out[..., :3]), np.asarray(out[..., 3:]))

    from PIL import Image

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (300, 400, 3), np.uint8))
    geo = build_geometry_augmentation("MOCOV2")(img)
    assert geo.shape == (224, 224, 6)
    assert geo.dtype == np.uint8
