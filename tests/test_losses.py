"""Loss parity tests against independent torch/numpy implementations of the
reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from declip_tpu import losses as L
from declip_tpu.ops.contrastive import (
    clip_infonce,
    cross_entropy,
    infonce_labels,
    similarity_logits,
    topk_accuracy,
)
from declip_tpu.ops.filip_ops import late_interaction_logits


@pytest.fixture
def feats(rng):
    return (
        rng.normal(size=(8, 16)).astype(np.float32),
        rng.normal(size=(8, 16)).astype(np.float32),
    )


def test_cross_entropy_matches_torch(rng):
    logits = rng.normal(size=(6, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=(6,))
    ours = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    ref = F.cross_entropy(torch.tensor(logits), torch.tensor(labels))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_clip_infonce_symmetric(rng):
    li = rng.normal(size=(4, 4)).astype(np.float32)
    lt = rng.normal(size=(4, 4)).astype(np.float32)
    labels = np.arange(4)
    ours = clip_infonce(jnp.asarray(li), jnp.asarray(lt), jnp.asarray(labels))
    ref = (
        F.cross_entropy(torch.tensor(li), torch.tensor(labels))
        + F.cross_entropy(torch.tensor(lt), torch.tensor(labels))
    ) / 2
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_simsiam_matches_reference_formula(feats):
    p1, z2 = feats
    p2 = p1[::-1].copy()
    z1 = z2[::-1].copy()

    def D(p, z):
        p = torch.tensor(p)
        z = torch.tensor(z)
        p = p / p.norm(dim=-1, keepdim=True)
        z = z / z.norm(dim=-1, keepdim=True)
        return (p * z).sum(dim=1).mean()

    ref = -0.5 * (float(D(p1, z2)) + float(D(p2, z1)))
    ours = L.simsiam_loss(
        jnp.asarray(p1), jnp.asarray(z1), jnp.asarray(p2), jnp.asarray(z2)
    )
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_simsiam_stop_gradient(feats):
    p1, z2 = feats
    grad = jax.grad(
        lambda z: L.simsiam_loss(jnp.asarray(p1), z, jnp.asarray(p1), z)
    )(jnp.asarray(z2))
    assert np.allclose(np.asarray(grad), 0.0)


def _ref_nt_xent(z_i, z_j, temperature):
    """Literal NT_Xent (nt_xent.py:6-44) in torch."""
    b = z_i.shape[0]
    p1 = torch.cat([torch.tensor(z_i), torch.tensor(z_j)], dim=0)
    sim = F.cosine_similarity(p1.unsqueeze(1), p1.unsqueeze(0), dim=2) / temperature
    sim_i_j = torch.diag(sim, b)
    sim_j_i = torch.diag(sim, -b)
    positive = torch.cat([sim_i_j, sim_j_i]).reshape(2 * b, 1)
    mask = torch.ones((2 * b, 2 * b), dtype=bool).fill_diagonal_(0)
    for i in range(b):
        mask[i, b + i] = 0
        mask[b + i, i] = 0
    negative = sim[mask].reshape(2 * b, -1)
    labels = torch.zeros(2 * b).long()
    logits = torch.cat([positive, negative], dim=1)
    return float(F.cross_entropy(logits, labels, reduction="sum") / (2 * b))


def test_nt_xent_matches_reference(feats):
    z_i, z_j = feats
    ours = L.nt_xent(jnp.asarray(z_i), jnp.asarray(z_j), temperature=0.5)
    np.testing.assert_allclose(float(ours), _ref_nt_xent(z_i, z_j, 0.5), rtol=1e-3)


def test_nt_xent_gather_single_shard_consistency(feats):
    """With world=1 (gathered == local), NT_Xent_gather must equal the
    reference masked computation."""
    z_i, z_j = feats
    b = z_i.shape[0]
    labels = jnp.arange(b)
    ours = L.nt_xent_gather(
        jnp.asarray(z_i), jnp.asarray(z_i), jnp.asarray(z_j), jnp.asarray(z_j),
        labels, temperature=0.1,
    )
    # literal reference NT_Xent_gather (nt_xent.py:47-97)
    p0 = torch.cat([torch.tensor(z_i), torch.tensor(z_j)])
    p1 = torch.cat([torch.tensor(z_i), torch.tensor(z_j)])
    sim = F.cosine_similarity(p0.unsqueeze(1), p1.unsqueeze(0), dim=2) / 0.1
    ids = torch.arange(b)
    lab = torch.arange(b)
    mask_pos = torch.zeros(2 * b, 2 * b, dtype=bool)
    mask_pos[ids + b, lab] = 1
    mask_pos[ids, lab + b] = 1
    mask_neg = torch.ones(2 * b, 2 * b, dtype=bool)
    mask_neg[ids, lab] = 0
    mask_neg[ids + b, lab] = 0
    mask_neg[ids, lab + b] = 0
    mask_neg[ids + b, lab + b] = 0
    pos = sim[mask_pos].reshape(2 * b, -1)
    neg = sim[mask_neg].reshape(2 * b, -1)
    logits = torch.cat([pos, neg], dim=1)
    ref = F.cross_entropy(logits, torch.zeros(2 * b).long(), reduction="sum") / (2 * b)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-3)


def test_nt_xent_convirt_matches_reference(feats):
    zis, zjs = feats
    t, alpha = 0.1, 0.75
    ours = L.nt_xent_convirt(jnp.asarray(zis), jnp.asarray(zjs), t, alpha)
    a = torch.tensor(zis)
    b_ = torch.tensor(zjs)
    a = F.normalize(a, dim=1)
    b_ = F.normalize(b_, dim=1)
    logits_ab = a @ b_.t() / t
    logits_ba = b_ @ a.t() / t
    lbl = torch.arange(a.shape[0])
    ref = alpha * F.cross_entropy(logits_ab, lbl) + (1 - alpha) * F.cross_entropy(
        logits_ba, lbl
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-3)


def test_mlm_loss_ignores_minus_100(rng):
    logits = rng.normal(size=(2, 5, 11)).astype(np.float32)
    labels = np.full((2, 5), -100)
    labels[0, 1] = 3
    labels[1, 4] = 7
    ours = L.mlm_loss(jnp.asarray(logits), jnp.asarray(labels))
    ref = F.cross_entropy(
        torch.tensor(logits).reshape(-1, 11),
        torch.tensor(labels).reshape(-1),
        ignore_index=-100,
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    # all ignored -> 0, not NaN
    allmask = L.mlm_loss(jnp.asarray(logits), jnp.full((2, 5), -100))
    assert float(allmask) == 0.0


def test_label_smooth_ce(rng):
    logits = rng.normal(size=(4, 6)).astype(np.float32)
    labels = rng.integers(0, 6, size=(4,))
    ours = L.label_smooth_ce(jnp.asarray(logits), jnp.asarray(labels), 0.1, 6)
    v = 0.1 / 6
    one_hot = torch.full((4, 6), v)
    one_hot.scatter_(1, torch.tensor(labels).view(-1, 1), 1 - 0.1 + v)
    ref = -(F.log_softmax(torch.tensor(logits), 1) * one_hot).sum() / 4
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_late_interaction_matches_naive(rng):
    d1 = rng.normal(size=(3, 4, 8)).astype(np.float32)
    d2 = rng.normal(size=(6, 5, 8)).astype(np.float32)
    scale = jnp.asarray(2.0)
    ours = late_interaction_logits(jnp.asarray(d1), jnp.asarray(d2), scale,
                                   chunk_size=2)
    naive = 2.0 * np.einsum("bnd,lmd->blnm", d1, d2).max(-1).mean(-1)
    np.testing.assert_allclose(np.asarray(ours), naive, rtol=1e-5)


def test_topk_accuracy():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = jnp.asarray([1, 2])
    top1, top2 = topk_accuracy(logits, labels, ks=(1, 2))
    assert float(top1) == 50.0
    assert float(top2) == 50.0


def test_infonce_labels_local():
    assert np.array_equal(np.asarray(infonce_labels(4)), np.arange(4))
