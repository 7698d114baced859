"""Linear-probe evaluation: train a linear classifier on frozen tower
features.

The reference framework is a general image-classification stack at heart
(setup.py:1-27 'Spring-Prototype — Distributed General Image Classification
Framework'); its LINEAR augmentation preset (imagenet_dataloader.py:100-106)
exists for exactly this protocol. This tool implements it the JAX way: embed
the dataset once with the frozen tower, then closed-form-ish logistic
regression (L-BFGS-free, plain AdamW on the linear head, all on device).

    python -m declip_tpu.tools.linear_probe --config <exp>/config.yaml \
        --meta train.txt --val-meta val.txt --root /data --epochs 10
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from declip_tpu.data.dataset import ImageNetDataset
from declip_tpu.data.transforms import build_common_augmentation
from declip_tpu.tools._common import load_eval_model


def embed_dataset(model, variables, dataset, batch_size: int = 128):
    encode = jax.jit(lambda imgs: model.apply(
        variables, imgs, train=False, method="encode_image"))
    feats, labels = [], []
    n = len(dataset)
    for beg in range(0, n, batch_size):
        items = [dataset[i] for i in range(beg, min(beg + batch_size, n))]
        imgs = np.stack([it["image"] for it in items])
        valid = imgs.shape[0]
        if valid < batch_size:
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[-1:], batch_size - valid, 0)])
        e = np.asarray(encode(jnp.asarray(imgs)))[:valid]
        feats.append(e)
        labels.extend(it["label"] for it in items)
    return np.concatenate(feats), np.asarray(labels, np.int32)


def train_probe(train_x, train_y, val_x, val_y, *, epochs=10, lr=1e-3,
                batch_size=1024, seed=0):
    n_class = int(train_y.max()) + 1
    d = train_x.shape[1]
    params = {"w": jnp.zeros((d, n_class)), "b": jnp.zeros((n_class,))}
    tx = optax.adamw(lr, weight_decay=1e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, y):
        def loss_fn(p):
            logits = x @ p["w"] + p["b"]
            logp = jax.nn.log_softmax(logits)
            return -logp[jnp.arange(x.shape[0]), y].mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    rng = np.random.default_rng(seed)
    n = train_x.shape[0]
    batch_size = min(batch_size, n)  # small probes must still take steps
    for epoch in range(epochs):
        order = rng.permutation(n)
        for beg in range(0, n, batch_size):
            idx = order[beg:beg + batch_size]
            if len(idx) < batch_size:  # pad tail to the jitted shape
                idx = np.concatenate([idx, order[:batch_size - len(idx)]])
            params, opt, loss = step(
                params, opt, jnp.asarray(train_x[idx]),
                jnp.asarray(train_y[idx]))
    logits = np.asarray(val_x @ np.asarray(params["w"]) +
                        np.asarray(params["b"]))
    top1 = 100.0 * (logits.argmax(-1) == val_y).mean()
    return params, float(top1)


def main(argv=None):
    from declip_tpu.parallel.mesh import apply_platform_override

    apply_platform_override()  # DECLIP_PLATFORM=cpu runs off-TPU
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--meta", required=True)
    ap.add_argument("--val-meta", required=True)
    ap.add_argument("--root", default="")
    ap.add_argument("--read-from", default="fs")
    ap.add_argument("--epochs", type=int, default=10)
    args = ap.parse_args(argv)

    model, variables = load_eval_model(args.config)
    aug = build_common_augmentation("ONECROP")
    train_ds = ImageNetDataset(args.root, args.meta, transform=aug,
                               read_from=args.read_from)
    val_ds = ImageNetDataset(args.root, args.val_meta, transform=aug,
                             read_from=args.read_from)
    tx_x, tx_y = embed_dataset(model, variables, train_ds)
    vx, vy = embed_dataset(model, variables, val_ds)
    _, top1 = train_probe(tx_x, tx_y, vx, vy, epochs=args.epochs)
    print(json.dumps({"linear_probe_top1": round(top1, 2),
                      "n_train": len(tx_y), "n_val": len(vy)}))


if __name__ == "__main__":
    main()
