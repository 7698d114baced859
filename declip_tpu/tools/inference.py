"""Custom-image inference tool.

Rebuilds prototype/tools/inference.py (custom image-dir inference through a
trained checkpoint; the reference version is bit-rotted — imports a
non-existent cls_solver). Usage:

    python -m declip_tpu.tools.inference --config <exp>/config.yaml \
        --image_dir /path/to/images --classes "cat,dog,car" [--saliency]

Outputs per-image class probabilities (zero-shot, prompt-ensemble) as JSONL,
plus optional gradient-based saliency maps (the JAX analogue of the
reference's GradCAM hooks) saved as .npy.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from declip_tpu.data.transforms import build_common_augmentation
from declip_tpu.data.dataset import pil_loader
from declip_tpu.tokenizer import get_tokenizer
from declip_tpu.tools._common import load_eval_model


def main(argv=None):
    from declip_tpu.parallel.mesh import apply_platform_override

    apply_platform_override()  # DECLIP_PLATFORM=cpu runs off-TPU
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--classes", required=True,
                    help="comma-separated class names")
    ap.add_argument("--out", default="inference_results.jsonl")
    ap.add_argument("--saliency", action="store_true")
    args = ap.parse_args(argv)

    model, variables = load_eval_model(args.config)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    classes = [c.strip() for c in args.classes.split(",")]

    # prompt-ensemble class embeddings (same protocol as zero-shot eval)
    tok = get_tokenizer()
    texts = []
    for c in classes:
        texts.extend([f"a photo of a {c}.", f"a photo of the {c}."])
    per = len(texts) // len(classes)
    emb = jax.jit(lambda t: model.apply(
        {"params": params}, t, method="encode_text"))(
        jnp.asarray(tok.tokenize(texts)))
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    class_emb = emb.reshape(len(classes), per, -1).mean(axis=1)
    class_emb = class_emb / jnp.linalg.norm(class_emb, axis=-1, keepdims=True)

    transform = build_common_augmentation("ONECROP")
    paths = sorted(
        p for p in glob.glob(os.path.join(args.image_dir, "*"))
        if p.lower().endswith((".jpg", ".jpeg", ".png", ".bmp", ".webp"))
    )

    def encode(params, img):
        v = {"params": params}
        if batch_stats:
            v["batch_stats"] = batch_stats
        e = model.apply(v, img, train=False, method="encode_image")
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

    encode_j = jax.jit(encode)
    # saliency: one jitted grad fn reused for every image (class selected
    # via one-hot weighting, not a per-image python closure)
    saliency_j = jax.jit(jax.grad(
        lambda im, onehot: ((encode(params, im) @ class_emb.T)[0] * onehot
                            ).sum()))

    with open(args.out, "w") as f:
        for path in paths:
            with open(path, "rb") as imf:
                img = transform(pil_loader(imf.read()))[None]
            e = encode_j(params, jnp.asarray(img))
            logits = (e @ class_emb.T)[0]
            probs = np.asarray(jax.nn.softmax(100.0 * logits))
            rec = {
                "filename": os.path.basename(path),
                "prediction": classes[int(probs.argmax())],
                "probs": {c: round(float(p), 6)
                          for c, p in zip(classes, probs)},
            }
            if args.saliency:
                # gradient of the top-class similarity wrt input pixels
                top = int(probs.argmax())
                onehot = jnp.zeros((len(classes),)).at[top].set(1.0)
                g = saliency_j(jnp.asarray(img), onehot)
                sal = np.abs(np.asarray(g))[0].max(-1)
                sal_path = path + ".saliency.npy"
                np.save(sal_path, sal)
                rec["saliency"] = sal_path
            f.write(json.dumps(rec) + "\n")
            print(rec["filename"], "->", rec["prediction"])
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
