"""Text-embedding visualization tool.

Rebuilds prototype/tools/text_visualize.py: embed a list of texts with a
trained checkpoint and write a 2-D projection (PCA — dependency-free) plus
the pairwise cosine-similarity matrix for inspection.

    python -m declip_tpu.tools.text_visualize --config <exp>/config.yaml \
        --texts "a cat,a dog,a car" --out text_viz.json
"""

from __future__ import annotations

import argparse
import json

import jax.numpy as jnp
import numpy as np

from declip_tpu.tokenizer import get_tokenizer
from declip_tpu.tools._common import load_eval_model


def pca_2d(x: np.ndarray) -> np.ndarray:
    x = x - x.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:2].T


def main(argv=None):
    from declip_tpu.parallel.mesh import apply_platform_override

    apply_platform_override()  # DECLIP_PLATFORM=cpu runs off-TPU
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--texts", required=True, help="comma-separated texts")
    ap.add_argument("--out", default="text_viz.json")
    args = ap.parse_args(argv)

    import jax

    model, variables = load_eval_model(args.config)
    texts = [t.strip() for t in args.texts.split(",")]
    tok = get_tokenizer()
    emb = jax.jit(lambda t: model.apply(
        {"params": variables["params"]}, t, method="encode_text"))(
        jnp.asarray(tok.tokenize(texts)))
    emb = np.asarray(emb / jnp.linalg.norm(emb, axis=-1, keepdims=True))

    coords = pca_2d(emb)
    sim = emb @ emb.T
    with open(args.out, "w") as f:
        json.dump({
            "texts": texts,
            "pca_2d": coords.round(5).tolist(),
            "cosine_similarity": sim.round(5).tolist(),
        }, f, indent=2)
    print(f"wrote {args.out}")
    for i, t in enumerate(texts):
        nearest = int(np.argsort(-sim[i])[1]) if len(texts) > 1 else i
        print(f"  {t!r} -> nearest: {texts[nearest]!r} "
              f"({sim[i, nearest]:.3f})")


if __name__ == "__main__":
    main()
