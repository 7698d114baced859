"""Checkpoint conversion tool (reference <-> declip_tpu).

Replaces prototype/tools/convert.py's role as the deployment/interop exit
point (its Caffe/Kestrel/NNIE targets are SenseTime-internal; the portable
interop format is the reference's own .pth.tar, SURVEY.md §2.9).

    # import a reference checkpoint into a declip_tpu experiment
    python -m declip_tpu.tools.convert --from_pth ckpt.pth.tar \
        --config <exp>/config.yaml --out <exp>/checkpoints/ckpt.msgpack

    # export our checkpoint to a torch-loadable .pth.tar
    python -m declip_tpu.tools.convert --to_pth <exp>/checkpoints/ckpt.msgpack \
        --config <exp>/config.yaml --out ckpt.pth.tar

    # export the serving towers as portable StableHLO artifacts
    python -m declip_tpu.tools.convert --export-serving \
        --config <exp>/config.yaml --out <exp>/serving/

The serving export is the TPU-era replacement for the reference's
spring.nart Caffe/NNIE/Kestrel deploy targets
(/root/reference/prototype/tools/convert.py:31-60, SenseTime-internal):
``encode_image.stablehlo`` / ``encode_text.stablehlo`` are self-contained
(weights baked as constants), reload on any machine with
``jax.export.deserialize(blob).call(x)`` — no declip_tpu install needed —
and compile for CPU or TPU servers. The batch dimension is exported
symbolically unless ``--serving-batch N`` pins it.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def variables_to_torch_state(variables) -> dict:
    """Inverse of convert_pth.torch_state_to_variables: flatten our tree into
    reference-named torch tensors (scan-stacked layers unstacked)."""
    import re

    import torch

    out = {}

    def emit(key: str, arr: np.ndarray):
        out[key] = torch.tensor(np.asarray(arr))

    def walk(tree, prefix, collection):
        for name, sub in tree.items():
            path = f"{prefix}.{name}" if prefix else name
            if isinstance(sub, dict):
                walk(sub, path, collection)
                continue
            arr = np.asarray(sub)
            key = path
            key = key.replace("text.", "encode_text.", 1) if key.startswith(
                "text.") else key
            key = re.sub(r"\blayer(\d)_(\d+)\b", r"layer\1.\2", key)
            key = key.replace(".downsample_conv.", ".downsample.0.")
            key = key.replace(".downsample_bn.", ".downsample.1.")
            key = key.replace(".LayerNorm_0.scale", ".weight")
            key = key.replace(".LayerNorm_0.bias", ".bias")
            if collection == "batch_stats":
                key = key.replace(".BatchNorm_0.mean", ".running_mean")
                key = key.replace(".BatchNorm_0.var", ".running_var")
            else:
                key = key.replace(".BatchNorm_0.scale", ".weight")
                key = key.replace(".BatchNorm_0.bias", ".bias")
            key = key.replace(".token_embedding.embedding",
                              ".token_embedding.weight")

            if ".patch_embed.kernel" in key:
                # dense [p*p*3, W] -> conv [W, 3, p, p]
                w = arr
                p = int(round((w.shape[0] / 3) ** 0.5))
                conv = w.reshape(p, p, 3, w.shape[1]).transpose(3, 2, 0, 1)
                emit(key.replace(".patch_embed.kernel", ".conv1.weight"), conv)
                continue

            if "transformer.layers." in key:
                # stacked [L, ...]: unstack into resblocks.{i}
                m = re.search(r"transformer\.layers\.(.*)$", key)
                tail = m.group(1)
                base = key[: m.start()] + "transformer.resblocks"
                for i in range(arr.shape[0]):
                    a = arr[i]
                    k = f"{base}.{i}.{tail}"
                    # flax path is attn.qkv/attn.out — replace the full
                    # segment so we don't emit doubled 'attn.attn.*' keys
                    k = k.replace(".attn.qkv.kernel", ".attn.in_proj_weight")
                    k = k.replace(".attn.qkv.bias", ".attn.in_proj_bias")
                    k = k.replace(".attn.out.kernel", ".attn.out_proj.weight")
                    k = k.replace(".attn.out.bias", ".attn.out_proj.bias")
                    if k.endswith("kernel"):
                        emit(k.replace(".kernel", ".weight"),
                             a.T if a.ndim == 2 else a)
                    elif ".in_proj_weight" in k or ".out_proj.weight" in k:
                        emit(k, a.T)
                    else:
                        emit(k, a)
                continue

            if key.endswith(".kernel"):
                base = key[: -len(".kernel")]
                if arr.ndim == 4:  # conv HWIO -> OIHW
                    emit(base + ".weight", arr.transpose(3, 2, 0, 1))
                else:
                    emit(base + ".weight", arr.T)
            else:
                emit(key, arr)

    walk(variables.get("params", {}), "", "params")
    walk(variables.get("batch_stats", {}), "", "batch_stats")
    return out


def export_serving(config_path: str, out_dir: str, batch: int = 0,
                   quantize: str = ""):
    """Serialize encode_image / encode_text as StableHLO (jax.export).

    Uses the experiment's newest checkpoint (random init if none). Returns
    the list of files written. batch=0 exports a symbolic batch dim.
    quantize="int8" bakes the dynamic-int8 Dense path (ops/quant.py) into
    the exported graph — the TPU-era NNIE-INT8 analogue (the reference
    quantized at the spring.nart export boundary too, convert.py:31-60)."""
    import contextlib
    import os

    import jax.numpy as jnp
    from jax import export as jexport

    from declip_tpu.tools._common import load_eval_model

    if quantize not in ("", "int8"):
        raise ValueError(f"unknown --quantize {quantize!r} (only 'int8')")
    model, variables = load_eval_model(config_path)
    # portability: pin the XLA attention path for export — 'auto' picks the
    # Pallas kernel for long sequences on a TPU exporting host, and its
    # custom-call lowering is platform-specific, which would silently
    # downgrade the artifact from ("cpu","tpu") to the exporting platform
    updates = {
        tower: sub.clone(attn_impl="xla")
        for tower in ("visual", "text")
        for sub in [getattr(model, tower)]
        if getattr(sub, "attn_impl", "xla") != "xla"
    }
    if updates:
        model = model.clone(**updates)
    res = getattr(model.visual, "input_resolution", 224)
    if batch:
        b = batch
    else:
        (b,) = jexport.symbolic_shape("b")
    img_spec = jax.ShapeDtypeStruct((b, res, res, 3), jnp.float32)
    tok_spec = jax.ShapeDtypeStruct((b, 77), jnp.int32)

    def encode_image(img):
        return model.apply(variables, img, train=False,
                           method="encode_image")

    def encode_text(tokens):
        return model.apply(variables, tokens, method="encode_text")

    os.makedirs(out_dir, exist_ok=True)
    written = []
    if quantize == "int8":
        from declip_tpu.ops.quant import int8_inference
        quant_ctx = int8_inference
    else:
        quant_ctx = contextlib.nullcontext
    for name, fn, spec in (("encode_image", encode_image, img_spec),
                           ("encode_text", encode_text, tok_spec)):
        with quant_ctx():  # interception happens at trace/export time
            try:
                exp = jexport.export(
                    jax.jit(fn), platforms=("cpu", "tpu"))(spec)
            except Exception:
                # some lowerings are platform-specific; fall back to the
                # exporting platform only
                exp = jexport.export(jax.jit(fn))(spec)
        path = os.path.join(out_dir, f"{name}.stablehlo")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        written.append(path)
    return written


def main(argv=None):
    from declip_tpu.parallel.mesh import apply_platform_override

    apply_platform_override()  # DECLIP_PLATFORM=cpu runs off-TPU
    ap = argparse.ArgumentParser()
    ap.add_argument("--from_pth")
    ap.add_argument("--to_pth")
    ap.add_argument("--export-serving", action="store_true")
    ap.add_argument("--serving-batch", type=int, default=0,
                    help="pin the serving batch dim (default: symbolic)")
    ap.add_argument("--quantize", default="",
                    help="'int8': export with dynamic-int8 Dense matmuls "
                         "(ops/quant.py; ~2x MXU rate on v5e)")
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    if args.export_serving:
        for path in export_serving(args.config, args.out,
                                   args.serving_batch, args.quantize):
            print(f"exported {path}")
        return

    if args.from_pth:
        import flax.serialization as ser

        from declip_tpu.convert_pth import load_pth

        variables = load_pth(args.from_pth)
        with open(args.out, "wb") as f:
            f.write(ser.to_bytes(variables))
        print(f"converted {args.from_pth} -> {args.out}")
    elif args.to_pth:
        import torch
        from flax import serialization as ser

        with open(args.to_pth, "rb") as f:
            blob = f.read()
        state = ser.msgpack_restore(blob)
        variables = {
            "params": state.get("params", state),
            "batch_stats": state.get("batch_stats", {}),
        }
        torch_state = variables_to_torch_state(variables)
        torch.save({"model": torch_state,
                    "last_iter": int(np.asarray(state.get("step", 0)))},
                   args.out)
        print(f"converted {args.to_pth} -> {args.out}")
    else:
        ap.error("one of --from_pth / --to_pth is required")


if __name__ == "__main__":
    main()
