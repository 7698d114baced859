"""Production serving host: dynamic-batching HTTP inference for CLIP towers.

The reference's deploy story ended at an export boundary — tools/convert.py
(/root/reference/prototype/tools/convert.py:31-60) handed the model to
SenseTime's proprietary kestrel/NNIE serving stack, which lives off-tree.
This module is the TPU-era serving host itself, designed around XLA's
execution model rather than a kernel-per-request runtime:

- **static shapes, bounded program set**: requests are coalesced and padded
  to power-of-two batch buckets, so each tower compiles at most
  ``log2(max_batch)+1`` programs (first hit per bucket compiles — slow via a
  remote tunnel, instant after — and steady state is pure cache hits);
- **dynamic batching**: HTTP handler threads only enqueue; a single compute
  thread drains the queue (up to ``--max-batch`` rows, waiting at most
  ``--max-wait-ms`` to coalesce), which also keeps ALL device interaction
  single-threaded — concurrent transfers from many threads deadlock some
  transports (see CLAUDE.md);
- **model sources**: a live experiment config (newest checkpoint, optional
  ``--int8`` dynamic-quantized Dense path via ops/quant.py) or a directory
  of self-contained StableHLO artifacts from ``tools/convert.py
  --export-serving`` — the latter runs on any CPU/TPU server with no model
  code or checkpoint present;
- **params as arguments, not closures**: the live-model path passes
  variables to the jitted tower fns instead of closing over them, so the
  serialized program stays small (constant-folding GBs of weights into the
  program breaks remote-compile transports).

Endpoints (JSON over HTTP, stdlib server — no framework dependency):

- ``POST /v1/encode_text``  ``{"texts": [...]}`` or ``{"tokens": [[...]]}``
- ``POST /v1/encode_image`` ``{"arrays": [[[...]]]}`` (preprocessed
  ``[H, W, 3]`` float rows) or ``{"images_b64": [...]}`` (encoded image
  files; decoded + ONECROP-preprocessed server-side)
- both accept ``"normalize": true`` for unit-norm embeddings
- ``GET /healthz``, ``GET /stats``

Usage::

    python -m declip_tpu.tools.serve --config experiments/.../config.yaml
    python -m declip_tpu.tools.serve --stablehlo /path/to/export_dir
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, Optional

import numpy as np

__all__ = ["Batcher", "ServingHost", "main"]


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class _Item:
    __slots__ = ("rows", "event", "result", "error", "t_enq")

    def __init__(self, rows: np.ndarray):
        self.rows = rows
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[Exception] = None
        self.t_enq = time.perf_counter()


class Batcher:
    """Coalesce per-request rows into bucketed batches on one compute thread.

    ``runners`` maps a kind ("image"/"text") to a callable taking a padded
    ``[bucket, ...]`` array and returning ``[bucket, dim]`` embeddings.
    """

    def __init__(self, runners: Dict[str, Callable[[np.ndarray], np.ndarray]],
                 max_batch: int = 64, max_wait_ms: float = 5.0):
        self.runners = runners
        self.max_batch = int(max_batch)
        self.max_wait = float(max_wait_ms) / 1e3
        self._cond = threading.Condition()
        self._queues: Dict[str, deque] = {k: deque() for k in runners}
        self._stop = threading.Event()
        self.stats = {
            "requests": 0, "rows": 0, "batches": 0, "padded_rows": 0,
            "errors": 0,
        }
        self._lat: deque = deque(maxlen=512)  # seconds, per request

    # ---- request side (any thread) ----

    def submit(self, kind: str, rows: np.ndarray,
               timeout: float = 120.0) -> np.ndarray:
        if kind not in self._queues:
            raise KeyError(f"no runner for kind {kind!r}")
        n = int(rows.shape[0])
        if n < 1:
            raise ValueError("empty request")
        if n > self.max_batch:
            raise ValueError(
                f"request rows {n} > max_batch {self.max_batch}; split it")
        item = _Item(rows)
        with self._cond:
            self._queues[kind].append(item)
            self.stats["requests"] += 1
            self.stats["rows"] += n
            self._cond.notify_all()
        if not item.event.wait(timeout):
            raise TimeoutError(f"inference timed out after {timeout}s")
        self._lat.append(time.perf_counter() - item.t_enq)
        if item.error is not None:
            raise item.error
        return item.result

    # ---- compute side (single thread) ----

    def run_forever(self, stop: Optional[threading.Event] = None) -> None:
        stop = stop or self._stop
        while not stop.is_set():
            batch = self._collect(stop)
            if batch is None:
                continue
            kind, items = batch
            self._execute(kind, items)
        # drain: fail anything still queued so submitters unblock
        with self._cond:
            leftovers = [(k, i) for k, q in self._queues.items() for i in q]
            for q in self._queues.values():
                q.clear()
        for _, item in leftovers:
            item.error = RuntimeError("server shutting down")
            item.event.set()

    def shutdown(self) -> None:
        self._stop.set()
        with self._cond:
            self._cond.notify_all()

    def _collect(self, stop: threading.Event):
        """Wait for work, then give later arrivals max_wait to coalesce."""
        with self._cond:
            while not any(self._queues.values()):
                if stop.is_set():
                    return None
                self._cond.wait(0.05)
            deadline = time.perf_counter() + self.max_wait
            while True:
                kind = max(self._queues,
                           key=lambda k: sum(i.rows.shape[0]
                                             for i in self._queues[k]))
                pending = sum(i.rows.shape[0] for i in self._queues[kind])
                remaining = deadline - time.perf_counter()
                if pending >= self.max_batch or remaining <= 0:
                    break
                self._cond.wait(remaining)
            items, total = [], 0
            q = self._queues[kind]
            while q and total + q[0].rows.shape[0] <= self.max_batch:
                item = q.popleft()
                items.append(item)
                total += item.rows.shape[0]
            return kind, items

    def _execute(self, kind: str, items) -> None:
        rows = np.concatenate([i.rows for i in items], axis=0)
        n = rows.shape[0]
        b = _bucket(n, self.max_batch)
        if b > n:
            pad = np.zeros((b - n,) + rows.shape[1:], rows.dtype)
            rows = np.concatenate([rows, pad], axis=0)
        try:
            out = np.asarray(self.runners[kind](rows))[:n]
        except Exception as e:  # noqa: BLE001 — fail the batch, keep serving
            self.stats["errors"] += len(items)
            for item in items:
                item.error = e
                item.event.set()
            return
        self.stats["batches"] += 1
        self.stats["padded_rows"] += b - n
        off = 0
        for item in items:
            k = item.rows.shape[0]
            item.result = out[off:off + k]
            off += k
            item.event.set()

    def latency_ms(self) -> Dict[str, float]:
        if not self._lat:
            return {"p50": 0.0, "p95": 0.0}
        arr = np.sort(np.asarray(self._lat))
        return {"p50": round(float(arr[len(arr) // 2]) * 1e3, 2),
                "p95": round(float(arr[int(len(arr) * 0.95) - 1]) * 1e3, 2)}


class ServingHost:
    """Batcher + preprocessing + HTTP front end over one model."""

    def __init__(self, runners: Dict[str, Callable], tokenizer=None,
                 preprocess=None, max_batch: int = 64,
                 max_wait_ms: float = 5.0, meta: Optional[dict] = None):
        self.batcher = Batcher(runners, max_batch, max_wait_ms)
        self.tokenizer = tokenizer
        self.preprocess = preprocess  # PIL.Image -> [H, W, 3] float array
        self.meta = dict(meta or {})
        self._httpd: Optional[ThreadingHTTPServer] = None

    # ---- constructors ----

    @classmethod
    def from_config(cls, config_path: str, int8: bool = False,
                    bpe_path: Optional[str] = None, **kw) -> "ServingHost":
        """Serve the live flax model from an experiment's newest checkpoint."""
        import jax

        from declip_tpu.data.transforms import build_common_augmentation
        from declip_tpu.tokenizer import get_tokenizer
        from declip_tpu.tools._common import load_eval_model

        model, variables = load_eval_model(config_path)
        variables = jax.device_put(variables)  # resident once, passed as arg

        def image_fn(v, x):
            return model.apply(v, x, train=False, method="encode_image")

        def text_fn(v, t):
            return model.apply(v, t, method="encode_text")

        if int8:
            from declip_tpu.ops.quant import int8_jit
            jit = int8_jit
        else:
            jit = jax.jit
        image_j, text_j = jit(image_fn), jit(text_fn)
        runners = {
            "image": lambda rows: image_j(
                variables, rows.astype(np.float32)),
            "text": lambda rows: text_j(variables, rows.astype(np.int32)),
        }
        res = getattr(model.visual, "input_resolution", 224)
        onecrop = {224: "ONECROP", 256: "ONECROP256",
                   384: "ONECROP384"}.get(res)
        preprocess = (build_common_augmentation(onecrop)
                      if onecrop else None)
        return cls(runners, tokenizer=get_tokenizer(bpe_path),
                   preprocess=preprocess,
                   meta={"source": config_path, "int8": int8,
                         "input_resolution": res}, **kw)

    @classmethod
    def from_stablehlo(cls, artifact_dir: str,
                       bpe_path: Optional[str] = None, **kw) -> "ServingHost":
        """Serve self-contained StableHLO artifacts (no model code needed)."""
        import jax
        from jax import export as jexport

        from declip_tpu.data.transforms import build_common_augmentation
        from declip_tpu.tokenizer import get_tokenizer

        runners: Dict[str, Callable] = {}
        res = 224
        for kind, fname in (("image", "encode_image.stablehlo"),
                            ("text", "encode_text.stablehlo")):
            path = os.path.join(artifact_dir, fname)
            if not os.path.exists(path):
                continue
            with open(path, "rb") as f:
                exp = jexport.deserialize(f.read())
            # jit wrapper: one compile per bucket shape, cached thereafter
            call = jax.jit(exp.call)
            spec = exp.in_avals[0]
            dtype = np.dtype(spec.dtype)
            if kind == "image" and isinstance(spec.shape[1], int):
                res = int(spec.shape[1])
            runners[kind] = (
                lambda rows, call=call, dtype=dtype:
                call(rows.astype(dtype)))
        if not runners:
            raise FileNotFoundError(
                f"no encode_image/encode_text .stablehlo under "
                f"{artifact_dir!r}")
        onecrop = {224: "ONECROP", 256: "ONECROP256",
                   384: "ONECROP384"}.get(res)
        return cls(runners, tokenizer=get_tokenizer(bpe_path),
                   preprocess=(build_common_augmentation(onecrop)
                               if onecrop else None),
                   meta={"source": artifact_dir,
                         "input_resolution": res}, **kw)

    # ---- request handling (called from HTTP handler threads) ----

    def encode_text(self, body: dict) -> dict:
        if "tokens" in body:
            toks = np.asarray(body["tokens"], np.int32)
            if toks.ndim != 2:
                raise ValueError("'tokens' must be [n, context] ints")
        elif "texts" in body:
            if self.tokenizer is None:
                raise ValueError("no tokenizer on this host; send 'tokens'")
            texts = list(body["texts"])
            if not texts:
                raise ValueError("'texts' is empty")
            toks = np.asarray(self.tokenizer.tokenize(texts), np.int32)
        else:
            raise ValueError("need 'texts' or 'tokens'")
        emb = self.batcher.submit("text", toks)
        return self._emit(emb, body)

    def encode_image(self, body: dict) -> dict:
        if "arrays" in body:
            rows = np.asarray(body["arrays"], np.float32)
            if rows.ndim == 3:
                rows = rows[None]
            if rows.ndim != 4 or rows.shape[-1] != 3:
                raise ValueError("'arrays' must be [n, H, W, 3] floats")
        elif "images_b64" in body:
            if self.preprocess is None:
                raise ValueError(
                    "no preprocess pipeline on this host; send 'arrays'")
            from PIL import Image
            imgs = []
            for b64 in body["images_b64"]:
                img = Image.open(
                    io.BytesIO(base64.b64decode(b64))).convert("RGB")
                imgs.append(np.asarray(self.preprocess(img), np.float32))
            if not imgs:
                raise ValueError("'images_b64' is empty")
            rows = np.stack(imgs)
        else:
            raise ValueError("need 'arrays' or 'images_b64'")
        emb = self.batcher.submit("image", rows)
        return self._emit(emb, body)

    @staticmethod
    def _emit(emb: np.ndarray, body: dict) -> dict:
        emb = np.asarray(emb, np.float32)
        if body.get("normalize"):
            emb = emb / np.maximum(
                np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return {"embeddings": emb.tolist(), "dim": int(emb.shape[-1]),
                "batch": int(emb.shape[0])}

    def stats(self) -> dict:
        s = dict(self.batcher.stats)
        s["latency_ms"] = self.batcher.latency_ms()
        if s["batches"]:
            s["mean_rows_per_batch"] = round(s["rows"] / s["batches"], 2)
        s.update(self.meta)
        return s

    # ---- server lifecycle ----

    def start_http(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Start the HTTP front end on a daemon thread; returns the port."""
        self._httpd = ThreadingHTTPServer((host, port), _make_handler(self))
        self._httpd.daemon_threads = True
        threading.Thread(target=self._httpd.serve_forever,
                         daemon=True).start()
        return self._httpd.server_address[1]

    def serve_forever(self) -> None:
        """Run the compute loop on the CALLING thread (keep it the main
        thread in production — see module docstring)."""
        try:
            self.batcher.run_forever()
        except KeyboardInterrupt:
            pass
        finally:
            self.shutdown()

    def shutdown(self) -> None:
        self.batcher.shutdown()
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd = None


def _make_handler(hostobj: ServingHost):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet; /stats has the counters
            pass

        def _reply(self, code: int, payload: dict):
            blob = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            if self.path == "/healthz":
                import jax
                self._reply(200, {"ok": True,
                                  "backend": jax.default_backend(),
                                  "kinds": sorted(hostobj.batcher.runners)})
            elif self.path == "/stats":
                self._reply(200, hostobj.stats())
            else:
                self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/v1/encode_text":
                    self._reply(200, hostobj.encode_text(body))
                elif self.path == "/v1/encode_image":
                    self._reply(200, hostobj.encode_image(body))
                else:
                    self._reply(404, {"error": f"no route {self.path}"})
            except (ValueError, KeyError) as e:
                self._reply(400, {"error": str(e)})
            except TimeoutError as e:
                self._reply(503, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — report, keep serving
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main(argv=None):
    from declip_tpu.parallel.mesh import apply_platform_override
    apply_platform_override()  # DECLIP_PLATFORM=cpu serves on CPU hosts

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--config", help="experiment config (live model)")
    src.add_argument("--stablehlo",
                     help="directory from convert.py --export-serving")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--int8", action="store_true",
                    help="dynamic-int8 Dense path (live model only)")
    ap.add_argument("--bpe", default=os.environ.get("DECLIP_BPE_PATH"),
                    help="BPE merges for server-side tokenization")
    args = ap.parse_args(argv)

    kw = {"max_batch": args.max_batch, "max_wait_ms": args.max_wait_ms}
    if args.config:
        host = ServingHost.from_config(args.config, int8=args.int8,
                                       bpe_path=args.bpe, **kw)
    else:
        if args.int8:
            ap.error("--int8 applies to --config; quantized artifacts come "
                     "from convert.py --export-serving --quantize int8")
        host = ServingHost.from_stablehlo(args.stablehlo,
                                          bpe_path=args.bpe, **kw)
    port = host.start_http(args.host, args.port)
    print(f"serving on {args.host}:{port}  "
          f"(kinds: {sorted(host.batcher.runners)})", flush=True)
    host.serve_forever()


if __name__ == "__main__":
    main()
