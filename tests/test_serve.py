"""Serving host: dynamic batching, bucketing, HTTP API, artifact serving.

The reference deployed through SenseTime's off-tree kestrel/NNIE stack
(/root/reference/prototype/tools/convert.py:31-60); declip_tpu/tools/serve.py
is the in-tree TPU-era serving host. These tests drive it end-to-end over
real HTTP on a tiny CLIP (32px towers) on CPU.
"""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
import jax
import jax.numpy as jnp

RES = 32


def _tiny_model():
    from declip_tpu.models import model_entry
    from declip_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(None)
    model = model_entry({
        "type": "clip_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": 32, "input_resolution": RES,
                             "patch_size": 8, "width": 64, "layers": 2,
                             "heads": 2, "freeze_conv1": False},
            "text_encode": {"embed_dim": 32, "transformer_width": 64,
                            "transformer_heads": 2, "transformer_layers": 2,
                            "vocab_size": tok.vocab_size},
            "clip": {"use_allgather": False},
        },
    })
    batch = {"images": jnp.zeros((1, RES, RES, 3), jnp.float32),
             "tokens": jnp.ones((1, 77), jnp.int32)}
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, train=True))()
    return model, {"params": variables["params"]}, tok


@pytest.fixture(scope="module")
def served():
    """(base_url, host, model, variables, tok) with the compute loop on a
    background thread (CPU backend — no transport constraint in tests)."""
    from declip_tpu.tools.serve import ServingHost

    model, variables, tok = _tiny_model()
    image_j = jax.jit(lambda v, x: model.apply(v, x, train=False,
                                               method="encode_image"))
    text_j = jax.jit(lambda v, t: model.apply(v, t, method="encode_text"))
    host = ServingHost(
        {"image": lambda r: image_j(variables, r.astype(np.float32)),
         "text": lambda r: text_j(variables, r.astype(np.int32))},
        tokenizer=tok, max_batch=8, max_wait_ms=30.0)
    stop = threading.Event()
    t = threading.Thread(target=host.batcher.run_forever, args=(stop,),
                         daemon=True)
    t.start()
    port = host.start_http("127.0.0.1", 0)
    yield f"http://127.0.0.1:{port}", host, model, variables, tok
    stop.set()
    host.shutdown()
    t.join(timeout=10)


def _post(url, path, payload):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_encode_text_matches_direct(served):
    url, host, model, variables, tok = served
    texts = ["a red square", "a photo of a blue circle", "hello"]
    status, out = _post(url, "/v1/encode_text", {"texts": texts})
    assert status == 200
    got = np.asarray(out["embeddings"], np.float32)
    want = np.asarray(model.apply(
        variables, jnp.asarray(tok.tokenize(texts)), method="encode_text"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert out["dim"] == want.shape[-1] and out["batch"] == 3


def test_encode_image_bucket_padding_is_invisible(served):
    """3 rows pad to the 4-bucket; results must equal the unpadded compute."""
    url, host, model, variables, _ = served
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(3, RES, RES, 3)).astype(np.float32)
    status, out = _post(url, "/v1/encode_image",
                        {"arrays": imgs.tolist(), "normalize": True})
    assert status == 200
    got = np.asarray(out["embeddings"], np.float32)
    want = np.asarray(model.apply(variables, jnp.asarray(imgs), train=False,
                                  method="encode_image"))
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert np.allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


def test_concurrent_requests_all_answered_and_coalesced(served):
    url, host, model, variables, tok = served
    texts = [f"prompt number {i}" for i in range(6)]
    results = {}
    errs = []

    def one(i):
        try:
            status, out = _post(url, "/v1/encode_text",
                                {"texts": [texts[i]]})
            assert status == 200, out
            results[i] = np.asarray(out["embeddings"][0], np.float32)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    b0 = host.batcher.stats["batches"]
    threads = [threading.Thread(target=one, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs and len(results) == 6
    want = np.asarray(model.apply(variables, jnp.asarray(tok.tokenize(texts)),
                                  method="encode_text"))
    for i in range(6):
        np.testing.assert_allclose(results[i], want[i], rtol=1e-4, atol=1e-5)
    # 6 one-row requests must not have taken 6 full batches (30ms window)
    assert host.batcher.stats["batches"] - b0 < 6


def test_health_stats_and_errors(served):
    url, host, *_ = served
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["ok"] and set(h["kinds"]) == {"image", "text"}
    with urllib.request.urlopen(url + "/stats", timeout=30) as r:
        s = json.loads(r.read())
    assert s["requests"] >= 1 and "latency_ms" in s

    status, out = _post(url, "/v1/encode_text", {})
    assert status == 400 and "error" in out
    status, out = _post(url, "/v1/encode_text",
                        {"texts": [f"t{i}" for i in range(9)]})  # > max_batch
    assert status == 400 and "max_batch" in out["error"]
    status, _ = _post(url, "/v1/nope", {})
    assert status == 404


def test_images_b64_preprocessing_path(served):
    """JPEG-style payload: decoded + preprocessed server-side (tiny host has
    no ONECROP for 32px, so attach one matching the tower resolution)."""
    url, host, model, variables, _ = served
    PIL = pytest.importorskip("PIL.Image")
    from declip_tpu.data.transforms import (CenterCrop, Compose, Resize,
                                            to_normalized_array)
    host.preprocess = Compose([Resize(RES + 4), CenterCrop(RES),
                               to_normalized_array])
    rgb = (np.random.default_rng(1).uniform(
        0, 255, (48, 40, 3))).astype(np.uint8)
    buf = io.BytesIO()
    PIL.fromarray(rgb).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    status, out = _post(url, "/v1/encode_image", {"images_b64": [b64]})
    assert status == 200
    assert out["batch"] == 1 and out["dim"] == 32


def test_stablehlo_artifact_serving(tmp_path):
    """Artifacts from convert.py --export-serving serve standalone."""
    import os

    from declip_tpu.tools.convert import export_serving
    from declip_tpu.tools.serve import ServingHost

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = os.path.join(repo, "experiments", "unit", "tiny_clip",
                       "config.yaml")
    export_serving(cfg, str(tmp_path))
    host = ServingHost.from_stablehlo(str(tmp_path), max_batch=4,
                                      max_wait_ms=5.0)
    assert set(host.batcher.runners) == {"image", "text"}
    assert host.meta["input_resolution"] == 224
    stop = threading.Event()
    t = threading.Thread(target=host.batcher.run_forever, args=(stop,),
                         daemon=True)
    t.start()
    try:
        out = host.encode_text({"texts": ["a dog", "a cat", "a plane"]})
        emb = np.asarray(out["embeddings"], np.float32)
        assert emb.shape == (3, 64) and np.isfinite(emb).all()
        # bucket padding (3 -> 4) must not leak into row values: resubmit
        # one row alone and compare
        out1 = host.encode_text({"texts": ["a dog"]})
        np.testing.assert_allclose(
            np.asarray(out1["embeddings"][0]), emb[0], rtol=1e-5, atol=1e-6)
    finally:
        stop.set()
        host.shutdown()
        t.join(timeout=10)
