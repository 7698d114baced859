"""HF text towers end-to-end (models/hf_text.py): init -> pretrained graft ->
forward, with torch parity. Rebuilds the non-'Transformer' branches of the
reference's text_transformer.py:46-107 without network access by saving tiny
locally-constructed HF models to disk first."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

import jax

from declip_tpu.models.hf_text import (
    HFTextEncoder,
    build_hf_text,
    load_pretrained_variables,
)


@pytest.fixture(scope="module")
def tiny_bert_dir(tmp_path_factory):
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, pad_token_id=0,
    )
    d = tmp_path_factory.mktemp("tiny_bert")
    # torch-format checkpoint: the realistic case (the reference's cluster
    # paths hold torch weights); FlaxAutoModel loads safetensors directly
    BertModel(cfg).eval().save_pretrained(d)
    return str(d)


@pytest.fixture(scope="module")
def tiny_gpt2_dir(tmp_path_factory):
    from transformers import FlaxGPT2Model, GPT2Config

    cfg = GPT2Config(
        vocab_size=100, n_embd=32, n_layer=2, n_head=2, n_positions=64,
    )
    d = tmp_path_factory.mktemp("tiny_gpt2")
    FlaxGPT2Model(cfg, seed=0).save_pretrained(d)
    return str(d)


def _tokens(rng, pad_id=0):
    toks = rng.integers(2, 100, size=(4, 16)).astype(np.int32)
    toks[0, 10:] = pad_id  # one padded row exercises the attention mask
    return jnp.asarray(toks)


def test_bert_tower_graft_and_torch_parity(tiny_bert_dir, rng):
    enc = build_hf_text("Bert", embed_dim=24, pretrained_path=tiny_bert_dir)
    toks = _tokens(rng)
    variables = enc.init(jax.random.PRNGKey(0), toks)
    before = enc.apply(variables, toks)
    variables = load_pretrained_variables(enc, variables)
    pooled, words = jax.jit(
        lambda v, t: enc.apply(v, t, return_dense=True))(variables, toks)
    assert pooled.shape == (4, 24)
    # the graft actually replaced the random init
    assert not np.allclose(np.asarray(before), np.asarray(pooled), atol=1e-3)

    # torch parity on the backbone hidden states (same saved weights)
    from transformers import BertModel

    tm = BertModel.from_pretrained(tiny_bert_dir).eval()
    tt = torch.from_numpy(np.asarray(toks)).long()
    mask = (tt != 0).long()
    with torch.no_grad():
        ref = tm(input_ids=tt, attention_mask=mask).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(words), ref, rtol=2e-3, atol=2e-4)
    # CLS pooling (text_transformer.py:255-259): pooled = proj(words[:, 0])
    proj = enc.apply(
        variables, jnp.asarray(ref[:, 0]),
        method=lambda m, x: m.text_projection(x))
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(proj),
                               rtol=2e-3, atol=2e-4)


def test_gpt2_tower_mean_pooling(tiny_gpt2_dir, rng):
    enc = build_hf_text("GPT2", embed_dim=24, pretrained_path=tiny_gpt2_dir)
    toks = _tokens(rng)
    variables = load_pretrained_variables(
        enc, enc.init(jax.random.PRNGKey(0), toks))
    pooled, words = enc.apply(variables, toks, return_dense=True)
    assert pooled.shape == (4, 24)
    # mean pooling over non-pad tokens (text_transformer.py:261-262)
    mask = np.asarray(toks) != 0
    manual = (np.asarray(words) * mask[..., None]).sum(1) / \
        np.maximum(mask.sum(-1, keepdims=True), 1)
    proj = enc.apply(variables, jnp.asarray(manual),
                     method=lambda m, x: m.text_projection(x))
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(proj),
                               rtol=2e-3, atol=2e-4)


def test_missing_weights_raise(tmp_path):
    enc = HFTextEncoder(
        text_encode_type="Bert",
        pretrained_path=str(tmp_path / "nonexistent"), embed_dim=8)
    with pytest.raises(FileNotFoundError, match="zero-egress"):
        enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))


def test_solver_init_hf_text_with_nn_bank(tiny_bert_dir, tmp_path):
    """HF text tower + return_nn_bank: Solver._feature_dim must not assume
    the CLIP-Transformer param layout (VERDICT r1 weak #5)."""
    import shutil

    from declip_tpu.config import override, parse_config
    from declip_tpu.solver import Solver

    src = __file__.rsplit("/", 2)[0] + \
        "/experiments/unit/tiny_clip/config.yaml"
    shutil.copy(src, tmp_path / "config.yaml")
    cfg = parse_config(str(tmp_path / "config.yaml"))
    cfg = override(cfg, "model.type", "declip_vitb32")
    cfg = override(cfg, "model.kwargs.text_encode", {
        "text_encode_type": "Bert",
        "text_model_utils": {"pretrained_path": tiny_bert_dir},
        "embed_dim": 64,
    })
    cfg = override(cfg, "model.kwargs.clip.return_nn_bank", True)
    cfg = override(cfg, "model.kwargs.clip.feature_dim", 64)
    cfg = override(cfg, "model.kwargs.clip.nn_size", 128)
    cfg = override(cfg, "lr_scheduler.kwargs.max_iter", 2)
    cfg = override(cfg, "data.test", [])
    cfg["_config_path"] = str(tmp_path / "config.yaml")
    solver = Solver(cfg)
    assert solver.state.bank_text is not None
    assert solver.state.bank_text.bank.shape == (128, 64)
