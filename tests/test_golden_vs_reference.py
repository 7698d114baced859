"""Golden-value tests: converted reference (torch) weights must reproduce the
reference forward pass in our JAX towers (fp32, rtol ~1e-4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import ref_compat

pytestmark = pytest.mark.skipif(
    not ref_compat.available(), reason="reference tree not mounted"
)

TINY = dict(width=64, layers=2, heads=2)


@pytest.fixture(scope="module")
def bpe_path(tmp_path_factory):
    return ref_compat.install_reference(tmp_path_factory.mktemp("bpe"))


def _convert(torch_module):
    from declip_tpu.convert_pth import torch_state_to_variables

    return torch_state_to_variables(torch_module.state_dict())


def test_tokenizer_matches_reference(bpe_path):
    from prototype.model.utils.text_utils.simple_tokenizer import (
        SimpleTokenizer,
    )

    from declip_tpu.tokenizer.bpe import BpeTokenizer

    ref = SimpleTokenizer(bpe_path=bpe_path)
    ours = BpeTokenizer(bpe_path)
    assert len(ref.encoder) == ours.vocab_size
    for text in ["the cat and the dog.", "A photo OF a thing!", "in 2020",
                 "weird &amp; cleaned   spaces"]:
        assert ref.encode(text) == ours.encode(text), text


def test_vit_forward_matches(bpe_path):
    import torch
    from prototype.model.image_encoder.visual_transformer import (
        visual_transformer_B32,
    )

    from declip_tpu.models.vit import VisualTransformer

    ref = visual_transformer_B32(
        embed_dim=32, input_resolution=64, patch_size=32, **TINY
    ).eval()
    ours = VisualTransformer(
        input_resolution=64, patch_size=32, embed_dim=32, **TINY
    )
    variables = _convert(ref)

    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = jax.jit(lambda v, x: ours.apply(v, x))(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-5)


def test_text_tower_matches(bpe_path):
    import torch
    from prototype.model.text_encoder.text_transformer import text_transformers

    from declip_tpu.models.text import TextTransformer
    from declip_tpu.tokenizer.bpe import BpeTokenizer

    ref = text_transformers(
        embed_dim=32, transformer_width=64, transformer_heads=2,
        transformer_layers=2, text_encode_type="Transformer",
        bpe_path=bpe_path, text_model_utils={"random": False, "freeze": False},
    ).eval()
    tok = BpeTokenizer(bpe_path)
    ours = TextTransformer(
        vocab_size=tok.vocab_size, embed_dim=32, transformer_width=64,
        transformer_heads=2, transformer_layers=2, eot_id=tok.eot_id,
    )
    variables = _convert(ref)

    texts = ["the cat and the dog", "a photo of the thing"]
    with torch.no_grad():
        # reference tokenizes inside forward on the same vocab
        ref_out = ref(texts).numpy()
    ids = jnp.asarray(tok.tokenize(texts))
    out = jax.jit(lambda v, t: ours.apply(v, t))(variables, ids)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-5)


def test_resnet_forward_matches(bpe_path):
    import torch
    from prototype.model.image_encoder.modified_resnet import (
        modified_resnet_R50,
    )

    from declip_tpu.models.resnet import ModifiedResNet

    # 224 input: the reference only takes the attnpool path at 7x7 spatial
    # (modified_resnet.py:205) and its fallback fc is hardcoded to 2048-ch
    ref = modified_resnet_R50(
        embed_dim=32, input_resolution=224, width=16, layers=(1, 1, 1, 1),
        heads=2, use_sync_bn=False,
    ).eval()
    ours = ModifiedResNet(
        layers=(1, 1, 1, 1), embed_dim=32, heads=2, input_resolution=224,
        width=16,
    )
    variables = _convert(ref)

    x = np.random.default_rng(1).normal(size=(2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    out = jax.jit(lambda v, x: ours.apply(v, x, train=False))(
        variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-4)


def test_full_clip_vit_matches(bpe_path):
    import torch
    from prototype.model.clip import clip_vitb32

    from declip_tpu.models import model_entry

    ref = clip_vitb32(
        image_encode=dict(embed_dim=32, input_resolution=64, patch_size=32,
                          **TINY),
        text_encode=dict(embed_dim=32, transformer_width=64,
                         transformer_heads=2, transformer_layers=2,
                         text_encode_type="Transformer", bpe_path=bpe_path,
                         text_model_utils={"random": False, "freeze": False}),
        clip=dict(use_allgather=False),
    ).eval()
    ours = model_entry({
        "type": "clip_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": 32, "input_resolution": 64,
                             "patch_size": 32, **TINY},
            "text_encode": {"embed_dim": 32, "transformer_width": 64,
                            "transformer_heads": 2, "transformer_layers": 2,
                            "bpe_path": bpe_path},
            "clip": {"use_allgather": False},
        },
    })
    variables = _convert(ref)

    from declip_tpu.tokenizer.bpe import BpeTokenizer

    tok = BpeTokenizer(bpe_path)
    texts = ["the cat", "a dog in the thing"]
    x = np.random.default_rng(2).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        logits_img, logits_txt = ref(
            {"images": torch.tensor(x.transpose(0, 3, 1, 2)),
             "captions": [[t] for t in texts]}
        )
    batch = {"images": jnp.asarray(x), "tokens": jnp.asarray(tok.tokenize(texts))}
    out = jax.jit(lambda v, b: ours.apply(v, b, train=False))(variables, batch)
    ours_logits = np.asarray(
        out["logit_scale"] * out["image_embed"] @ out["text_embed"].T
    )
    np.testing.assert_allclose(ours_logits, logits_img.numpy(), rtol=2e-3,
                               atol=2e-4)


def test_export_loads_into_reference_model(bpe_path, tmp_path):
    """Our exported torch state_dict must load into the actual reference
    torch model with strict=True (key names AND shapes)."""
    import torch
    from prototype.model.clip import clip_vitb32 as ref_clip

    from declip_tpu.models import model_entry
    from declip_tpu.tools.convert import variables_to_torch_state

    ours = model_entry({
        "type": "clip_vitb32",
        "kwargs": {
            "image_encode": {"embed_dim": 32, "input_resolution": 64,
                             "patch_size": 32, **TINY},
            "text_encode": {"embed_dim": 32, "transformer_width": 64,
                            "transformer_heads": 2, "transformer_layers": 2,
                            "bpe_path": bpe_path},
            "clip": {"use_allgather": False},
        },
    })
    batch = {"images": jnp.zeros((1, 64, 64, 3)),
             "tokens": jnp.ones((1, 77), jnp.int32)}
    variables = jax.jit(
        lambda: ours.init(jax.random.PRNGKey(0), batch, train=False))()
    state = variables_to_torch_state(
        {"params": jax.device_get(variables["params"])})

    ref = ref_clip(
        image_encode=dict(embed_dim=32, input_resolution=64, patch_size=32,
                          **TINY),
        text_encode=dict(embed_dim=32, transformer_width=64,
                         transformer_heads=2, transformer_layers=2,
                         text_encode_type="Transformer", bpe_path=bpe_path,
                         text_model_utils={"random": False, "freeze": False}),
        clip=dict(use_allgather=False),
    )
    missing, unexpected = ref.load_state_dict(
        {k: v for k, v in state.items()}, strict=False)
    assert not unexpected, f"unexpected keys: {unexpected[:8]}"
    assert not missing, f"missing keys: {missing[:8]}"
