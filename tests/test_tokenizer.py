import numpy as np
import pytest

from declip_tpu.tokenizer import BpeTokenizer, EDA, IGNORE_INDEX, get_tokenizer, mask_tokens


@pytest.fixture(scope="module")
def tok():
    return get_tokenizer()


def test_vocab_structure(tok):
    # specials are the last three ids: mask, sot, eot
    # (simple_tokenizer.py:69-74 — eot is the highest id)
    assert tok.mask_id == tok.vocab_size - 3
    assert tok.sot_id == tok.vocab_size - 2
    assert tok.eot_id == tok.vocab_size - 1


def test_roundtrip(tok):
    s = "a photo of a cat."
    ids = tok.encode(s)
    assert tok.decode(ids) == "a photo of a cat ."


def test_tokenize_shape_and_framing(tok):
    arr = tok.tokenize(["hello world", "a"], context_length=77)
    assert arr.shape == (2, 77)
    assert arr.dtype == np.int32
    for row in arr:
        assert row[0] == tok.sot_id
        nz = row[row != 0]
        assert nz[-1] == tok.eot_id
    # padding zeros after eot
    assert arr[1][arr[1] != 0].size < 77


def test_tokenize_truncation(tok):
    long = " ".join(["word"] * 500)
    arr = tok.tokenize(long, context_length=77)
    assert arr.shape == (1, 77)
    assert arr[0, 0] == tok.sot_id
    assert arr[0, -1] == tok.eot_id  # fully packed -> eot at end


def test_special_token_passthrough(tok):
    ids = tok.encode("<|mask|> hi")
    assert ids[0] == tok.mask_id


def test_mlm_masking(tok, rng):
    tokens = tok.tokenize(["a photo of a dog running in the park"] * 8)
    masked, labels = mask_tokens(
        tokens,
        mask_id=tok.mask_id,
        vocab_size=tok.vocab_size,
        special_ids=(tok.sot_id, tok.eot_id),
        rng=rng,
    )
    assert masked.shape == tokens.shape
    # specials and padding untouched
    assert (masked[tokens == 0] == 0).all()
    assert (masked[tokens == tok.sot_id] == tok.sot_id).all()
    assert (masked[tokens == tok.eot_id] == tok.eot_id).all()
    # labels only where selected; selected positions keep original token
    sel = labels != IGNORE_INDEX
    assert sel.any()
    assert (labels[sel] == tokens[sel]).all()
    # most selected positions are the mask token
    assert (masked[sel] == tok.mask_id).mean() > 0.5


def test_eda_deterministic_and_nonempty():
    eda = EDA(seed=0)
    caps = ["a photo of a cat sitting on a mat"] * 4
    out1 = EDA(seed=0).augment_batch(caps)
    out2 = EDA(seed=0).augment_batch(caps)
    assert out1 == out2
    assert all(len(c.split()) >= 1 for c in out1)
    # something changed across a batch with near-certainty
    assert any(a != b for a, b in zip(caps, out1))


def test_eda_all_three_ops_hermetic():
    """Without WordNet, the bundled static synonym table keeps all three EDA
    ops live (reference draws uniformly over sr/swap/delete,
    declip.py:205-211)."""
    from declip_tpu.tokenizer.eda import default_synonym_table, synonym_replacement
    import random

    table = default_synonym_table()
    assert len(table) > 500
    # symmetric closure: if a -> b then b -> a
    for w in ("photo", "big", "dog", "car"):
        for s in table[w]:
            if " " not in s:  # multi-word synonyms aren't keys
                assert w in table[s], (w, s)

    out = synonym_replacement(
        ["a", "photo", "of", "a", "dog"], 2, random.Random(0), table)
    assert out != ["a", "photo", "of", "a", "dog"]

    # distribution: over many captions each op fires (synonym changes a
    # known word, delete shortens, swap reorders)
    eda = EDA(seed=1)
    cap = "a big photo of a dog near a car"
    saw_shorter = saw_replaced = saw_swapped = 0
    for _ in range(200):
        out = eda.augment(cap)
        words = out.split()
        if len(words) < len(cap.split()):
            saw_shorter += 1
        elif set(words) != set(cap.split()):
            saw_replaced += 1
        elif out != cap:
            saw_swapped += 1
    assert saw_shorter > 20 and saw_replaced > 20 and saw_swapped > 20
