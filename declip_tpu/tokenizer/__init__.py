from declip_tpu.tokenizer.bpe import BpeTokenizer  # noqa: F401
from declip_tpu.tokenizer.mlm import mask_tokens, IGNORE_INDEX  # noqa: F401
from declip_tpu.tokenizer.eda import EDA  # noqa: F401

_default_tokenizer = None


def get_tokenizer(merges_path=None) -> BpeTokenizer:
    """Process-wide shared tokenizer (construction scans the merge table)."""
    global _default_tokenizer
    if _default_tokenizer is None or merges_path is not None:
        tok = BpeTokenizer(merges_path)
        if merges_path is None:
            _default_tokenizer = tok
        return tok
    return _default_tokenizer
