"""Helpers to import the reference (torch) models for golden-value tests.

Stubs the reference's unavailable deps (ipdb/timm/textaugment/ftfy) and
fabricates a small BPE merges file so both tokenizers build identical vocabs.
"""

import gzip
import os
import sys
import types

REF_ROOT = "/root/reference"


def _stub(name, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_reference(tmp_bpe_dir=None):
    """Make `prototype.*` importable; returns the fake bpe path (or None)."""
    _stub("ipdb", set_trace=lambda: None)
    _stub("timm")
    _stub("textaugment", EDA=object)
    _stub("ftfy", fix_text=lambda s: s)

    class _EasyDict(dict):
        __getattr__ = dict.__getitem__
        __setattr__ = dict.__setitem__

    _stub("easydict", EasyDict=_EasyDict)
    # the reference hardcodes .cuda() inside forward (text_transformer.py:188)
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    # NOTE: the reference tree vendors a single-process `linklink` shim
    # (/root/reference/linklink) good enough for CPU training math: world
    # size from SLURM env (default 1), barrier no-op, fp16.FP16_Optimizer
    # importable, and no linklink.optim (prototype/optimizer/__init__.py
    # catches that and falls back to torch SGD/AdamW).
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    bpe_path = None
    if tmp_bpe_dir is not None:
        bpe_path = os.path.join(str(tmp_bpe_dir), "fake_bpe.txt.gz")
        if not os.path.exists(bpe_path):
            merges = [
                "t h", "th e</w>", "a n", "an d</w>", "i n", "o f</w>",
                "c a", "ca t</w>", "d o", "do g</w>",
            ]
            with gzip.open(bpe_path, "wt", encoding="utf-8") as f:
                # no trailing newline: the reference parses empty lines into
                # phantom vocab entries (simple_tokenizer.py:66-72)
                f.write("#version: fake\n")
                f.write("\n".join(merges))
    return bpe_path


def available() -> bool:
    return os.path.isdir(REF_ROOT)
