"""EDA text augmentation, host-side, for DeCLIP's text self-supervision.

The reference calls ``textaugment.EDA`` per caption *inside the model forward*
(prototype/model/declip.py:203-212) — a Python loop on the training critical
path. Here EDA runs in the data pipeline on raw strings before tokenization,
so the device never waits on it.

Per caption the reference picks uniformly among synonym-replacement /
random-swap / random-deletion. Synonym replacement needs WordNet; in hermetic
environments (no nltk corpus) we fall back to swap/delete only, or a
user-supplied synonym table.
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence

try:
    from nltk.corpus import wordnet as _wn

    try:  # corpus present?
        _wn.synsets("test")
        _HAS_WORDNET = True
    except LookupError:
        _HAS_WORDNET = False
except ImportError:
    _HAS_WORDNET = False


def random_swap(words: List[str], n: int, rng: random.Random) -> List[str]:
    words = list(words)
    for _ in range(n):
        if len(words) < 2:
            break
        i, j = rng.sample(range(len(words)), 2)
        words[i], words[j] = words[j], words[i]
    return words


def random_deletion(words: List[str], p: float, rng: random.Random) -> List[str]:
    if len(words) <= 1:
        return list(words)
    kept = [w for w in words if rng.random() > p]
    return kept if kept else [rng.choice(words)]


def _synonyms(word: str, table: Optional[Dict[str, Sequence[str]]]):
    if table is not None:
        return list(table.get(word, ()))
    if _HAS_WORDNET:
        syns = {
            lemma.name().replace("_", " ")
            for ss in _wn.synsets(word)
            for lemma in ss.lemmas()
        }
        syns.discard(word)
        return sorted(syns)
    return []


def synonym_replacement(
    words: List[str],
    n: int,
    rng: random.Random,
    table: Optional[Dict[str, Sequence[str]]] = None,
) -> List[str]:
    words = list(words)
    candidates = [i for i, w in enumerate(words) if w.isalpha()]
    rng.shuffle(candidates)
    replaced = 0
    for i in candidates:
        syns = _synonyms(words[i], table)
        if syns:
            words[i] = rng.choice(syns)
            replaced += 1
        if replaced >= n:
            break
    return words


class EDA:
    """Easy Data Augmentation over captions.

    ``augment(caption)`` applies one randomly chosen op, mirroring the
    reference's random.choice among sr/swap/delete (declip.py:205-211).
    """

    def __init__(
        self,
        seed: Optional[int] = None,
        p_delete: float = 0.1,
        n_ops: int = 1,
        synonym_table: Optional[Dict[str, Sequence[str]]] = None,
    ):
        self.rng = random.Random(seed)
        self.p_delete = p_delete
        self.n_ops = n_ops
        self.synonym_table = synonym_table
        self._have_synonyms = synonym_table is not None or _HAS_WORDNET

    def augment(self, caption: str) -> str:
        words = caption.split()
        if not words:
            return caption
        ops = ["swap", "delete"] + (["synonym"] if self._have_synonyms else [])
        op = self.rng.choice(ops)
        if op == "synonym":
            words = synonym_replacement(
                words, self.n_ops, self.rng, self.synonym_table
            )
        elif op == "swap":
            words = random_swap(words, self.n_ops, self.rng)
        else:
            words = random_deletion(words, self.p_delete, self.rng)
        return " ".join(words)

    def augment_batch(self, captions: Sequence[str]) -> List[str]:
        return [self.augment(c) for c in captions]
