"""Word vocabulary + report tokenization for the word text encoding.

Parity: MimicSentences (mimic/dataio/MimicDataset.py:224-396) — build (on
the train split) or load a w2i/i2w vocabulary from the findings reports
with a min-occurrence threshold and specials ``<exc> <pad> <eos>`` (pad
index 0); tokenize each report, truncate to max_sequence_length - 1,
append <eos>, pad with <pad>; persist per (min_occ, max_seq_len).

Tokenization uses nltk's word_tokenize when its punkt data is available
and a regex fallback otherwise (zero-egress environments can't download
nltk data).
"""

from __future__ import annotations

import json
import os
import re
from collections import Counter, OrderedDict
from pathlib import Path
from typing import Dict, Iterable, List, Optional

import numpy as np

SPECIALS = ["<exc>", "<pad>", "<eos>"]
PAD, EOS, UNK = "<pad>", "<eos>", "<exc>"

_WORD_RE = re.compile(r"\w+|[^\w\s]")


def tokenize(line: str) -> List[str]:
    try:
        from nltk.tokenize import word_tokenize

        return word_tokenize(line.lower())
    except LookupError:
        return _WORD_RE.findall(line.lower())
    except ImportError:
        return _WORD_RE.findall(line.lower())


class Vocab:
    def __init__(self, w2i: Dict[str, int], i2w: Dict[str, str]):
        self.w2i = w2i
        self.i2w = i2w

    @property
    def vocab_size(self) -> int:
        return len(self.w2i)

    @property
    def pad_idx(self) -> int:
        return self.w2i[PAD]

    @classmethod
    def build(cls, findings: Iterable[str], min_occ: int = 3) -> "Vocab":
        counter: Counter = Counter()
        for line in findings:
            counter.update(tokenize(line))
        w2i: "OrderedDict[str, int]" = OrderedDict()
        # pad first → index 0 matches the embedding's padding_idx
        for sp in [PAD, EOS, UNK]:
            w2i[sp] = len(w2i)
        for w, c in counter.items():
            if c >= min_occ and w not in w2i:
                w2i[w] = len(w2i)
        i2w = {str(i): w for w, i in w2i.items()}
        return cls(dict(w2i), i2w)

    def encode(self, line: str, max_len: int) -> np.ndarray:
        tok = tokenize(line)[: max_len - 1] + [EOS]
        if len(tok) < max_len:
            tok = tok + [PAD] * (max_len - len(tok))
        unk = self.w2i[UNK]
        return np.asarray([self.w2i.get(w, unk) for w in tok], dtype=np.int32)

    def decode(self, ids: Iterable[int]) -> List[str]:
        return [self.i2w.get(str(int(i)), UNK) for i in ids]

    # -- persistence (gen_dir layout parity: oc:{}_msl:{}/mimic.vocab) ----
    @staticmethod
    def gen_dir(data_dir: str, min_occ: int, max_len: int) -> Path:
        return Path(data_dir) / f"oc:{min_occ}_msl:{max_len}"

    def save(self, data_dir: str, min_occ: int, max_len: int) -> None:
        d = self.gen_dir(data_dir, min_occ, max_len)
        d.mkdir(parents=True, exist_ok=True)
        with open(d / "mimic.vocab", "w") as f:
            json.dump({"w2i": self.w2i, "i2w": self.i2w}, f)

    @classmethod
    def load(cls, data_dir: str, min_occ: int, max_len: int) -> Optional["Vocab"]:
        p = cls.gen_dir(data_dir, min_occ, max_len) / "mimic.vocab"
        if not p.exists():
            return None
        with open(p) as f:
            v = json.load(f)
        return cls(v["w2i"], v["i2w"])
