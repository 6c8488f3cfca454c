"""Data layer: synthetic fixture shapes, loader semantics, text codecs
(golden-value style tests per SURVEY.md §4 takeaways)."""

import numpy as np
import pytest

from mopoe_mimic_tpu.config import MopoeConfig
from mopoe_mimic_tpu.data.alphabet import ALPHABET
from mopoe_mimic_tpu.data.loader import BatchLoader
from mopoe_mimic_tpu.data.synthetic import SyntheticMimic
from mopoe_mimic_tpu.data.text_codec import one_hot_encode, tensor_to_text
from mopoe_mimic_tpu.data.vocab import Vocab


def test_synthetic_shapes_match_reference_fixture():
    cfg = MopoeConfig(batch_size=4, img_size=128, text_encoding="char", dataset="testing")
    ds = SyntheticMimic(cfg)
    assert len(ds) == 2 * cfg.batch_size  # MimicDataset.py:433
    sample, label = ds[0]
    assert sample["PA"].shape == (128, 128, 1)
    assert sample["Lateral"].shape == (128, 128, 1)
    assert sample["text"].shape == (1024, 71)
    assert label.shape == (3,)
    cfg2 = cfg.replace(text_encoding="word", binary_labels=True)
    ds2 = SyntheticMimic(cfg2)
    s2, l2 = ds2[0]
    assert s2["text"].shape == (128,) and s2["text"].dtype == np.int32
    assert l2.shape == (1,)
    assert s2["text"].max() < cfg2.vocab_size


def test_loader_shapes_and_determinism():
    cfg = MopoeConfig(batch_size=4, img_size=64, text_encoding="word", dataset="testing")
    ds = SyntheticMimic(cfg)
    loader = BatchLoader(ds, 4, shuffle=True, seed=7)
    loader.set_epoch(3)
    b1 = [lbl for _, lbl in loader]
    loader2 = BatchLoader(ds, 4, shuffle=True, seed=7)
    loader2.set_epoch(3)
    b2 = [lbl for _, lbl in loader2]
    np.testing.assert_array_equal(np.concatenate(b1), np.concatenate(b2))
    assert len(loader) == 2  # drop_last with 8 samples / bs 4


def test_loader_split_smaller_than_batch_wraps():
    # a split with fewer rows than one batch yields ONE wraparound-padded
    # batch (static shapes for jit) instead of an empty epoch
    cfg = MopoeConfig(batch_size=16, img_size=64, text_encoding="word", dataset="testing")
    ds = SyntheticMimic(cfg, seed=0, length=6)
    loader = BatchLoader(ds, 16, shuffle=True, seed=1)
    assert len(loader) == 1
    batches = list(loader)
    assert len(batches) == 1
    batch, labels = batches[0]
    assert batch["PA"].shape[0] == 16 and labels.shape[0] == 16
    # every row is one of the 6 real rows (wraparound, no padding junk)
    uniq = np.unique(labels, axis=0)
    assert len(uniq) <= 6


def test_weighted_loader_oversamples_rare_combos():
    cfg = MopoeConfig(batch_size=16, img_size=64, text_encoding="word", dataset="testing")
    ds = SyntheticMimic(cfg)
    # make one rare combo
    ds.labels[:] = 0.0
    ds.labels[0] = 1.0
    loader = BatchLoader(ds, 16, weighted=True, seed=0)
    _, labels = next(iter(loader))
    # rare sample should appear far more often than its 1/32 base rate
    assert labels.sum() >= 3


def test_one_hot_encode_golden():
    # '$' EOS then '&' padding; '@' for out-of-alphabet (text.py:13-34)
    x = one_hot_encode(8, "ab")
    decoded = "".join(ALPHABET[i] for i in x.argmax(-1))
    assert decoded == "ab$&&&&&"
    x2 = one_hot_encode(4, "aéb")  # é is out-of-alphabet → '@'
    decoded2 = "".join(ALPHABET[i] for i in x2.argmax(-1))
    assert decoded2 == "a@b$"
    # truncation
    x3 = one_hot_encode(2, "abcdef")
    assert "".join(ALPHABET[i] for i in x3.argmax(-1)) == "ab"


def test_tensor_to_text_roundtrip():
    x = np.stack([one_hot_encode(6, "hi")])
    toks = tensor_to_text(x, one_hot=True)
    assert "".join(toks[0]) == "hi$&&&"


def test_vocab_build_encode_decode(tmp_path):
    findings = ["the cat sat on the mat", "the dog sat", "cat and dog sat here"]
    v = Vocab.build(findings, min_occ=1)  # keep words with count > 1
    # reference specials order (MimicDataset.py:359): <exc>=0, <pad>=1, <eos>=2
    assert v.unk_idx == 0 and v.pad_idx == 1 and v.eos_idx == 2
    assert "on" not in v.w2i  # count 1 is NOT > min_occ (strict, :374)
    ids = v.encode("the cat sat", max_len=6)
    assert ids.shape == (6,)
    toks = v.decode(ids)
    assert toks[:3] == ["the", "cat", "sat"]
    assert toks[3] == "<eos>"
    assert toks[4] == "<pad>"
    # rare word → <exc>
    ids2 = v.encode("the zebra", max_len=4)
    assert v.decode(ids2)[1] == "<exc>"
    # persistence incl. tokenizer provenance
    v.save(str(tmp_path), 1, 6)
    v2 = Vocab.load(str(tmp_path), 1, 6)
    assert v2.w2i == v.w2i
    assert v2.tokenizer == v.tokenizer
