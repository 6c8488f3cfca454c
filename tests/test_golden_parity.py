"""Golden cross-checks: run the REFERENCE pipeline code on fixed inputs
and assert byte-equality with this repo's codecs.

* char: /root/reference/mimic/utils/text.py is dependency-light (numpy +
  torch only) and loads standalone — its one_hot_encode / tensor_to_text
  run directly against ours (ref pins: mimic/tests/test_text_encoding.py).
* word: /root/reference/mimic/dataio/MimicDataset.py's MimicSentences is
  loaded with its unavailable imports stubbed (torchvision-dependent
  transforms; nltk punkt data is absent in this environment so BOTH sides
  get the same injected tokenizer) and its actual _create_vocab /
  _create_data methods build the golden vocab + index arrays.

Skips cleanly when the reference checkout is absent.
"""

import importlib.util
import json
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference checkout absent")

from mopoe_mimic_tpu.data.alphabet import ALPHABET
from mopoe_mimic_tpu.data import vocab as repo_vocab
from mopoe_mimic_tpu.data.text_codec import one_hot_encode, tensor_to_text


def _load_standalone(name: str, path: Path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod  # pickle inside the module resolves it by name
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_text():
    return _load_standalone("ref_text", REF / "mimic/utils/text.py")


@pytest.fixture(scope="module")
def ref_dataset(ref_text):
    """Load the reference MimicDataset module with stubs for the imports
    that need torchvision / the full package (never touches /root/reference
    for writes)."""
    saved = {k: sys.modules.get(k) for k in (
        "mimic", "mimic.dataio", "mimic.dataio.utils",
        "mimic.utils", "mimic.utils.text", "mimic.utils.utils",
        "mimic.logger", "mimic.logger.logger",
    )}
    try:
        for name in ("mimic", "mimic.dataio", "mimic.logger"):
            sys.modules[name] = types.ModuleType(name)
        du = types.ModuleType("mimic.dataio.utils")
        du.get_transform_img = lambda *a, **k: None
        du.filter_labels = lambda *a, **k: None
        sys.modules["mimic.dataio.utils"] = du
        mu = types.ModuleType("mimic.utils")
        mu.text = ref_text
        sys.modules["mimic.utils"] = mu
        sys.modules["mimic.utils.text"] = ref_text
        uu = types.ModuleType("mimic.utils.utils")
        uu.get_alphabet = lambda *a, **k: ALPHABET
        sys.modules["mimic.utils.utils"] = uu
        yield _load_standalone("ref_mimicdataset", REF / "mimic/dataio/MimicDataset.py")
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


FIXED_REPORTS = [
    "there is no focal consolidation, pleural effusion or pneumothorax.",
    "the cardiomediastinal silhouette is normal.",
    "chronic deformity of the posterior left sixth and seventh ribs are noted.",
    "heart size is normal. no focal consolidation. the lungs are clear.",
    "UNSEEN Überweisung: chars outside the alphabet § map to the unk symbol!",
    "",
    "x" * 2000,  # overlength → truncation path
]


# ---------------------------------------------------------------------------
# char codec
# ---------------------------------------------------------------------------

def test_char_one_hot_golden(ref_text):
    for report in FIXED_REPORTS:
        for len_seq in (32, 128, 1024):
            ref = ref_text.one_hot_encode(len_seq, ALPHABET, report.lower()).numpy()
            ours = one_hot_encode(len_seq, report.lower())
            np.testing.assert_array_equal(
                ours, ref, err_msg=f"char one-hot differs for {report[:40]!r} @ {len_seq}"
            )


def test_char_decode_golden(ref_text):
    import torch

    exp_stub = types.SimpleNamespace(
        flags=types.SimpleNamespace(text_encoding="char"), alphabet=ALPHABET
    )
    for report in FIXED_REPORTS[:5]:
        enc = one_hot_encode(64, report.lower())
        ref_dec = ref_text.tensor_to_text(
            exp_stub, torch.from_numpy(enc[None]), one_hot=True
        )[0]
        our_dec = tensor_to_text(enc[None], one_hot=True)[0]
        assert our_dec == ref_dec
        # pinned semantics (ref test_text_encoding.py style): decoded text
        # startswith the (lowercased, alphabet-projected) report
        if report and len(report) < 60:
            prefix = "".join(our_dec)[: len(report)]
            projected = "".join(
                ch if ch in ALPHABET else "@" for ch in report.lower()
            )
            assert prefix == projected


# ---------------------------------------------------------------------------
# word vocab + tokenize/pad
# ---------------------------------------------------------------------------

def _fixture_tokenizer(line):
    """Deterministic tokenizer injected into BOTH implementations (punkt
    data is unavailable, so the real nltk path can't run here)."""
    return repo_vocab._WORD_RE.findall(line.lower())


def test_word_vocab_and_encode_golden(ref_dataset, tmp_path, monkeypatch):
    findings = [
        "no acute cardiopulmonary process.",
        "no acute process. heart size is normal.",
        "heart size is normal. lungs are clear. no acute process seen here.",
        "lungs are clear; no effusion, no pneumothorax.",
        "heart size normal, lungs clear, no effusion.",
    ]
    min_occ, msl = 1, 12

    # inject the same tokenizer into the reference module and ours
    monkeypatch.setattr(ref_dataset, "word_tokenize", lambda s: _fixture_tokenizer(s))
    monkeypatch.setattr(repo_vocab, "tokenize", _fixture_tokenizer)

    # --- run the actual reference MimicSentences vocab+data build ---------
    ms = ref_dataset.MimicSentences.__new__(ref_dataset.MimicSentences)
    ms.split = "train"
    ms.data_dir = str(tmp_path / "ref")
    ms.max_sequence_length = msl
    ms.min_occ = min_occ
    ms.transform = None
    ms.findings = findings
    ms.gen_dir = str(tmp_path / "ref" / f"oc:{min_occ}_msl:{msl}")
    ms.data_file = f"mimic.train.s{msl}"
    ms.vocab_file = "mimic.vocab"
    Path(ms.gen_dir).mkdir(parents=True)
    ms._create_data()  # builds vocab + tokenized/padded index arrays

    # --- ours --------------------------------------------------------------
    v = repo_vocab.Vocab.build(findings, min_occ=min_occ)

    assert v.w2i == ms.w2i, "w2i must match the reference build exactly"
    assert {int(k): w for k, w in v.i2w.items()} == {
        int(k): w for k, w in ms.i2w.items()
    }
    assert v.vocab_size == ms.vocab_size
    # NB: ms.unk_idx is dead code in the reference (KeyError '<unk>'); the
    # live unknown mapping uses w2i['<exc>'] (MimicDataset.py:327)
    assert (v.unk_idx, v.pad_idx, v.eos_idx) == (
        ms.w2i["<exc>"], ms.pad_idx, ms.eos_idx
    )

    for i, line in enumerate(findings):
        ref_idx = np.asarray(ms.data[str(i)]["idx"], dtype=np.int32)
        ours_idx = v.encode(line, msl)
        np.testing.assert_array_equal(
            ours_idx, ref_idx, err_msg=f"word indices differ for report {i}"
        )
        # decoded-prefix pin (ref mimic/tests/test_text_encoding.py:12-40):
        # our decode == the reference's i2w decode of its own indices
        assert v.decode(ours_idx) == [ms.i2w[str(int(j))] for j in ref_idx]


def test_word_strict_min_occ_golden(ref_dataset, tmp_path, monkeypatch):
    """The occurrence threshold is strictly greater-than (ref :374)."""
    monkeypatch.setattr(ref_dataset, "word_tokenize", lambda s: _fixture_tokenizer(s))
    monkeypatch.setattr(repo_vocab, "tokenize", _fixture_tokenizer)
    findings = ["alpha beta", "alpha beta", "alpha"]
    ms = ref_dataset.MimicSentences.__new__(ref_dataset.MimicSentences)
    ms.split, ms.data_dir = "train", str(tmp_path / "r2")
    ms.max_sequence_length, ms.min_occ, ms.transform = 4, 2, None
    ms.findings = findings
    ms.gen_dir = str(tmp_path / "r2" / "g")
    ms.data_file, ms.vocab_file = "d", "mimic.vocab"
    Path(ms.gen_dir).mkdir(parents=True)
    ms._create_vocab()
    v = repo_vocab.Vocab.build(findings, min_occ=2)
    assert v.w2i == ms.w2i
    assert "alpha" in v.w2i and "beta" not in v.w2i  # 3 > 2 kept, 2 > 2 not
