"""ctypes binding + build for the native host codec (fast_codec.cpp).

Compiled lazily with g++ on first use and cached next to the source; all
entry points fall back to the numpy implementations when no compiler is
available, so the framework stays pure-Python-runnable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from mopoe_mimic_tpu.data.alphabet import ALPHABET, EOS_CHAR, PAD_CHAR, UNK_CHAR
from mopoe_mimic_tpu.utils.logger import log

_HERE = Path(__file__).parent
_SO = _HERE / "libfast_codec.so"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[ctypes.CDLL]:
    src = _HERE / "fast_codec.cpp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(src)],
            check=True, capture_output=True, timeout=120,
        )
        return ctypes.CDLL(str(_SO))
    except (OSError, subprocess.SubprocessError) as e:
        log.debug(f"native codec unavailable ({e}); using numpy fallback")
        return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if _SO.exists():
            try:
                _LIB = ctypes.CDLL(str(_SO))
            except OSError:
                _LIB = _build()
        else:
            _LIB = _build()
        if _LIB is not None:
            _LIB.build_lut.argtypes = [
                ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int32),
            ]
            _LIB.one_hot_encode_batch.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.int64),
                ctypes.c_int64, ctypes.c_int64,
                np.ctypeslib.ndpointer(np.int32),
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                np.ctypeslib.ndpointer(np.float32),
            ]
            _LIB.gather_rows_f32.argtypes = [
                np.ctypeslib.ndpointer(np.float32),
                np.ctypeslib.ndpointer(np.int64),
                ctypes.c_int64, ctypes.c_int64,
                np.ctypeslib.ndpointer(np.float32),
            ]
        return _LIB


def have_native() -> bool:
    return _lib() is not None


_LUT: Optional[np.ndarray] = None


def _lut(lib) -> np.ndarray:
    global _LUT
    if _LUT is None:
        lut = np.empty(256, dtype=np.int32)
        lib.build_lut(ALPHABET.encode("latin-1"), len(ALPHABET),
                      ALPHABET.index(UNK_CHAR), lut)
        _LUT = lut
    return _LUT


def one_hot_encode_batch(texts: Sequence[str], len_seq: int) -> np.ndarray:
    """[n, len_seq, |alphabet|] float32 one-hot of lowercased reports."""
    lib = _lib()
    if lib is None:
        from mopoe_mimic_tpu.data.text_codec import one_hot_encode

        return np.stack([one_hot_encode(len_seq, t.lower()) for t in texts])
    # non-latin-1 characters map to '@' like the python codec's OOV rule
    import codecs

    try:
        codecs.lookup_error("mopoe_unk")
    except LookupError:
        codecs.register_error("mopoe_unk", lambda e: (UNK_CHAR, e.end))
    enc = [t.lower().encode("latin-1", errors="mopoe_unk") for t in texts]
    blob = b"".join(enc)
    offsets = np.zeros(len(enc) + 1, dtype=np.int64)
    np.cumsum([len(e) for e in enc], out=offsets[1:])
    out = np.zeros((len(enc), len_seq, len(ALPHABET)), dtype=np.float32)
    lib.one_hot_encode_batch(
        blob, offsets, len(enc), len_seq, _lut(lib), len(ALPHABET),
        ALPHABET.index(EOS_CHAR), ALPHABET.index(PAD_CHAR), out,
    )
    return out


def gather_rows_f32(src: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Contiguous batched row gather; numpy fallback is fancy indexing."""
    lib = _lib()
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    if lib is None or not isinstance(src, np.memmap) and not src.flags["C_CONTIGUOUS"]:
        return np.ascontiguousarray(src[indices])
    src = np.ascontiguousarray(src, dtype=np.float32) if not src.flags["C_CONTIGUOUS"] else src
    row_elems = int(np.prod(src.shape[1:]))
    out = np.empty((len(indices),) + src.shape[1:], dtype=np.float32)
    lib.gather_rows_f32(src.reshape(src.shape[0], -1), indices, len(indices),
                        row_elems, out.reshape(len(indices), -1))
    return out
