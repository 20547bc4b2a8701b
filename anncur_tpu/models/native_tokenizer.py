"""ctypes bridge to the native C++ WordPiece tokenizer.

Drop-in accelerator for :class:`anncur_tpu.models.tokenizer.
WordPieceTokenizer`: ASCII texts go through the C++ fast path
(native/wordpiece.cpp), anything with non-ASCII bytes transparently
falls back to the Python implementation — outputs are byte-identical by
construction (parity-tested). The shared library is built on demand
with `make -C native` (g++ only; no pybind11 needed).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional

import numpy as np

from anncur_tpu.models.tokenizer import WordPieceTokenizer

LOGGER = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwordpiece.so")


def _ensure_lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
            )
        except Exception as exc:  # no toolchain -> pure-Python operation
            LOGGER.warning("native tokenizer build failed (%s); using Python", exc)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as exc:
        LOGGER.warning("cannot load %s (%s); using Python", _LIB_PATH, exc)
        return None
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.wp_destroy.argtypes = [ctypes.c_void_p]
    lib.wp_tokenize.restype = ctypes.c_int
    lib.wp_tokenize.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    return lib


class NativeWordPieceTokenizer(WordPieceTokenizer):
    """Same API as WordPieceTokenizer; encode() uses C++ when possible."""

    MAX_IDS = 8192

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self._lib = _ensure_lib()
        self._handle = None
        if self._lib is not None and not self.basic.do_lower_case:
            # wordpiece.cpp lowercases unconditionally; taking the fast
            # path for a cased tokenizer would silently change ids
            LOGGER.warning(
                "do_lower_case=False: native tokenizer disabled "
                "(the C fast path is lowercase-only; python path is exact)"
            )
            self._lib = None
        if self._lib is not None:
            # the C side assigns ids by ARRAY POSITION: a vocab with id
            # gaps (blank vocab.txt line, remapped ids) would silently
            # shift every id after the gap — refuse the fast path there
            ids = sorted(self.vocab.values())
            if ids != list(range(len(ids))):
                LOGGER.warning(
                    "vocab ids are not dense 0..%d; native tokenizer "
                    "disabled (python path is id-exact)", len(ids) - 1,
                )
            else:
                ordered = [t for t, _ in sorted(self.vocab.items(), key=lambda kv: kv[1])]
                arr = (ctypes.c_char_p * len(ordered))(*[t.encode("utf-8") for t in ordered])
                self._handle = self._lib.wp_create(
                    arr, len(ordered), self.vocab[self.unk_token], self.max_chars_per_word
                )
                self._buf = (ctypes.c_int * self.MAX_IDS)()

    @property
    def native_available(self) -> bool:
        return self._handle is not None

    def encode(self, text: str) -> List[int]:
        if self._handle is not None and not any(s in text for s in self.never_split):
            if "\x00" in text:
                # a NUL would terminate the C string and silently drop
                # the tail; the python path's _clean DROPS the NUL —
                # match that here
                text = text.replace("\x00", "")
            n = self._lib.wp_tokenize(
                self._handle, text.encode("utf-8", "ignore"), self._buf, self.MAX_IDS
            )
            if n >= 0:
                return list(self._buf[:n])
            # -1: non-ASCII -> Python fallback; -2: too long -> fallback
        return super().encode(text)

    def tokenize(self, text: str) -> List[str]:
        # token strings always via Python (id path is the hot one)
        return super().tokenize(text)

    def __del__(self):
        try:
            if getattr(self, "_handle", None) is not None:
                self._lib.wp_destroy(self._handle)
        except Exception:
            pass
