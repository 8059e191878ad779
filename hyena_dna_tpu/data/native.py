"""ctypes bindings for the native (C++) data-path library.

See `native/hyena_data.cpp` — fused FASTA fetch + tokenize + reverse
complement + padding. The library is built on demand with `make` (g++); all
call sites fall back to the pure-numpy implementations when the build or
load fails, so the native path is a pure accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libhyena_data.so"
_lib = None
_load_attempted = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def load_library(build: bool = True):
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists() and build and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.fasta_open.restype = ctypes.c_void_p
    lib.fasta_open.argtypes = [ctypes.c_char_p]
    lib.fasta_close.argtypes = [ctypes.c_void_p]
    lib.fasta_length.restype = ctypes.c_int64
    lib.fasta_length.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.fasta_fetch_tokens.restype = ctypes.c_int64
    lib.fasta_fetch_tokens.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.tokenize_bytes.restype = ctypes.c_int64
    lib.tokenize_bytes.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return _lib


class NativeFasta:
    """Native handle over an indexed fasta; one per (file, process)."""

    def __init__(self, path: str | Path):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        # ensure a .fai exists (the numpy indexer writes one)
        fai = Path(str(path) + ".fai")
        if not fai.exists():
            from hyena_dna_tpu.data.fasta import FastaFile

            FastaFile(path).close()
        self._lib = lib
        self._handle = lib.fasta_open(str(path).encode())
        if not self._handle:
            raise RuntimeError(f"fasta_open failed for {path}")

    def length(self, name: str) -> int:
        n = self._lib.fasta_length(self._handle, name.encode())
        if n < 0:
            raise KeyError(name)
        return n

    def fetch_tokens(
        self,
        name: str,
        start: int,
        end: int,
        out_len: int,
        *,
        add_eos: bool = False,
        rc: bool = False,
        pad_left: bool = True,
        uppercase: bool = True,
    ) -> np.ndarray:
        """Fused fetch+tokenize into a fresh (out_len,) int32 array."""
        out = np.empty(out_len, dtype=np.int32)
        real = self._lib.fasta_fetch_tokens(
            self._handle, name.encode(), start, end,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), out_len,
            int(add_eos), int(rc), int(pad_left), int(uppercase),
        )
        if real < 0:
            raise KeyError(name)
        return out

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.fasta_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def tokenize(
    text: str | bytes,
    out_len: int,
    *,
    add_eos: bool = False,
    pad_left: bool = True,
    uppercase: bool = True,
) -> Optional[np.ndarray]:
    """Native string tokenization; None when the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    data = text.encode("latin-1") if isinstance(text, str) else text
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(out_len, dtype=np.int32)
    lib.tokenize_bytes(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), out_len,
        int(add_eos), int(pad_left), int(uppercase),
    )
    return out
