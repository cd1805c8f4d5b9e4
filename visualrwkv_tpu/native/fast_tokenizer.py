"""ctypes binding for the native C++ trie tokenizer.

Compiles ``tokenizer.cpp`` with g++ on first use (cached under
``~/.cache/visualrwkv_tpu``) and exposes encode/decode with the same
semantics as the pure-Python :class:`~visualrwkv_tpu.data.tokenizer.WorldTokenizer`.
Falls back transparently if no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from pathlib import Path
from typing import List, Optional

log = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "tokenizer.cpp"
_CACHE = Path(os.environ.get("VISUALRWKV_CACHE", Path.home() / ".cache" / "visualrwkv_tpu"))


def _build_library() -> Optional[Path]:
    _CACHE.mkdir(parents=True, exist_ok=True)
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:12]
    lib = _CACHE / f"libworldtok_{tag}.so"
    if lib.exists():
        return lib
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(lib)],
            check=True, capture_output=True, timeout=120,
        )
        return lib
    except Exception as e:  # compiler missing / failed
        log.warning("native tokenizer build failed (%s); using pure python", e)
        return None


def _write_binary_vocab(idx2token: dict, path: Path) -> None:
    import struct

    with open(path, "wb") as f:
        for idx, tok in idx2token.items():
            f.write(struct.pack("<ii", idx, len(tok)))
            f.write(tok)


class FastWorldTokenizer:
    """Native-accelerated tokenizer; same greedy-longest-match semantics."""

    def __init__(self, idx2token: dict):
        lib_path = _build_library()
        if lib_path is None:
            raise RuntimeError("native tokenizer unavailable")
        vocab_tag = hashlib.sha256(
            b"".join(tok for _, tok in sorted(idx2token.items()))
        ).hexdigest()[:12]
        bin_vocab = _CACHE / f"vocab_{vocab_tag}.bin"
        if not bin_vocab.exists():
            _write_binary_vocab(idx2token, bin_vocab)

        self._lib = ctypes.CDLL(str(lib_path))
        self._lib.tok_create.restype = ctypes.c_void_p
        self._lib.tok_create.argtypes = [ctypes.c_char_p]
        self._lib.tok_encode.restype = ctypes.c_int32
        self._lib.tok_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        self._lib.tok_decode.restype = ctypes.c_int32
        self._lib.tok_decode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int32,
        ]
        self._lib.tok_destroy.argtypes = [ctypes.c_void_p]
        self._handle = self._lib.tok_create(str(bin_vocab).encode())
        if not self._handle:
            raise RuntimeError("tok_create failed")

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.tok_destroy(handle)

    def encode_bytes(self, src: bytes) -> List[int]:
        cap = max(16, len(src) + 8)
        out = (ctypes.c_int32 * cap)()
        n = self._lib.tok_encode(self._handle, src, len(src), out, cap)
        if n == -2:
            raise ValueError("unencodable byte")
        assert n >= 0
        return list(out[:n])

    def encode(self, text: str) -> List[int]:
        return self.encode_bytes(text.encode("utf-8"))

    def decode_bytes(self, ids) -> bytes:
        ids = list(int(i) for i in ids)
        cap = max(16, 32 * len(ids) + 16)
        arr = (ctypes.c_int32 * len(ids))(*ids)
        out = ctypes.create_string_buffer(cap)
        n = self._lib.tok_decode(self._handle, arr, len(ids), out, cap)
        while n == -1:  # rare: very long tokens
            cap *= 4
            out = ctypes.create_string_buffer(cap)
            n = self._lib.tok_decode(self._handle, arr, len(ids), out, cap)
        if n == -2:
            raise ValueError("unknown token id")
        return out.raw[:n]

    def decode(self, ids) -> str:
        return self.decode_bytes(ids).decode("utf-8", errors="replace")
