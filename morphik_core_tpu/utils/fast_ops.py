"""Fast host-side ops: native C++ when built, pure-Python fallback.

Mirrors the reference's fast-ops shim contract
(reference core/utils/fast_ops.py:29-304 over morphik_rust): base64 /
data-URI helpers, control-char cleaning, whitespace utilities, packed
binary quantization and Hamming distances. The native library is
native/libfastops.so (C ABI via ctypes — no pybind11 in this env).
"""

from __future__ import annotations

import base64 as _b64
import ctypes
import logging
import re
from pathlib import Path
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = Path(__file__).resolve().parents[2] / "native" / "libfastops.so"
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.b64_encode.restype = ctypes.c_size_t
        lib.b64_decode.restype = ctypes.c_size_t
        lib.clean_control_chars.restype = ctypes.c_size_t
        lib.count_tokens_whitespace.restype = ctypes.c_size_t
        lib.normalize_whitespace.restype = ctypes.c_size_t
        if hasattr(lib, "split_text"):  # absent in pre-round-2 builds
            lib.split_text.restype = ctypes.c_size_t
        _LIB = lib
        return lib
    except OSError as e:  # pragma: no cover
        logger.warning("libfastops load failed: %s", e)
        return None


def native_available() -> bool:
    return _load_lib() is not None


# ------------------------------------------------------------------ base64


def encode_base64(data: bytes) -> str:
    lib = _load_lib()
    if lib is None:
        return _b64.b64encode(data).decode("ascii")
    out = ctypes.create_string_buffer(4 * ((len(data) + 2) // 3) + 4)
    n = lib.b64_encode(data, len(data), out)
    return out.raw[:n].decode("ascii")


def decode_base64(s: str | bytes) -> bytes:
    if isinstance(s, str):
        s = s.encode("ascii")
    lib = _load_lib()
    if lib is None:
        return _b64.b64decode(s)
    out = ctypes.create_string_buffer(3 * (len(s) // 4) + 3)
    n = lib.b64_decode(s, len(s), out)
    if n == ctypes.c_size_t(-1).value:
        raise ValueError("invalid base64 input")
    return out.raw[:n]


def bytes_to_data_uri(data: bytes, mime_type: str = "image/png") -> str:
    return f"data:{mime_type};base64,{encode_base64(data)}"


def data_uri_to_bytes(uri: str) -> bytes:
    """Accepts both data URIs and raw base64 (reference fast_ops contract)."""
    if uri.startswith("data:"):
        _, _, payload = uri.partition(",")
        return decode_base64(payload)
    return decode_base64(uri)


# --------------------------------------------------------------- text utils

_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")


def clean_control_chars(text: str) -> str:
    lib = _load_lib()
    raw = text.encode("utf-8")
    if lib is None:
        return _CTRL_RE.sub("", text)
    out = ctypes.create_string_buffer(len(raw))
    n = lib.clean_control_chars(raw, len(raw), out)
    return out.raw[:n].decode("utf-8")


def count_tokens_whitespace(text: str) -> int:
    lib = _load_lib()
    raw = text.encode("utf-8")
    if lib is None:
        return len(text.split())
    return int(lib.count_tokens_whitespace(raw, len(raw)))


def normalize_whitespace(text: str) -> str:
    lib = _load_lib()
    if lib is None:
        return " ".join(text.split())
    raw = text.encode("utf-8")
    out = ctypes.create_string_buffer(len(raw))
    n = lib.normalize_whitespace(raw, len(raw), out)
    return out.raw[:n].decode("utf-8")


_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def split_sentences(text: str) -> List[str]:
    return [s for s in _SENT_RE.split(text) if s.strip()]


# --------------------------------------------------------------- binary ops


def binary_quantize_packed(x: np.ndarray) -> np.ndarray:
    """f32 (..., d) -> MSB-first packed bits (..., d//8) uint8."""
    lib = _load_lib()
    x = np.ascontiguousarray(x, dtype=np.float32)
    if x.shape[-1] % 8:
        raise ValueError("dim must be a multiple of 8")
    if lib is None:
        return np.packbits((x > 0).astype(np.uint8), axis=-1, bitorder="big")
    flat = x.reshape(-1, x.shape[-1])
    out = np.empty((flat.shape[0], x.shape[-1] // 8), dtype=np.uint8)
    lib.binary_quantize_packed(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        flat.shape[0],
        flat.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.reshape(*x.shape[:-1], -1)


def hamming_distance_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a: (len,) uint8 packed; b: (n, len) -> (n,) uint32."""
    lib = _load_lib()
    a = np.ascontiguousarray(a, dtype=np.uint8)
    b = np.ascontiguousarray(b, dtype=np.uint8)
    if lib is None:
        return np.bitwise_count(np.bitwise_xor(a[None, :], b)).sum(axis=-1).astype(np.uint32)
    out = np.empty(b.shape[0], dtype=np.uint32)
    lib.hamming_distance_batch(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        b.shape[0],
        a.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return out


# ---------------------------------------------------------------- chunking


def native_split_text(
    text: str, chunk_size: int = 6000, chunk_overlap: int = 300
) -> Optional[List[str]]:
    """Recursive character splitting via the native kernel (reference
    morphik_rust chunking.rs, fast_ops.py:102-113; 2-5x the Python
    path). Returns None when the native path doesn't apply — library
    absent, non-ASCII input (the Python splitter's "character" means
    code point, not byte), or the output bound overflowed — and the
    caller (RecursiveCharacterTextSplitter) runs its Python
    implementation. Identical outputs on the shared domain
    (tests/test_parser.py parity)."""
    lib = _load_lib()
    if lib is None or not hasattr(lib, "split_text") or not text.isascii():
        return None
    if len(text) <= chunk_size:
        return [text] if text else []
    raw = text.encode("ascii")
    n = len(raw)
    # generous bounds (pathological piece patterns can emit many small
    # chunks); the kernel checks BOTH caps and returns -1 on overflow,
    # in which case the Python path runs instead
    step = max(1, chunk_size - chunk_overlap)
    max_chunks = 4 * (n // step) + 64
    out_cap = 2 * n + max_chunks * (chunk_overlap + 4) + chunk_size
    out = ctypes.create_string_buffer(out_cap)
    lens = (ctypes.c_longlong * max_chunks)()
    count = lib.split_text(raw, n, chunk_size, chunk_overlap, out, out_cap, lens, max_chunks)
    if count == ctypes.c_size_t(-1).value:  # capacity exceeded
        return None
    buf = memoryview(out)  # .raw would copy the whole buffer PER chunk
    chunks, off = [], 0
    for i in range(count):
        ln = lens[i]
        chunks.append(bytes(buf[off : off + ln]).decode("ascii"))
        off += ln
    return chunks


def split_text(text: str, chunk_size: int = 6000, chunk_overlap: int = 300) -> List[str]:
    """Public splitter entry matching the reference fast_ops surface."""
    from morphik_core_tpu.parser.text_splitter import RecursiveCharacterTextSplitter

    return RecursiveCharacterTextSplitter(chunk_size, chunk_overlap).split_text(text)
