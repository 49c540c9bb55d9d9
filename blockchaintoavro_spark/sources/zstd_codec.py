"""Zstandard block codec for the Avro OCF via the system zstd library.

The Avro 1.12 specification's ``zstandard`` codec compresses each data
block as one zstd frame (RFC 8878), no extra framing or checksum suffix
— the last common container codec the OCF implementation
(sources/avro_io.py) was missing (r11 VERDICT "Next round" #6). CPython
ships no zstd module at 3.11, so this binds the system ``libzstd``
shared library through ``ctypes`` — the same public C API
(``ZSTD_compress`` / ``ZSTD_decompressStream``, zstd.h) every other
binding wraps. The library loads lazily per process, so executors bind
it independently inside Arrow-batched tasks exactly like any stdlib
codec; when no ``libzstd`` is installed, :func:`available` reports
``False`` and the OCF layer raises a descriptive error instead of
crashing mid-scan.

Two decode paths, both validated against the JVM (tests/test_avro.py):

- frames that DECLARE their content size (our own ``ZSTD_compress``
  output does) decode with one exact-size ``ZSTD_decompress`` call;
- frames with UNKNOWN content size — what ``CodecFactory
  .zstandardCodec()`` emits through its streaming ``ZstdOutputStream``
  — decode through the ``ZSTD_decompressStream`` loop, growing output
  a recommended-chunk at a time.

Corruption discipline matches the other codecs: every failure raises
:class:`ZstdError` (a ``ValueError``), which the OCF reader converts to
its descriptive quarantine error, and a declared content size past the
2 GiB block cap is rejected BEFORE allocation (an Avro block is bounded
by the writer's batch size — a petabyte declaration is a bomb, not
data).
"""

from __future__ import annotations

import ctypes
import threading

__all__ = [
    "ZstdError",
    "ZstdUnavailableError",
    "available",
    "compress",
    "decompress",
]

# a zstd frame whose header declares more than this for ONE Avro block
# is corruption/a decompression bomb, not data (writers batch far below)
_MAX_BLOCK = 2**31

_CONTENTSIZE_UNKNOWN = 2**64 - 1
_CONTENTSIZE_ERROR = 2**64 - 2

_LIB_NAMES = (
    "libzstd.so.1",
    "libzstd.so",
    "libzstd.1.dylib",
    "libzstd.dylib",
    "libzstd.dll",
    "zstd.dll",
)

_lock = threading.Lock()
_lib = None
_load_error: OSError | None = None


class ZstdError(ValueError):
    """Corrupt/truncated/bomb zstd data — a ``ValueError`` so the OCF
    reader's corruption-normalization treats it like every codec."""


class ZstdUnavailableError(RuntimeError):
    """No usable ``libzstd`` on this host — an ENVIRONMENT problem,
    deliberately NOT a ``ValueError``: the OCF quarantine path must
    never misclassify a missing library as file corruption."""


class _Buffer(ctypes.Structure):
    # ZSTD_inBuffer / ZSTD_outBuffer share this layout (zstd.h)
    _fields_ = [
        ("ptr", ctypes.c_void_p),
        ("size", ctypes.c_size_t),
        ("pos", ctypes.c_size_t),
    ]


def _bind(lib) -> None:
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
    lib.ZSTD_compress.restype = ctypes.c_size_t
    lib.ZSTD_compress.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
    ]
    lib.ZSTD_decompress.restype = ctypes.c_size_t
    lib.ZSTD_decompress.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.ZSTD_isError.restype = ctypes.c_uint
    lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
    lib.ZSTD_getErrorName.restype = ctypes.c_char_p
    lib.ZSTD_getErrorName.argtypes = [ctypes.c_size_t]
    lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
    lib.ZSTD_getFrameContentSize.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.ZSTD_createDCtx.restype = ctypes.c_void_p
    lib.ZSTD_freeDCtx.argtypes = [ctypes.c_void_p]
    lib.ZSTD_DStreamOutSize.restype = ctypes.c_size_t
    lib.ZSTD_decompressStream.restype = ctypes.c_size_t
    lib.ZSTD_decompressStream.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(_Buffer),
        ctypes.POINTER(_Buffer),
    ]


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    with _lock:
        if _lib is not None or _load_error is not None:
            return _lib
        last: OSError | None = None
        for name in _LIB_NAMES:
            try:
                lib = ctypes.CDLL(name)
                _bind(lib)
                _lib = lib
                return lib
            except (OSError, AttributeError) as e:
                last = e if isinstance(e, OSError) else OSError(str(e))
        _load_error = last or OSError("no libzstd candidate found")
        return None


def available() -> bool:
    """Whether a usable system ``libzstd`` was found — gate zstandard
    OCF work on this instead of letting a scan die mid-job."""
    return _load() is not None


def _require():
    lib = _load()
    if lib is None:
        raise ZstdUnavailableError(
            "zstandard codec needs the system zstd library "
            f"(tried {', '.join(_LIB_NAMES)}): {_load_error}"
        )
    return lib


def _check(lib, code: int) -> int:
    if lib.ZSTD_isError(code):
        raise ZstdError(lib.ZSTD_getErrorName(code).decode("ascii"))
    return code


def compress(data: bytes, level: int = 3) -> bytes:
    """One zstd frame for one Avro block (content size declared in the
    frame header, so our own files decode on the exact-size fast
    path). Level 3 is zstd's default speed/ratio point."""
    lib = _require()
    bound = lib.ZSTD_compressBound(len(data))
    dst = ctypes.create_string_buffer(bound)
    n = _check(
        lib,
        lib.ZSTD_compress(
            ctypes.cast(dst, ctypes.c_void_p), bound, data, len(data), level
        ),
    )
    return dst.raw[:n]


def decompress(data: bytes) -> bytes:
    """Decode one zstd frame sequence (an Avro block's payload).
    Known-content-size frames decode in one call; unknown-size frames
    (the JVM's streaming writer) run the ``ZSTD_decompressStream``
    loop. Raises :class:`ZstdError` on any corruption, truncation, or
    an implausible declared size."""
    lib = _require()
    size = lib.ZSTD_getFrameContentSize(data, len(data))
    if size == _CONTENTSIZE_ERROR:
        raise ZstdError("not a zstd frame (bad magic or header)")
    if size != _CONTENTSIZE_UNKNOWN:
        if size > _MAX_BLOCK:
            raise ZstdError(
                f"declared frame content size {size} exceeds the "
                f"{_MAX_BLOCK}-byte block cap (corrupt or a bomb)"
            )
        size = int(size)
        if size == 0:
            # a frame can still carry trailing garbage; validate fully
            n = _check(lib, lib.ZSTD_decompress(None, 0, data, len(data)))
            return b""
        out = ctypes.create_string_buffer(size)
        n = _check(
            lib,
            lib.ZSTD_decompress(
                ctypes.cast(out, ctypes.c_void_p), size, data, len(data)
            ),
        )
        if n != size:
            raise ZstdError(
                f"frame decoded to {n} bytes but declared {size}"
            )
        return out.raw[:n]

    # streaming path: unknown content size
    dctx = lib.ZSTD_createDCtx()
    if not dctx:
        raise ZstdError("ZSTD_createDCtx failed")
    try:
        chunk = lib.ZSTD_DStreamOutSize()
        src = ctypes.create_string_buffer(data, len(data))
        inb = _Buffer(ctypes.cast(src, ctypes.c_void_p), len(data), 0)
        outbuf = ctypes.create_string_buffer(chunk)
        parts: list[bytes] = []
        total = 0
        ret = 0
        while True:
            outb = _Buffer(ctypes.cast(outbuf, ctypes.c_void_p), chunk, 0)
            before = (inb.pos, outb.pos)
            ret = _check(
                lib,
                lib.ZSTD_decompressStream(
                    dctx, ctypes.byref(outb), ctypes.byref(inb)
                ),
            )
            if outb.pos:
                total += outb.pos
                if total > _MAX_BLOCK:
                    raise ZstdError(
                        f"frame exceeds the {_MAX_BLOCK}-byte block cap "
                        "(corrupt or a bomb)"
                    )
                parts.append(outbuf.raw[: outb.pos])
            if inb.pos >= inb.size:
                break
            if (inb.pos, outb.pos) == before:
                raise ZstdError("no progress decoding zstd stream")
        if ret != 0:
            raise ZstdError("truncated zstd frame")
        return b"".join(parts)
    finally:
        lib.ZSTD_freeDCtx(dctx)
