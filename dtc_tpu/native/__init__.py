"""ctypes bindings for the native runtime library, with pure-python fallback.

`lib()` lazily builds (make) and loads libdtc_native.so; every entry point
has a numpy fallback so the package works without a toolchain. See
src/dtc_native.cpp for what lives natively and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import zlib

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "build", "libdtc_native.so")
_lib = None
_tried = False


def lib():
    """The loaded CDLL, building it on first use; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO):
            subprocess.run(["make", "-C", _HERE], check=True,
                           capture_output=True, timeout=120)
        l = ctypes.CDLL(_SO)
        l.dtc_crc32.restype = ctypes.c_uint32
        l.dtc_crc32.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        l.dtc_z_expectations.restype = ctypes.c_int
        l.dtc_bit_histogram.restype = ctypes.c_int64
        l.dtc_generate_disorder.restype = ctypes.c_int
        l.dtc_journal_append.restype = ctypes.c_int
        _lib = l
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return lib() is not None


def crc32(data: bytes) -> int:
    l = lib()
    if l is None:
        return zlib.crc32(data) & 0xFFFFFFFF
    return int(l.dtc_crc32(data, len(data)))


def z_expectations(bits: np.ndarray) -> np.ndarray:
    """bits (shots, nq) uint8 -> (nq,) <Z_q>."""
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    shots, nq = bits.shape
    l = lib()
    if l is None:
        return 1.0 - 2.0 * bits.mean(axis=0)
    out = np.empty(nq, dtype=np.float64)
    rc = l.dtc_z_expectations(
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(shots), ctypes.c_int32(nq),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise RuntimeError("dtc_z_expectations failed")
    return out


def bit_histogram(bits: np.ndarray, max_entries: int = 4096):
    """bits (shots, nq<=64) -> {little-endian bitstring: count}."""
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    shots, nq = bits.shape
    l = lib()
    if l is not None and nq <= 64:
        keys = np.empty(max_entries, dtype=np.uint64)
        counts = np.empty(max_entries, dtype=np.int64)
        n = l.dtc_bit_histogram(
            bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(shots), ctypes.c_int32(nq),
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.c_int64(max_entries))
        if n >= 0:
            # key bit q = qubit q; bitstring is little-endian (qubit 0 =
            # rightmost char), which is exactly MSB-first binary formatting
            return {format(int(keys[i]), f"0{nq}b"): int(counts[i])
                    for i in range(n)}
    # fallback / overflow: python dict
    out: dict[str, int] = {}
    for row in bits:
        key = "".join(str(int(b)) for b in reversed(row))
        out[key] = out.get(key, 0) + 1
    return out


def generate_disorder_native(seed: int, L: int, inst: int, *,
                             phi_amplitude=1.0, phi_delta=0.0, randomphi=1):
    """xoshiro256** batch disorder sampler (native fast path; distribution
    matches dtc_tpu.io.disorder.generate_disorder but NOT bit-identical to
    the numpy default_rng stream)."""
    l = lib()
    hs = np.empty((inst, L), dtype=np.float64)
    phis = np.empty((inst, L - 1), dtype=np.float64)
    if l is None:
        from dtc_tpu.io.disorder import generate_disorder

        return generate_disorder(L, inst, phi_amplitude=phi_amplitude,
                                 phi_delta=phi_delta, randomphi=randomphi,
                                 seed=seed)
    rc = l.dtc_generate_disorder(
        ctypes.c_uint64(seed), ctypes.c_int32(L), ctypes.c_int32(inst),
        ctypes.c_double(phi_amplitude), ctypes.c_double(phi_delta),
        ctypes.c_int32(randomphi),
        hs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        phis.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise RuntimeError("dtc_generate_disorder failed")
    return hs, phis


def journal_append(path: str, key: str, data: bytes, flush: bool = True):
    l = lib()
    if l is not None:
        rc = l.dtc_journal_append(path.encode(), key.encode(), data,
                                  ctypes.c_uint64(len(data)),
                                  ctypes.c_int32(1 if flush else 0))
        if rc != 0:
            raise RuntimeError(f"journal append failed ({rc})")
        return
    import struct

    with open(path, "ab") as f:
        f.write(b"DTCJ")
        f.write(struct.pack("<IQI", len(key.encode()), len(data),
                            zlib.crc32(data) & 0xFFFFFFFF))
        f.write(key.encode())
        f.write(data)
        if flush:
            f.flush()


def journal_read(path: str):
    """Yield (key, data) records; stops cleanly at the first torn/corrupt
    record (crash safety)."""
    import struct

    if not os.path.exists(path):
        return []
    out = []
    with open(path, "rb") as f:
        blob = f.read()
    off = 0
    while off + 20 <= len(blob):
        if blob[off : off + 4] != b"DTCJ":
            break
        keylen, datalen, crc = struct.unpack_from("<IQI", blob, off + 4)
        start = off + 20
        end = start + keylen + datalen
        if end > len(blob):
            break
        key = blob[start : start + keylen].decode(errors="replace")
        data = blob[start + keylen : end]
        if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
            break
        out.append((key, data))
        off = end
    return out
