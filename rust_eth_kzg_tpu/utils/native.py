"""ctypes bindings to the native host library (csrc/kzg_host.cpp).

Provides fast G1/G2 decompression with subgroup checks and multi-pairing
checks. Builds the .so on first use if g++ is available; every entry point
falls back to the pure-Python bls_host implementation when the native library
is missing, so the package works in minimal environments.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

from . import bls_host as bls

_CSRC = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "csrc"))
_SO_PATH = os.path.join(_CSRC, "libkzg_host.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        src = os.path.join(_CSRC, "kzg_host.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC", "-o", _SO_PATH, src],
                    check=True,
                    capture_output=True,
                    timeout=300,
                )
            except (OSError, subprocess.SubprocessError):
                return None
        else:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.kzg_g1_decompress.restype = ctypes.c_int
    lib.kzg_g1_decompress_batch.restype = ctypes.c_int
    lib.kzg_g2_decompress.restype = ctypes.c_int
    lib.kzg_pairing_check.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


_ERRORS = {
    -1: "uncompressed G1 encodings are not accepted",
    -2: "invalid infinity encoding",
    -3: "coordinate not canonical",
    -4: "x coordinate not on curve",
    -5: "point not in the prime-order subgroup",
}


def g1_decompress(data: bytes, subgroup_check: bool = True):
    """48 bytes -> affine (x, y) ints or None (identity); raises ValueError."""
    lib = _load()
    if lib is None:
        return bls.g1_decompress(data, subgroup_check)
    if len(data) != 48:
        raise ValueError(f"G1 point must be 48 bytes, got {len(data)}")
    out = ctypes.create_string_buffer(96)
    rc = lib.kzg_g1_decompress(bytes(data), out, int(subgroup_check))
    if rc == 2:
        return None
    if rc != 0:
        raise ValueError(_ERRORS.get(rc, f"invalid G1 point (code {rc})"))
    raw = out.raw
    return (int.from_bytes(raw[:48], "big"), int.from_bytes(raw[48:], "big"))


def g1_decompress_batch(points: list[bytes], subgroup_check: bool = True):
    """Batch decompression; raises ValueError naming the first bad index."""
    lib = _load()
    if lib is None:
        return [bls.g1_decompress(p, subgroup_check) for p in points]
    n = len(points)
    if n == 0:
        return []
    for i, p in enumerate(points):
        if len(p) != 48:
            raise ValueError(f"G1 point {i} must be 48 bytes, got {len(p)}")
    buf_in = b"".join(bytes(p) for p in points)
    out = ctypes.create_string_buffer(96 * n)
    inf = ctypes.create_string_buffer(n)
    bad = ctypes.c_size_t(0)
    rc = lib.kzg_g1_decompress_batch(
        buf_in, n, out, inf, int(subgroup_check), ctypes.byref(bad)
    )
    if rc != 0:
        raise ValueError(
            f"point {bad.value}: " + _ERRORS.get(rc, f"invalid G1 point ({rc})")
        )
    raw = out.raw
    result = []
    for i in range(n):
        if inf.raw[i]:
            result.append(None)
        else:
            off = 96 * i
            result.append(
                (
                    int.from_bytes(raw[off : off + 48], "big"),
                    int.from_bytes(raw[off + 48 : off + 96], "big"),
                )
            )
    return result


def g2_decompress(data: bytes, subgroup_check: bool = True):
    lib = _load()
    if lib is None:
        return bls.g2_decompress(data, subgroup_check)
    if len(data) != 96:
        raise ValueError(f"G2 point must be 96 bytes, got {len(data)}")
    out = ctypes.create_string_buffer(192)
    rc = lib.kzg_g2_decompress(bytes(data), out, int(subgroup_check))
    if rc == 2:
        return None
    if rc != 0:
        raise ValueError(_ERRORS.get(rc, f"invalid G2 point (code {rc})"))
    raw = out.raw
    c = [int.from_bytes(raw[48 * i : 48 * (i + 1)], "big") for i in range(4)]
    return ((c[0], c[1]), (c[2], c[3]))


def multi_pairings(pairs) -> bool:
    """prod e(P_i, Q_i) == 1 for host affine int points (None = identity)."""
    lib = _load()
    if lib is None:
        return bls.multi_pairings(pairs)
    live = [(p, q) for p, q in pairs if p is not None and q is not None]
    if not live:
        return True
    n = len(live)
    g1_buf = b"".join(
        p[0].to_bytes(48, "big") + p[1].to_bytes(48, "big") for p, _ in live
    )
    g2_buf = b"".join(
        q[0][0].to_bytes(48, "big")
        + q[0][1].to_bytes(48, "big")
        + q[1][0].to_bytes(48, "big")
        + q[1][1].to_bytes(48, "big")
        for _, q in live
    )
    rc = lib.kzg_pairing_check(g1_buf, g2_buf, None, n)
    if rc < 0:
        raise ValueError(f"malformed pairing input (code {rc})")
    return rc == 1
