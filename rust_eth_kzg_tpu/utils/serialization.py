"""Byte codecs between the wire format and device limb arrays.

Mirrors the validation semantics of the reference serialization crate
(/root/reference/crates/serialization/src/lib.rs:36-140): canonical big-endian
scalars, compressed G1 points with subgroup checks, cells of 64 scalars.
Scalar byte conversion is vectorized numpy (ops/limbs.py); point codecs run on
the host (utils/bls_host.py) pending the native C++ path.
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    BYTES_PER_BLOB,
    BYTES_PER_CELL,
    BYTES_PER_FIELD_ELEMENT,
    BYTES_PER_G1_POINT,
    R_SCALAR,
)
from ..errors import SerializationError
from ..ops import field as F
from ..ops import limbs as L
from . import bls_host as bls
from . import native

FR = F.FR

# big-endian uint64 words of r, for vectorized canonicity checks
_R_WORDS = np.array(
    [(R_SCALAR >> (64 * (3 - i))) & 0xFFFFFFFFFFFFFFFF for i in range(4)],
    dtype=np.uint64,
)


def _check_canonical_scalars(raw: np.ndarray) -> None:
    """raw: [N, 32] uint8 big-endian; raises on the first non-canonical chunk."""
    words = raw.reshape(-1, 4, 8).astype(np.uint64)
    shifts = np.uint64(8) * np.arange(7, -1, -1, dtype=np.uint64)
    words = (words << shifts).sum(axis=2, dtype=np.uint64)  # [N, 4] BE words
    ge = np.ones(len(words), dtype=bool)  # lexicographic >= r
    lt = np.zeros(len(words), dtype=bool)
    for i in range(4):
        w = words[:, i]
        ge_here = ~lt & (w > _R_WORDS[i])
        lt |= ~ge_here & ~lt & (w < _R_WORDS[i])
        if i < 3:
            ge &= ~lt
        bad = ge_here
        if bad.any():
            idx = int(np.argmax(bad))
            raise SerializationError(
                f"scalar at index {idx} is not canonical (>= field modulus)"
            )
    # exact equality to r is also non-canonical
    eq = (words == _R_WORDS[None, :]).all(axis=1)
    if eq.any():
        idx = int(np.argmax(eq))
        raise SerializationError(
            f"scalar at index {idx} is not canonical (== field modulus)"
        )


def deserialize_scalars(data: bytes, expected_len: int | None = None) -> np.ndarray:
    """Bytes -> Montgomery Fr limbs [L, N], enforcing canonical encoding."""
    if len(data) % BYTES_PER_FIELD_ELEMENT != 0:
        raise SerializationError(
            f"byte length {len(data)} is not a multiple of {BYTES_PER_FIELD_ELEMENT}"
        )
    n = len(data) // BYTES_PER_FIELD_ELEMENT
    if expected_len is not None and n != expected_len:
        raise SerializationError(f"expected {expected_len} scalars, got {n}")
    raw = np.frombuffer(data, dtype=np.uint8).reshape(n, 32)
    _check_canonical_scalars(raw)
    std = L.bytes_be_to_limbs(raw, FR.nlimbs)
    # host->Montgomery on device is cheap relative to transfer; do it in numpy
    # by shifting with R (exact via the device-compatible path): use to_mont on
    # device at the call site; here return standard-form limbs.
    return std


def deserialize_blob(blob: bytes) -> np.ndarray:
    if len(blob) != BYTES_PER_BLOB:
        raise SerializationError(
            f"blob has invalid length {len(blob)}, expected {BYTES_PER_BLOB}"
        )
    return deserialize_scalars(blob)


def deserialize_cell(cell: bytes) -> np.ndarray:
    if len(cell) != BYTES_PER_CELL:
        raise SerializationError(
            f"cell has invalid length {len(cell)}, expected {BYTES_PER_CELL}"
        )
    return deserialize_scalars(cell)


def deserialize_cells_batch(cells) -> np.ndarray:
    """K cells -> [K, coset, L] standard-form limbs in ONE vectorized pass.

    One unpackbits + matmul over all K*64 scalars instead of K separate
    calls — per-call numpy overhead made the per-cell loop ~30 ms for a
    128-cell verify batch (verify hot path)."""
    cells = [bytes(c) for c in cells]
    for c in cells:
        if len(c) != BYTES_PER_CELL:
            raise SerializationError(
                f"cell has invalid length {len(c)}, expected {BYTES_PER_CELL}"
            )
    per_cell = BYTES_PER_CELL // BYTES_PER_FIELD_ELEMENT
    std = deserialize_scalars(b"".join(cells))  # [L, K*coset]
    return np.ascontiguousarray(
        std.reshape(std.shape[0], len(cells), per_cell).transpose(1, 2, 0)
    )


def serialize_scalars(std_limbs) -> bytes:
    """Canonical standard-form limbs [L, N] -> N*32 big-endian bytes."""
    return L.limbs_to_bytes_be(np.asarray(std_limbs))


def deserialize_g1(data: bytes, subgroup_check: bool = True):
    if len(data) != BYTES_PER_G1_POINT:
        raise SerializationError(
            f"G1 point has invalid length {len(data)}, expected {BYTES_PER_G1_POINT}"
        )
    try:
        return native.g1_decompress(bytes(data), subgroup_check=subgroup_check)
    except ValueError as exc:
        raise SerializationError(str(exc)) from exc


def serialize_g1(point) -> bytes:
    return bls.g1_compress(point)


def deserialize_g1_batch(points: list[bytes], subgroup_check: bool = True):
    """Batch decompression through the native library (verify hot path)."""
    for i, p in enumerate(points):
        if len(p) != BYTES_PER_G1_POINT:
            raise SerializationError(
                f"G1 point {i} has invalid length {len(p)}, expected {BYTES_PER_G1_POINT}"
            )
    try:
        return native.g1_decompress_batch([bytes(p) for p in points], subgroup_check)
    except ValueError as exc:
        raise SerializationError(str(exc)) from exc
