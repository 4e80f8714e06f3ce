"""Host <-> device conversions between big integers and 15-bit limb arrays.

Device representation (see ops/field.py): an element of a prime field is a
vector of `L` limbs in radix 2^15, stored **limb-major** — arrays are shaped
`[L, *batch]` so that the batch axis rides the TPU's 128-wide vector lanes
and the limb axis is the cheap-to-pad second-minor dimension.
"""

from __future__ import annotations

import numpy as np

from ..constants import LIMB_BITS, LIMB_MASK


def int_to_limbs(value: int, nlimbs: int) -> np.ndarray:
    """One big int -> [nlimbs] int32."""
    out = np.empty(nlimbs, dtype=np.int32)
    for j in range(nlimbs):
        out[j] = value & LIMB_MASK
        value >>= LIMB_BITS
    if value:
        raise ValueError("value does not fit in the given number of limbs")
    return out


def ints_to_limbs(values, nlimbs: int) -> np.ndarray:
    """Sequence of ints -> [nlimbs, N] int32 (limb-major)."""
    out = np.empty((nlimbs, len(values)), dtype=np.int32)
    for i, v in enumerate(values):
        for j in range(nlimbs):
            out[j, i] = v & LIMB_MASK
            v >>= LIMB_BITS
        if v:
            raise ValueError("value does not fit in the given number of limbs")
    return out


def limbs_to_int(limbs) -> int:
    """[nlimbs] -> int (works for any per-limb magnitudes, signed included)."""
    value = 0
    for j, limb in enumerate(np.asarray(limbs).tolist()):
        value += int(limb) << (LIMB_BITS * j)
    return value


def limbs_to_ints(limbs) -> list:
    """[nlimbs, N] -> list of N ints."""
    arr = np.asarray(limbs)
    return [limbs_to_int(arr[:, i]) for i in range(arr.shape[1])]


# --- vectorized 32-byte big-endian scalar <-> limb conversion ---

_BIT_WEIGHTS = (1 << np.arange(LIMB_BITS, dtype=np.int64)).astype(np.int32)


def bytes_be_to_limbs(data: bytes | np.ndarray, nlimbs: int) -> np.ndarray:
    """[N*32] big-endian bytes -> [nlimbs, N] int32, fully vectorized."""
    raw = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else data
    raw = raw.reshape(-1, 32)
    bits_be = np.unpackbits(raw, axis=1)  # [N, 256], MSB first
    bits_le = bits_be[:, ::-1]  # LSB first
    total_bits = nlimbs * LIMB_BITS
    pad = total_bits - 256
    if pad < 0:
        # narrow fields (the tiny test curve): values must fit the limbs
        if bits_le[:, total_bits:].any():
            raise ValueError("scalar does not fit in the given limb count")
        bits_le = bits_le[:, :total_bits]
    else:
        bits_le = np.pad(bits_le, ((0, 0), (0, pad)))
    groups = bits_le.reshape(-1, nlimbs, LIMB_BITS).astype(np.int32)
    limbs = groups @ _BIT_WEIGHTS  # [N, nlimbs]
    return np.ascontiguousarray(limbs.T)


def limbs_to_bytes_be(limbs: np.ndarray) -> bytes:
    """[nlimbs, N] canonical limbs (< 2^15, value < 2^256) -> N*32 bytes."""
    arr = np.asarray(limbs).T.astype(np.int64)  # [N, nlimbs]
    n, nlimbs = arr.shape
    bits_le = ((arr[:, :, None] >> np.arange(LIMB_BITS)) & 1).astype(np.uint8)
    bits_le = bits_le.reshape(n, nlimbs * LIMB_BITS)
    if bits_le.shape[1] < 256:  # narrow fields (tiny test curve)
        bits_le = np.pad(bits_le, ((0, 0), (0, 256 - bits_le.shape[1])))
    bits_le = bits_le[:, :256]
    bits_be = bits_le[:, ::-1]
    return np.packbits(bits_be, axis=1).tobytes()
