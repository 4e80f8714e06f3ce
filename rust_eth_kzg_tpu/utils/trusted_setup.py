"""Trusted setup loading.

Mirrors the reference's `TrustedSetup` (/root/reference/crates/trusted_setup/src/lib.rs:8-124):
the embedded mainnet JSON (4096 G1 monomial points + 65 G2 monomial points), with a
checked parse path (`from_json`) and an unchecked default. `g1_lagrange`, when present
in the JSON, is ignored just like the reference does (lib.rs:111).

Because decompressing 4161 points in Python costs seconds, the default setup caches the
decompressed affine integer coordinates in an .npz alongside the JSON; the cache is
keyed by a hash of the JSON so it can never go stale.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

import numpy as np

from . import bls_host as bls

_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data")
_SETUP_JSON_PATH = os.path.abspath(os.path.join(_DATA_DIR, "trusted_setup_4096.json"))


@dataclass(frozen=True)
class TrustedSetup:
    """Affine points over Python ints: G1 as (x, y) tuples, G2 as Fp2-pair tuples."""

    g1_monomial: list
    g2_monomial: list

    @staticmethod
    def from_json(json_str: str) -> "TrustedSetup":
        """Parse with subgroup checks (slow path)."""
        return _parse(json_str, subgroup_check=True)

    @staticmethod
    def from_json_unchecked(json_str: str) -> "TrustedSetup":
        """Parse without subgroup checks (on-curve checks still apply)."""
        return _parse(json_str, subgroup_check=False)

    @staticmethod
    def default() -> "TrustedSetup":
        """The embedded mainnet setup, decompressed via the npz cache."""
        with open(_SETUP_JSON_PATH) as fh:
            raw = fh.read()
        digest = hashlib.sha256(raw.encode()).hexdigest()[:16]
        cache_path = os.path.join(
            os.path.dirname(_SETUP_JSON_PATH), f"setup_cache_{digest}.npz"
        )
        if os.path.exists(cache_path):
            return _load_cache(cache_path)
        setup = _parse(raw, subgroup_check=False)
        _save_cache(cache_path, setup)
        return setup


def _parse(json_str: str, subgroup_check: bool) -> TrustedSetup:
    data = json.loads(json_str)
    g1 = [
        bls.g1_decompress(_hex_bytes(h, 48), subgroup_check=subgroup_check)
        for h in data["g1_monomial"]
    ]
    g2 = [
        bls.g2_decompress(_hex_bytes(h, 96), subgroup_check=subgroup_check)
        for h in data["g2_monomial"]
    ]
    return TrustedSetup(g1_monomial=g1, g2_monomial=g2)


def _hex_bytes(hex_str: str, expect_len: int) -> bytes:
    if not hex_str.startswith("0x"):
        raise ValueError("expected hex points to be prefixed with `0x`")
    raw = bytes.fromhex(hex_str[2:])
    if len(raw) != expect_len:
        raise ValueError(f"expected {expect_len} bytes, got {len(raw)}")
    return raw


def _int_array_to_rows(values, width=13):
    """Pack big ints into uint32 rows of 30-bit limbs (width 13 covers 390 bits)."""
    out = np.zeros((len(values), width), dtype=np.uint64)
    for i, v in enumerate(values):
        for j in range(width):
            out[i, j] = (v >> (30 * j)) & 0x3FFFFFFF
    return out.astype(np.uint32)


def _rows_to_int_list(rows):
    out = []
    for row in rows:
        v = 0
        for j, limb in enumerate(row.astype(np.uint64)):
            v |= int(limb) << (30 * j)
        out.append(v)
    return out


def _save_cache(path: str, setup: TrustedSetup) -> None:
    g1x = _int_array_to_rows([p[0] for p in setup.g1_monomial])
    g1y = _int_array_to_rows([p[1] for p in setup.g1_monomial])
    g2 = _int_array_to_rows(
        [c for p in setup.g2_monomial for c in (p[0][0], p[0][1], p[1][0], p[1][1])]
    )
    tmp = path + ".tmp"
    np.savez(tmp, g1x=g1x, g1y=g1y, g2=g2)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def _load_cache(path: str) -> TrustedSetup:
    data = np.load(path)
    g1x = _rows_to_int_list(data["g1x"])
    g1y = _rows_to_int_list(data["g1y"])
    g1 = list(zip(g1x, g1y))
    flat = _rows_to_int_list(data["g2"])
    g2 = [
        ((flat[i], flat[i + 1]), (flat[i + 2], flat[i + 3]))
        for i in range(0, len(flat), 4)
    ]
    return TrustedSetup(g1_monomial=g1, g2_monomial=g2)
