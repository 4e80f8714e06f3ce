"""Pin the native (C++) pairing against the pure-Python oracle.

Verdict r3 item 4: the round-3 pairing rewrite (csrc/kzg_host.cpp — projective
Miller loop, Granger-Scott cyclotomic squarings, addition-chain final exp) had
only indirect coverage through the spec verify vectors. These tests exercise
it directly: the in-library selftest, and `native.multi_pairings` vs
`bls_host.multi_pairings` on random points including negative cases.

Host-only (no jax); skipped cleanly if the native library cannot build.
"""

import ctypes
import random

import pytest

from rust_eth_kzg_tpu.constants import R_SCALAR
from rust_eth_kzg_tpu.utils import bls_host as bls
from rust_eth_kzg_tpu.utils import native

random.seed(99)

from rust_eth_kzg_tpu import constants

pytestmark = [
    pytest.mark.skipif(
        not native.available(), reason="native kzg_host library not available"
    ),
    pytest.mark.skipif(
        constants.FIELD != "bls12_381",
        reason="pairings are BLS12-381 only (no tiny-field analog)",
    ),
]


def _rand_g1():
    return bls.g1_mul(bls.G1_GEN, random.randrange(1, R_SCALAR))


def _rand_g2():
    return bls.g2_mul(bls.G2_GEN, random.randrange(1, R_SCALAR))


def _g1_bytes(p):
    return p[0].to_bytes(48, "big") + p[1].to_bytes(48, "big")


def _g2_bytes(q):
    return (
        q[0][0].to_bytes(48, "big")
        + q[0][1].to_bytes(48, "big")
        + q[1][0].to_bytes(48, "big")
        + q[1][1].to_bytes(48, "big")
    )


def test_cpp_selftest():
    """fp12 cyclotomic squaring + addition-chain final exp vs plain versions."""
    lib = ctypes.CDLL(native._SO_PATH)
    lib.kzg_pairing_selftest.restype = ctypes.c_int
    rc = lib.kzg_pairing_selftest(_g1_bytes(_rand_g1()), _g2_bytes(_rand_g2()))
    assert rc == 1, f"kzg_pairing_selftest failed (rc={rc})"


def test_multi_pairings_vs_oracle_positive():
    # e(aP, Q) * e(-P, aQ) == 1
    for _ in range(3):
        a = random.randrange(1, R_SCALAR)
        p = _rand_g1()
        q = _rand_g2()
        pairs = [
            (bls.g1_mul(p, a), q),
            (bls.g1_neg(p), bls.g2_mul(q, a)),
        ]
        assert native.multi_pairings(pairs) is True
        assert bls.multi_pairings(pairs) is True


def test_multi_pairings_vs_oracle_negative():
    # perturb one scalar: product != 1, both implementations must agree
    a = random.randrange(1, R_SCALAR)
    p = _rand_g1()
    q = _rand_g2()
    pairs = [
        (bls.g1_mul(p, a + 1), q),
        (bls.g1_neg(p), bls.g2_mul(q, a)),
    ]
    assert native.multi_pairings(pairs) is False
    assert bls.multi_pairings(pairs) is False


def test_multi_pairings_identity_lanes():
    # identity entries are skipped; an all-identity product is the unit
    assert native.multi_pairings([(None, bls.G2_GEN), (bls.G1_GEN, None)]) is True


def test_single_pairing_bilinearity():
    # e(2P, Q) == e(P, 2Q): check via e(2P, Q) * e(-P, 2Q) == 1
    p = _rand_g1()
    q = _rand_g2()
    pairs = [
        (bls.g1_add(p, p), q),
        (bls.g1_neg(p), bls.g2_add(q, q)),
    ]
    assert native.multi_pairings(pairs) is True
