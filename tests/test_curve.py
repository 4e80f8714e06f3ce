"""Batched G1 device ops vs the pure-Python host oracle."""

import random

import jax.numpy as jnp
import numpy as np

from rust_eth_kzg_tpu.constants import R_SCALAR
from rust_eth_kzg_tpu.ops import curve as C
from rust_eth_kzg_tpu.utils import bls_host as B

random.seed(7)


def rand_points(n):
    return [B.g1_mul(B.G1_GEN, random.randrange(1, R_SCALAR)) for _ in range(n)]


def bits_msb(scalars, nbits=256):
    out = np.zeros((nbits, len(scalars)), dtype=bool)
    for i, s in enumerate(scalars):
        for t in range(nbits):
            out[t, i] = (s >> (nbits - 1 - t)) & 1
    return jnp.asarray(out)


def test_add_double_vs_oracle():
    n = 8
    ps = rand_points(n)
    qs = rand_points(n)
    # exercise the complete-formula edge cases in dedicated lanes
    ps[0], qs[0] = None, None  # inf + inf
    ps[1] = None  # inf + q
    qs[2] = None  # p + inf
    qs[3] = ps[3]  # p + p (doubling through add)
    qs[4] = B.g1_neg(ps[4])  # p + (-p) = inf
    dp, dq = C.points_to_device(ps), C.points_to_device(qs)
    got = C.points_from_device(C.add(dp, dq))
    want = [B.g1_add(p, q) for p, q in zip(ps, qs)]
    assert got == want
    got_dbl = C.points_from_device(C.double(dp))
    want_dbl = [B.g1_double(p) for p in ps]
    assert got_dbl == want_dbl


def test_add_mixed_vs_oracle():
    n = 6
    ps = rand_points(n)
    qs = rand_points(n)
    ps[0] = None
    qs[1] = None  # affine identity lane must pass p through
    qs[2] = ps[2]
    dp = C.points_to_device(ps)
    qa = C.affine_to_device(qs)
    got = C.points_from_device(C.add_mixed(dp, qa))
    want = [B.g1_add(p, q) for p, q in zip(ps, qs)]
    assert got == want


def test_scalar_mul_and_reduce_sum():
    n = 6
    ps = rand_points(n)
    ks = [0, 1, 2, R_SCALAR - 1, random.randrange(R_SCALAR), random.randrange(R_SCALAR)]
    dp = C.points_to_device(ps)
    got = C.points_from_device(C.scalar_mul(dp, bits_msb(ks)))
    want = [B.g1_mul(p, k) for p, k in zip(ps, ks)]
    assert got == want

    total = C.points_from_device(
        C.reduce_sum(C.G1(*(c[:, :, None] for c in dp)), axis=1)
    )[0]
    want_total = None
    for p in ps:
        want_total = B.g1_add(want_total, p)
    assert total == want_total


def test_equal_and_identity():
    ps = rand_points(3) + [None]
    dp = C.points_to_device(ps)
    assert np.asarray(C.is_identity(dp)).tolist() == [False, False, False, True]
    assert np.asarray(C.equal(dp, dp)).all()
    # doubled point equals oracle-doubled point in different projective scaling
    d2 = C.double(dp)
    aff = C.points_to_device([B.g1_double(p) for p in ps])
    assert np.asarray(C.equal(d2, aff)).all()


def test_glv_scalar_mul():
    import jax.numpy as jnp

    n = 5
    ps = rand_points(n)
    ps[0] = None
    ks = [0, 1, R_SCALAR - 1, C.GLV_LAMBDA, random.randrange(R_SCALAR)]
    b1, n1, b2, n2 = C.glv_bits_host(ks)
    got = C.points_from_device(
        C.scalar_mul_glv(
            C.points_to_device(ps),
            jnp.asarray(b1), jnp.asarray(n1), jnp.asarray(b2), jnp.asarray(n2),
        )
    )
    want = [B.g1_mul(p, k) if p else None for p, k in zip(ps, ks)]
    assert got == want


def test_add_affine_vs_oracle():
    n = 8
    ps = rand_points(n)
    qs = rand_points(n)
    # supported exception lanes (equal non-identity points are excluded by
    # contract — see curve.add_affine_values)
    ps[0], qs[0] = None, None  # inf + inf
    ps[1] = None  # inf + q
    qs[2] = None  # p + inf
    qs[3] = B.g1_neg(ps[3])  # p + (-p) = inf
    pa, qa = C.affine_to_device(ps), C.affine_to_device(qs)
    got = C.points_from_device(C.add_affine(pa, qa))
    want = [B.g1_add(p, q) for p, q in zip(ps, qs)]
    assert got == want


def test_add_affine_negated_y():
    # window sums feed negated table entries: y enters as 2p - y (lazy bound)
    from rust_eth_kzg_tpu.ops import field as F

    n = 4
    ps = rand_points(n)
    qs = rand_points(n)
    pa = C.affine_to_device(ps)
    qa = C.affine_to_device(qs)
    qa = C.G1Affine(x=qa.x, y=F.neg(F.FP, qa.y, kp=2), inf=qa.inf)
    got = C.points_from_device(C.add_affine(pa, qa))
    want = [B.g1_add(p, B.g1_neg(q)) for p, q in zip(ps, qs)]
    assert got == want
