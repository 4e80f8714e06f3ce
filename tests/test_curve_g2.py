"""Device G2 (Fp2 tower, complete formulas, g2_lincomb) vs the host oracle."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from rust_eth_kzg_tpu import constants
from rust_eth_kzg_tpu.constants import R_SCALAR
from rust_eth_kzg_tpu.ops import curve_g2 as G2
from rust_eth_kzg_tpu.ops import field as F
from rust_eth_kzg_tpu.utils import bls_host as B

pytestmark = pytest.mark.skipif(
    constants.FIELD == "tiny", reason="G2 constants are BLS12-381-only"
)

random.seed(41)
FR = F.FR


def test_g2_add_double_vs_host():
    pts1 = [B.g2_mul(B.G2_GEN, random.randrange(1, R_SCALAR)) for _ in range(4)]
    pts2 = [B.g2_mul(B.G2_GEN, random.randrange(1, R_SCALAR)) for _ in range(4)]
    pts1.append(None)  # identity lane
    pts2.append(B.G2_GEN)
    pts1.append(B.G2_GEN)  # doubling lane
    pts2.append(B.G2_GEN)
    pts1.append(B.G2_GEN)  # inverse lane
    pts2.append(B.g2_neg(B.G2_GEN))
    a = G2.points_to_device(pts1)
    b = G2.points_to_device(pts2)
    got = G2.points_from_device(G2.add(a, b))
    for g, p, q in zip(got, pts1, pts2):
        assert g == B.g2_add(p, q)
    got_d = G2.points_from_device(G2.double(a))
    for g, p in zip(got_d, pts1):
        assert g == B.g2_add(p, p)


def test_g2_lincomb_vs_host():
    n = 6
    pts = [B.g2_mul(B.G2_GEN, random.randrange(1, R_SCALAR)) for _ in range(n)]
    pts[2] = None
    scal = [random.randrange(R_SCALAR) for _ in range(n)]
    scal[4] = 0
    dev = G2.points_to_device(pts)
    sm = jnp.asarray(FR.to_mont_host(scal))
    got = G2.points_from_device(G2.g2_lincomb(dev, sm))[0]
    acc = None
    for p, k in zip(pts, scal):
        acc = B.g2_add(acc, B.g2_mul(p, k))
    assert got == acc
