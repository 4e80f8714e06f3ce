"""Adversarial lazy-reduction bound tests (round-5 verdict #9).

The field layer keeps values lazily reduced (ops/field.py:10-18): mont_mul
accepts inputs < 25p (Fp) / < 181r (Fr) and returns < 2p; curve ops thread
kp=2/4/8 bounds hand-to-hand (ops/curve.py). Spec vectors essentially never
exercise those extremes — a bound slip would only corrupt rare inputs. These
tests push randomized WORST-CASE values right under each documented bound
through add/sub/mul/double/add_affine and assert canonical equality against
a python-int oracle, on whichever compute path is active (XLA on CPU;
the fused Pallas kernels when the default backend is a TPU, or under
KZG_TPU_PALLAS=interpret).
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from rust_eth_kzg_tpu.constants import P, R_SCALAR
from rust_eth_kzg_tpu.ops import curve as C
from rust_eth_kzg_tpu.ops import field as F
from rust_eth_kzg_tpu.ops import limbs as L
from rust_eth_kzg_tpu.utils import bls_host as B

from rust_eth_kzg_tpu import constants

pytestmark = pytest.mark.skipif(
    constants.FIELD == "tiny",
    reason="bounds are documented for the BLS12-381 limb geometry",
)

random.seed(99)
FP = F.FP
FR = F.FR


def _limbs(vals, spec):
    return jnp.asarray(L.ints_to_limbs([int(v) for v in vals], spec.nlimbs))


def _ints(arr):
    return L.limbs_to_ints(np.asarray(arr))


def _near(bound: int, n: int):
    """n random values in the top sliver just below `bound` (worst case)."""
    lo = max(bound - (bound >> 8) - 1, 0)
    return [random.randrange(lo, bound) for _ in range(n)]


@pytest.mark.parametrize(
    "spec,mod,kbound",
    [(FP, P, 24), (FR, R_SCALAR, 24)],
    ids=["fp", "fr"],
)
def test_mont_mul_at_documented_bounds(spec, mod, kbound):
    n = 32
    rinv = pow(spec.r_mod_p, -1, mod)
    a = _near(kbound * mod, n)
    b = _near(kbound * mod, n)
    # mix in exact multiples of p and tiny values (edge lanes)
    a[0], b[0] = kbound * mod - 1, 1
    a[1], b[1] = mod, mod - 1
    a[2], b[2] = 0, kbound * mod - 1
    out = F.mont_mul(spec, _limbs(a, spec), _limbs(b, spec))
    got = _ints(out)
    for ai, bi, gi in zip(a, b, got):
        assert gi < 2 * mod, f"mont_mul output {gi} breaks the < 2p bound"
        assert gi % mod == ai * bi * rinv % mod


@pytest.mark.parametrize("spec,mod", [(FP, P), (FR, R_SCALAR)], ids=["fp", "fr"])
def test_add_sub_neg_at_bounds(spec, mod):
    n = 32
    a = _near(8 * mod, n)
    b2 = _near(2 * mod, n)
    b4 = _near(4 * mod, n)
    s = F.add(spec, _limbs(a, spec), _limbs(b4, spec))
    for ai, bi, gi in zip(a, b4, _ints(s)):
        assert gi == ai + bi  # add never reduces; exact integer sum
    d2 = F.sub(spec, _limbs(a, spec), _limbs(b2, spec), 2)
    for ai, bi, gi in zip(a, b2, _ints(d2)):
        assert gi == ai - bi + 2 * mod
    d4 = F.sub(spec, _limbs(a, spec), _limbs(b4, spec), 4)
    for ai, bi, gi in zip(a, b4, _ints(d4)):
        assert gi == ai - bi + 4 * mod
    n2 = F.neg(spec, _limbs(b4, spec), kp=4)
    for bi, gi in zip(b4, _ints(n2)):
        assert gi == 4 * mod - bi
    # canonicalization from the documented lazy bounds
    c = F.canonical(spec, _limbs(a, spec), bound_kp=8)
    for ai, gi in zip(a, _ints(c)):
        assert gi == ai % mod


def _lazy_point(pt, kp: int):
    """Host affine point -> projective Montgomery limbs with every coordinate
    lifted by a random multiple of p, keeping values < kp*p (the documented
    input bound of the complete formulas)."""
    x, y = pt
    xm = x * FP.r_mod_p % P
    ym = y * FP.r_mod_p % P
    zm = FP.r_mod_p
    coords = []
    for base in (xm, ym, zm):
        j = random.randrange(0, kp - (base // P) - 1 + 1)
        coords.append(base + j * P)
    return coords


def test_curve_add_double_at_lazy_bounds():
    n = 16
    pts1 = [B.g1_mul(B.G1_GEN, random.randrange(1, R_SCALAR)) for _ in range(n)]
    pts2 = [B.g1_mul(B.G1_GEN, random.randrange(1, R_SCALAR)) for _ in range(n)]
    pts2[3] = pts1[3]  # doubling lane through the complete adder
    pts2[4] = B.g1_neg(pts1[4])  # inverse lane -> identity

    def to_g1(pts):
        xs, ys, zs = [], [], []
        for pt in pts:
            cx, cy, cz = _lazy_point(pt, 4)
            xs.append(cx)
            ys.append(cy)
            zs.append(cz)
        return C.G1(
            x=_limbs(xs, FP), y=_limbs(ys, FP), z=_limbs(zs, FP)
        )

    p1 = to_g1(pts1)
    p2 = to_g1(pts2)
    got = C.points_from_device(C.add(p1, p2))
    for g, a, b in zip(got, pts1, pts2):
        assert g == B.g1_add(a, b)
    # outputs respect the documented < 4p bound
    out = C.add(p1, p2)
    for coord in out:
        for v in _ints(coord):
            assert v < 4 * P
    got2 = C.points_from_device(C.double(p1))
    for g, a in zip(got2, pts1):
        assert g == B.g1_add(a, a)
    for coord in C.double(p1):
        for v in _ints(coord):
            assert v < 4 * P


def test_add_affine_chord_at_bounds():
    n = 16
    pts1 = [B.g1_mul(B.G1_GEN, random.randrange(1, R_SCALAR)) for _ in range(n)]
    pts2 = [B.g1_mul(B.G1_GEN, random.randrange(1, R_SCALAR)) for _ in range(n)]
    pts2 = [B.g1_neg(p) if i % 3 == 0 else p for i, p in enumerate(pts2)]

    def to_aff(pts, lazy_neg):
        xs, ys, inf = [], [], []
        for pt in pts:
            x, y = pt
            xm = x * FP.r_mod_p % P
            ym = y * FP.r_mod_p % P
            if lazy_neg:
                # the MSM's negated-digit lanes carry y as 2p - mont(y): a
                # non-canonical (< 2p) representative of -y
                ym = 2 * P - ym
            xs.append(xm)
            ys.append(ym)
            inf.append(False)
        return C.G1Affine(
            x=_limbs(xs, FP), y=_limbs(ys, FP), inf=jnp.asarray(np.array(inf))
        )

    a = to_aff(pts1, False)
    # lazy-negated representation of -pts2 encodes pts2 with y in (p, 2p)
    b = to_aff([B.g1_neg(p) for p in pts2], True)
    got = C.points_from_device(C.add_affine(a, b))
    for g, p1, p2 in zip(got, pts1, pts2):
        assert g == B.g1_add(p1, p2)
