"""MSM kernels vs naive host double-and-add (SURVEY.md §4 tier 2 analog)."""

import random

import jax.numpy as jnp
import numpy as np

from rust_eth_kzg_tpu.constants import R_SCALAR
from rust_eth_kzg_tpu.ops import curve as C
from rust_eth_kzg_tpu.ops import field as F
from rust_eth_kzg_tpu.ops import msm
from rust_eth_kzg_tpu.utils import bls_host as B

random.seed(21)
FR = F.FR


def naive_msm(points, scalars):
    acc = None
    for p, k in zip(points, scalars):
        acc = B.g1_add(acc, B.g1_mul(p, k))
    return acc


def test_signed_digits_reconstruct():
    w = 8
    ks = [0, 1, R_SCALAR - 1, random.randrange(R_SCALAR), (1 << 255) % R_SCALAR]
    d = np.asarray(msm.signed_digits(jnp.asarray(FR.to_mont_host(ks)), w))
    for i, k in enumerate(ks):
        val = sum(int(d[t, i]) << (w * t) for t in range(d.shape[0]))
        assert val == k, f"digit recomposition failed for scalar {i}"
        assert max(abs(int(x)) for x in d[:, i]) <= 1 << (w - 1)


def test_fixed_base_msm_vs_naive():
    n = 8
    pts = [B.g1_mul(B.G1_GEN, random.randrange(1, R_SCALAR)) for _ in range(n)]
    pts[3] = None  # identity base point lane
    scalars = [random.randrange(R_SCALAR) for _ in range(n)]
    scalars[1] = 0
    tables = msm.build_fixed_base_msm(C.points_to_device(pts), window=4)
    got = C.points_from_device(
        msm.fixed_base_msm(tables, jnp.asarray(FR.to_mont_host(scalars)))
    )[0]
    assert got == naive_msm(pts, scalars)


def test_fixed_base_msm_batched():
    n, b = 4, 3
    pts = [B.g1_mul(B.G1_GEN, random.randrange(1, R_SCALAR)) for _ in range(n)]
    tables = msm.build_fixed_base_msm(C.points_to_device(pts), window=4)
    scal = [[random.randrange(R_SCALAR) for _ in range(n)] for _ in range(b)]
    sm = jnp.stack([jnp.asarray(FR.to_mont_host(s)) for s in scal], axis=1)  # [L,B,n]
    out = msm.fixed_base_msm(tables, sm)
    got = C.points_from_device(out)
    for i in range(b):
        assert got[i] == naive_msm(pts, scal[i])


def test_pippenger_vs_naive():
    n = 64
    pts = [B.g1_mul(B.G1_GEN, random.randrange(1, R_SCALAR)) for _ in range(n)]
    pts[5] = None  # identity lane
    pts[6] = pts[9]  # duplicate points (complete adds must absorb them)
    scalars = [random.randrange(R_SCALAR) for _ in range(n)]
    scalars[7] = 0  # zero-scalar lane
    got = C.points_from_device(
        msm.pippenger_msm(
            C.points_to_device(pts), jnp.asarray(FR.to_mont_host(scalars)), 4
        )
    )[0]
    assert got == naive_msm(pts, scalars)


def test_pippenger_batched_matches_lincomb_scan():
    n, b = 64, 2
    pts = [B.g1_mul(B.G1_GEN, random.randrange(1, R_SCALAR)) for _ in range(n)]
    dev = C.points_to_device(pts)
    batched = C.G1(*(jnp.broadcast_to(c[:, None], (c.shape[0], b, n)) for c in dev))
    scal = [[random.randrange(R_SCALAR) for _ in range(n)] for _ in range(b)]
    sm = jnp.stack([jnp.asarray(FR.to_mont_host(s)) for s in scal], axis=1)  # [L,B,n]
    out = msm.pippenger_msm(batched, sm, 4)
    got = C.points_from_device(out)
    for i in range(b):
        assert got[i] == naive_msm(pts, scal[i])


def test_lincomb_vs_naive():
    n = 5
    pts = [B.g1_mul(B.G1_GEN, random.randrange(1, R_SCALAR)) for _ in range(n)]
    pts[2] = None
    scalars = [random.randrange(R_SCALAR) for _ in range(n)]
    scalars[4] = 0
    got = C.points_from_device(
        msm.lincomb(C.points_to_device(pts), jnp.asarray(FR.to_mont_host(scalars)))
    )[0]
    assert got == naive_msm(pts, scalars)
