"""Pallas kernel equivalence tests (compiled on the real TPU backend).

The fused kernels must be bit-identical to the jnp formula bodies they inline
(ops/pallas_kernels.py reuses curve.add_values etc. verbatim, so these tests
guard the tiling/padding plumbing around them). Mosaic compilation needs a TPU;
on CPU-only hosts the module is skipped (interpret mode exists but is far too
slow for CI on a single core).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rust_eth_kzg_tpu.ops import curve as C
from rust_eth_kzg_tpu.ops import field as F
from rust_eth_kzg_tpu.ops import pallas_kernels as PK

pytestmark = pytest.mark.skipif(
    not PK._backend_is_tpu(), reason="Pallas kernels require a TPU"
)


def _random_points(n, seed):
    """k_i * G for random 10-bit k_i (one jitted double-and-add)."""
    rng = np.random.default_rng(seed)
    from rust_eth_kzg_tpu.constants import G1_GEN_X, G1_GEN_Y

    gen = C.points_to_device([(G1_GEN_X, G1_GEN_Y)] * n)
    bits = rng.integers(0, 2, size=(10, n)).astype(bool)
    bits[0] = True  # nonzero scalars
    return C.scalar_mul(gen, jnp.asarray(bits))


def test_mont_mul_kernel_matches_jnp():
    rng = np.random.default_rng(0)
    vals = [int(x) for x in rng.integers(0, 2**60, size=2 * 300)]
    limbs = jnp.asarray(F.FR.to_mont_host(vals)).reshape(F.FR.nlimbs, 2, 300)
    a, b = limbs[:, 0], limbs[:, 1]
    want = F.mont_mul(F.FR, a, b)
    got = PK.mont_mul(F.FR, a, b)
    assert F.FR.from_mont_host(np.asarray(got)) == F.FR.from_mont_host(
        np.asarray(want)
    )


def test_g1_add_double_mixed_match_jnp():
    p = _random_points(7, 1)
    q = _random_points(7, 2)
    got = PK.g1_add(p, q)
    want = jax.jit(C.add_values)(p, q)
    assert bool(jnp.all(C.equal(got, want)))

    got_d = PK.g1_double(p)
    assert bool(jnp.all(C.equal(got_d, jax.jit(C.double_values)(p))))

    q_aff = C.batch_normalize(q)
    got_m = PK.g1_add_mixed(p, q_aff)
    assert bool(jnp.all(C.equal(got_m, jax.jit(C.add_mixed_values)(p, q_aff))))


def test_g1_add_identity_lanes():
    p = _random_points(4, 3)
    idp = C.identity((4,))
    got = PK.g1_add(p, idp)
    assert bool(jnp.all(C.equal(got, p)))


def test_g1_add_affine_kernel_matches_jnp():
    p = _random_points(6, 4)
    q = _random_points(6, 5)
    pa, qa = C.batch_normalize(p), C.batch_normalize(q)
    got = PK.g1_add_affine(pa, qa)
    want = jax.jit(C.add_affine_values)(pa, qa)
    assert bool(jnp.all(C.equal(got, want)))
    # identity lanes pass the other operand through
    inf_mask = jnp.asarray([True, False, True, False, False, False])
    qa_inf = C.G1Affine(x=qa.x, y=qa.y, inf=inf_mask)
    got_i = PK.g1_add_affine(pa, qa_inf)
    want_i = jax.jit(C.add_affine_values)(pa, qa_inf)
    assert bool(jnp.all(C.equal(got_i, want_i)))


def test_batch_inverse_kernel_matches_jnp():
    rng = np.random.default_rng(6)
    for spec in (F.FR, F.FP):
        vals = [int(x) for x in rng.integers(1, 2**61, size=333)]
        limbs = jnp.asarray(spec.to_mont_host(vals)).reshape(spec.nlimbs, 333)
        got = PK.batch_inverse_flat(spec, limbs)
        inv = spec.from_mont_host(np.asarray(got))
        assert inv == [pow(v, -1, spec.modulus) for v in vals]


def test_batch_inverse_kernel_ragged_tail():
    """Regression (advisor r1-high): n with ceil(n/32) > 512 and not a
    multiple of 512 must still write every output block — the old grid used
    floor division and silently dropped the tail (e.g. c=640 with ct=512)."""
    spec = F.FR
    n = 32 * 640  # c = 640: one full 512-tile plus a 128 tail
    rng = np.random.default_rng(7)
    vals = [int(x) for x in rng.integers(1, 2**61, size=n)]
    limbs = jnp.asarray(spec.to_mont_host(vals)).reshape(spec.nlimbs, n)
    got = PK.batch_inverse_flat(spec, limbs)
    inv = spec.from_mont_host(np.asarray(got))
    # check the head and (critically) the tail region beyond column 512*32
    assert inv[:64] == [pow(v, -1, spec.modulus) for v in vals[:64]]
    assert inv[-64:] == [pow(v, -1, spec.modulus) for v in vals[-64:]]
