"""Device field arithmetic vs Python-int oracle (SURVEY.md §4 tier 1/2 analog)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from rust_eth_kzg_tpu.ops import field as F
from rust_eth_kzg_tpu.ops import limbs as L

SPECS = [F.FR, F.FP]
random.seed(1234)


def rand_elems(spec, n, include_edges=True):
    vals = [random.randrange(spec.modulus) for _ in range(n)]
    if include_edges:
        vals[: min(4, n)] = [0, 1, spec.modulus - 1, spec.modulus // 2][: min(4, n)]
    return vals


@pytest.mark.parametrize("spec", SPECS, ids=["Fr", "Fp"])
def test_mont_roundtrip(spec):
    vals = rand_elems(spec, 16)
    m = jnp.asarray(spec.to_mont_host(vals))
    back = spec.from_mont_host(np.asarray(m))
    assert back == vals
    # device from_mont matches host
    dev = np.asarray(F.from_mont(spec, m))
    assert L.limbs_to_ints(dev) == vals


@pytest.mark.parametrize("spec", SPECS, ids=["Fr", "Fp"])
def test_mont_mul_matches_oracle(spec):
    n = 64
    a = rand_elems(spec, n)
    b = rand_elems(spec, n)
    am = jnp.asarray(spec.to_mont_host(a))
    bm = jnp.asarray(spec.to_mont_host(b))
    got = spec.from_mont_host(np.asarray(F.mont_mul(spec, am, bm)))
    want = [x * y % spec.modulus for x, y in zip(a, b)]
    assert got == want


@pytest.mark.parametrize("spec", SPECS, ids=["Fr", "Fp"])
def test_lazy_reduction_chains(spec):
    """Chains of add/sub/double between muls stay correct under lazy bounds."""
    n = 32
    a = rand_elems(spec, n)
    b = rand_elems(spec, n)
    c = rand_elems(spec, n)
    am = jnp.asarray(spec.to_mont_host(a))
    bm = jnp.asarray(spec.to_mont_host(b))
    cm = jnp.asarray(spec.to_mont_host(c))
    # (a+b)*c, (a-b)*c, (2a+b-c)*(a+2b)
    s1 = F.mont_mul(spec, F.add(spec, am, bm), cm)
    s2 = F.mont_mul(spec, F.sub(spec, am, bm), cm)
    t = F.sub(spec, F.add(spec, F.double(spec, am), bm), cm, kp=2)
    s3 = F.mont_mul(spec, t, F.add(spec, am, F.double(spec, bm)))
    m = spec.modulus
    assert spec.from_mont_host(np.asarray(s1)) == [
        (x + y) * z % m for x, y, z in zip(a, b, c)
    ]
    assert spec.from_mont_host(np.asarray(s2)) == [
        (x - y) * z % m for x, y, z in zip(a, b, c)
    ]
    assert spec.from_mont_host(np.asarray(s3)) == [
        (2 * x + y - z) * (x + 2 * y) % m for x, y, z in zip(a, b, c)
    ]


@pytest.mark.parametrize("spec", SPECS, ids=["Fr", "Fp"])
def test_inv_and_batch_inverse(spec):
    n = 16
    vals = [random.randrange(1, spec.modulus) for _ in range(n)]
    m = jnp.asarray(spec.to_mont_host(vals))
    inv = spec.from_mont_host(np.asarray(F.inv_mont(spec, m)))
    assert all(v * iv % spec.modulus == 1 for v, iv in zip(vals, inv))
    binv = spec.from_mont_host(np.asarray(F.batch_inverse(spec, m, axis=1)))
    assert binv == inv


@pytest.mark.parametrize("spec", SPECS, ids=["Fr", "Fp"])
def test_is_zero_equal(spec):
    vals = [0, 1, spec.modulus - 1, 0]
    m = jnp.asarray(spec.to_mont_host(vals))
    assert np.asarray(F.is_zero(spec, m)).tolist() == [True, False, False, True]
    assert np.asarray(F.equal(spec, m, m)).tolist() == [True] * 4


def test_bytes_roundtrip():
    vals = [random.randrange(1 << 256) for _ in range(8)]
    data = b"".join(v.to_bytes(32, "big") for v in vals)
    limbs = L.bytes_be_to_limbs(data, F.FR.nlimbs)
    assert L.limbs_to_ints(limbs) == vals
    assert L.limbs_to_bytes_be(limbs) == data
