"""NTT / coset NTT / G1-FFT vs naive DFT oracles."""

import random

import jax.numpy as jnp
import numpy as np

from rust_eth_kzg_tpu.constants import FR_MULTIPLICATIVE_GENERATOR, R_SCALAR
from rust_eth_kzg_tpu.ops import curve as C
from rust_eth_kzg_tpu.ops import field as F
from rust_eth_kzg_tpu.ops import ntt
from rust_eth_kzg_tpu.utils import bls_host as B

random.seed(99)
FR = F.FR


def naive_dft(coeffs, roots):
    n = len(roots)
    return [
        sum(c * pow(w, j, R_SCALAR) for j, c in enumerate(coeffs)) % R_SCALAR
        for w in roots
    ]


def test_fft_ifft_roundtrip_and_oracle():
    n = 32
    dom = ntt.domain(n)
    coeffs = [random.randrange(R_SCALAR) for _ in range(n)]
    x = jnp.asarray(FR.to_mont_host(coeffs))
    evals = dom.fft(x)
    got = FR.from_mont_host(np.asarray(evals))
    assert got == naive_dft(coeffs, dom.roots)
    back = FR.from_mont_host(np.asarray(dom.ifft(evals)))
    assert back == coeffs


def test_batched_fft():
    n, b = 16, 3
    dom = ntt.domain(n)
    polys = [[random.randrange(R_SCALAR) for _ in range(n)] for _ in range(b)]
    x = jnp.stack(
        [jnp.asarray(FR.to_mont_host(p)) for p in polys], axis=1
    )  # [L, B, n]
    evals = dom.fft(x)
    for i in range(b):
        got = FR.from_mont_host(np.asarray(evals[:, i]))
        assert got == naive_dft(polys[i], dom.roots)


def test_coset_fft_roundtrip():
    n = 16
    dom = ntt.domain(n)
    g = FR_MULTIPLICATIVE_GENERATOR
    coeffs = [random.randrange(R_SCALAR) for _ in range(n)]
    x = jnp.asarray(FR.to_mont_host(coeffs))
    ev = dom.coset_fft(x, g)
    # oracle: evaluate at g * w^i
    want = [
        sum(c * pow(g * w % R_SCALAR, j, R_SCALAR) for j, c in enumerate(coeffs))
        % R_SCALAR
        for w in dom.roots
    ]
    assert FR.from_mont_host(np.asarray(ev)) == want
    back = dom.coset_ifft(ev, g)
    assert FR.from_mont_host(np.asarray(back)) == coeffs


def test_g1_fft_vs_naive_msm():
    n = 4
    dom = ntt.domain(n)
    pts = [B.g1_mul(B.G1_GEN, random.randrange(1, R_SCALAR)) for _ in range(n)]
    dp = C.points_to_device(pts)
    dp = C.G1(*(c[:, None, :] for c in dp))  # batch of 1
    out = C.points_from_device(dom.fft_g1(dp))
    for i, w in enumerate(dom.roots):
        want = None
        for j, pt in enumerate(pts):
            want = B.g1_add(want, B.g1_mul(pt, pow(w, j, R_SCALAR)))
        assert out[i] == want
    # inverse round-trips, including truncation + 1/n scaling
    back = C.points_from_device(dom.ifft_g1(dom.fft_g1(dp)))
    assert back == pts
    back2 = C.points_from_device(dom.ifft_g1(dom.fft_g1(dp), take_n=2))
    assert back2 == pts[:2]
