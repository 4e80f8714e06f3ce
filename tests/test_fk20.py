"""FK20 prover vs the naive BDFG oracle on a scaled-down config (tier 3)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from rust_eth_kzg_tpu import constants
from rust_eth_kzg_tpu.constants import R_SCALAR
from rust_eth_kzg_tpu.models import naive
from rust_eth_kzg_tpu.models.fk20 import FK20Config, FK20Prover
from rust_eth_kzg_tpu.ops import curve as C
from rust_eth_kzg_tpu.ops import field as F
from rust_eth_kzg_tpu.ops import ntt
from rust_eth_kzg_tpu.utils import bls_host as B

random.seed(3)
FR = F.FR

CFG = FK20Config(poly_len=64, coset_size=8, expansion=2, fk20_window=4, commit_window=4)


@pytest.fixture(scope="module")
def setup():
    g1s, g2s, tau = naive.insecure_setup(CFG.poly_len, CFG.coset_size + 1)
    prover = FK20Prover([B.g1_compress(p) and p for p in g1s], CFG)
    return g1s, g2s, tau, prover


def bitrev(x, bits):
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (bits - 1 - b)
    return out


def test_fk20_prove_matches_naive(setup):
    g1s, g2s, tau, prover = setup
    poly = [random.randrange(R_SCALAR) for _ in range(CFG.poly_len)]
    dev_poly = jnp.asarray(FR.to_mont_host(poly))[:, None, :]  # [L, 1, n]
    proofs_aff, cells = prover.prove_from_poly(dev_poly)
    proofs = C.affine_from_device(proofs_aff)
    cells_int = FR.from_mont_host(
        np.asarray(cells).reshape(FR.nlimbs, -1)
    )

    ext_dom = ntt.domain(CFG.ext_size)
    coset_dom = ntt.domain(CFG.coset_size)
    log_cosets = CFG.num_proofs.bit_length() - 1
    log_coset_size = CFG.coset_size.bit_length() - 1

    for k in range(CFG.num_proofs):
        h_k = ext_dom.roots[bitrev(k, log_cosets)]
        coset_points = [
            h_k * coset_dom.roots[m] % R_SCALAR for m in range(CFG.coset_size)
        ]
        want_proof, want_ys = naive.compute_multi_opening_naive(poly, coset_points, tau)
        assert proofs[k] == want_proof, f"proof mismatch at coset {k}"
        # cell values: evals at h_k * w^bitrev(j)
        got_cell = cells_int[k * CFG.coset_size : (k + 1) * CFG.coset_size]
        want_cell = [
            naive.poly_eval_host(
                poly, h_k * coset_dom.roots[bitrev(j, log_coset_size)] % R_SCALAR
            )
            for j in range(CFG.coset_size)
        ]
        assert got_cell == want_cell, f"cell mismatch at coset {k}"


@pytest.mark.skipif(
    constants.FIELD != "bls12_381", reason="pairing check is BLS12-381 only"
)
def test_fk20_commit_and_pairing_verify(setup):
    g1s, g2s, tau, prover = setup
    poly = [random.randrange(R_SCALAR) for _ in range(CFG.poly_len)]
    dev_poly = jnp.asarray(FR.to_mont_host(poly))[:, None, :]
    commitment = C.points_from_device(prover.commit_from_poly(dev_poly))[0]
    assert commitment == naive.commit_host(g1s, poly)

    # pairing-verify one FK20 proof against the commitment (full BDFG check)
    proofs_aff, cells = prover.prove_from_poly(dev_poly)
    proofs = C.affine_from_device(proofs_aff)
    ext_dom = ntt.domain(CFG.ext_size)
    coset_dom = ntt.domain(CFG.coset_size)
    k = 3
    h_k = ext_dom.roots[bitrev(k, CFG.num_proofs.bit_length() - 1)]
    coset_points = [h_k * w % R_SCALAR for w in coset_dom.roots]
    ys = [naive.poly_eval_host(poly, x) for x in coset_points]
    assert naive.verify_opening_with_pairing(
        g1s, g2s, commitment, proofs[k], coset_points, ys
    )
    # and a corrupted proof must fail
    bad = B.g1_add(proofs[k], B.G1_GEN)
    assert not naive.verify_opening_with_pairing(
        g1s, g2s, commitment, bad, coset_points, ys
    )


def test_fk20_data_input_contains_blob(setup):
    """Mirrors 'data is contained in the first section of cells' (prover.rs:251-275)."""
    _, _, _, prover = setup
    data = [random.randrange(R_SCALAR) for _ in range(CFG.poly_len)]
    dev = jnp.asarray(FR.to_mont_host(data))[:, None, :]
    cells = prover.extend_from_data(dev)
    flat = FR.from_mont_host(np.asarray(cells).reshape(FR.nlimbs, -1))
    assert flat[: CFG.poly_len] == data
