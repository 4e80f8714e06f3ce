"""Reed-Solomon encode/recover vs direct polynomial evaluation (tier 1/3)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from rust_eth_kzg_tpu.constants import R_SCALAR
from rust_eth_kzg_tpu.errors import RecoveryError
from rust_eth_kzg_tpu.models.reed_solomon import ReedSolomon
from rust_eth_kzg_tpu.ops import field as F
from rust_eth_kzg_tpu.ops import ntt

random.seed(17)
FR = F.FR

RS = ReedSolomon(poly_len=32, expansion_factor=2, block_size=16)


def encode_host(poly):
    dom = ntt.domain(RS.codeword_length)
    from rust_eth_kzg_tpu.models.naive import poly_eval_host

    return [poly_eval_host(poly, w) for w in dom.roots]


def test_encode_matches_eval():
    poly = [random.randrange(R_SCALAR) for _ in range(RS.poly_len)]
    enc = RS.encode(jnp.asarray(FR.to_mont_host(poly))[:, None, :])
    got = FR.from_mont_host(np.asarray(enc).reshape(FR.nlimbs, -1))
    assert got == encode_host(poly)


@pytest.mark.parametrize("num_missing", [1, RS.acceptable_num_block_erasures])
def test_recover_block_erasures(num_missing):
    poly = [random.randrange(R_SCALAR) for _ in range(RS.poly_len)]
    codeword = encode_host(poly)
    missing = sorted(random.sample(range(RS.block_size), num_missing))
    erased = list(codeword)
    # "block index" b is erased at every position congruent to b mod block_size
    for m in range(RS.num_blocks):
        for b in missing:
            erased[b + m * RS.block_size] = 0
    dev = jnp.asarray(FR.to_mont_host(erased))[:, None, :]
    rec = RS.recover_polynomial_coefficient(dev, missing)
    got = FR.from_mont_host(np.asarray(rec).reshape(FR.nlimbs, -1))
    assert got == poly


def test_recover_too_many_erasures():
    with pytest.raises(RecoveryError):
        RS.construct_vanishing_poly(
            list(range(RS.acceptable_num_block_erasures + 1))
        )
    with pytest.raises(RecoveryError):
        RS.construct_vanishing_poly([RS.block_size])
