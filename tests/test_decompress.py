"""Device G1 decompression vs the host oracle (SURVEY.md §4 tier 1/2 analog).

Pins the endomorphism subgroup check phi(P) == [z^2-1]P against the
mul-by-r oracle, including curve points OUTSIDE the prime-order subgroup
(the class the spec's verify_cell_kzg_proof_batch invalid-input vectors
exercise through the API).
"""

import random

import numpy as np
import pytest

from rust_eth_kzg_tpu import constants

pytestmark = pytest.mark.skipif(
    constants.FIELD == "tiny", reason="serialization is BLS12-381-only"
)

random.seed(11)


def _curve_point_not_in_subgroup():
    from rust_eth_kzg_tpu.constants import P

    from rust_eth_kzg_tpu.utils import bls_host as B

    while True:
        x = random.randrange(P)
        rhs = (x * x * x + 4) % P
        y = pow(rhs, (P + 1) // 4, P)
        if y * y % P != rhs:
            continue
        pt = (x, y)
        if not B.g1_in_subgroup(pt):
            return pt


def test_decompress_roundtrip_and_flags():
    import jax.numpy as jnp

    from rust_eth_kzg_tpu.constants import R_SCALAR
    from rust_eth_kzg_tpu.ops import curve as C
    from rust_eth_kzg_tpu.ops import decompress as D
    from rust_eth_kzg_tpu.utils import bls_host as B

    pts = [B.g1_mul(B.G1_GEN, random.randrange(1, R_SCALAR)) for _ in range(6)]
    pts.append(None)  # identity
    raw = [B.g1_compress(p) for p in pts]
    x_std, sort, inf = D.parse_compressed_g1_batch(raw)
    got, on_curve, in_sub = D.decompress_g1(
        jnp.asarray(x_std), jnp.asarray(sort), jnp.asarray(inf)
    )
    assert np.asarray(on_curve).all()
    assert np.asarray(in_sub).all()
    host = C.points_from_device(got)
    for h, p in zip(host, pts):
        assert h == p
    D.raise_for_flags(np.asarray(on_curve), np.asarray(in_sub))


def test_decompress_rejects_bad_bytes():
    from rust_eth_kzg_tpu.errors import SerializationError
    from rust_eth_kzg_tpu.ops import decompress as D
    from rust_eth_kzg_tpu.utils import bls_host as B
    from rust_eth_kzg_tpu.constants import P

    good = B.g1_compress(B.G1_GEN)

    with pytest.raises(SerializationError, match="invalid length"):
        D.parse_compressed_g1_batch([good[:40]])
    # missing compression bit
    bad = bytes([good[0] & 0x7F]) + good[1:]
    with pytest.raises(SerializationError, match="uncompressed"):
        D.parse_compressed_g1_batch([good, bad])
    # infinity with junk body
    bad_inf = bytes([0xC0]) + b"\x00" * 46 + b"\x01"
    with pytest.raises(SerializationError, match="invalid infinity"):
        D.parse_compressed_g1_batch([bad_inf])
    # infinity with sort bit set
    bad_inf2 = bytes([0xE0]) + b"\x00" * 47
    with pytest.raises(SerializationError, match="invalid infinity"):
        D.parse_compressed_g1_batch([bad_inf2])
    # x >= p
    big = (0x80 << 376) | P
    with pytest.raises(SerializationError, match="not canonical"):
        D.parse_compressed_g1_batch([big.to_bytes(48, "big")])


def test_decompress_flags_not_on_curve_and_not_in_subgroup():
    import jax.numpy as jnp

    from rust_eth_kzg_tpu.constants import P
    from rust_eth_kzg_tpu.errors import SerializationError
    from rust_eth_kzg_tpu.ops import decompress as D
    from rust_eth_kzg_tpu.utils import bls_host as B

    # an x with no sqrt(x^3 + 4)
    while True:
        x = random.randrange(P)
        rhs = (x * x * x + 4) % P
        if pow(rhs, (P - 1) // 2, P) != 1:
            break
    off_curve = bytes([0x80 | (x >> 376)]) + (x & ((1 << 376) - 1)).to_bytes(
        47, "big"
    )
    # a curve point outside G1 (order divisible by the cofactor)
    pt = _curve_point_not_in_subgroup()
    x2, y2 = pt
    hdr = 0x80 | (0x20 if y2 * 2 > P else 0)
    not_in_g1 = bytes([hdr | (x2 >> 376)]) + (
        x2 & ((1 << 376) - 1)
    ).to_bytes(47, "big")
    good = B.g1_compress(B.g1_mul(B.G1_GEN, 123456789))

    x_std, sort, inf = D.parse_compressed_g1_batch([good, off_curve, not_in_g1])
    _, on_curve, in_sub = D.decompress_g1(
        jnp.asarray(x_std), jnp.asarray(sort), jnp.asarray(inf)
    )
    on_curve = np.asarray(on_curve)
    in_sub = np.asarray(in_sub)
    assert on_curve.tolist() == [True, False, True]
    assert bool(in_sub[0]) and not bool(in_sub[2])
    with pytest.raises(SerializationError, match="not on curve"):
        D.raise_for_flags(on_curve, np.ones_like(in_sub))
    with pytest.raises(SerializationError, match="prime-order subgroup"):
        D.raise_for_flags(np.ones_like(on_curve), in_sub)
