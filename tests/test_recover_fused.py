"""The fused recover+prove device program vs its unfused parts (tiny shapes).

Round 5 fused the 5-NTT RS decode, its degree check, and the FK20 re-prove
into one jit with packed I/O (models/fk20._recover_prove_packed). The byte-
level API only exists at mainnet shapes; this tier pins the fused program's
plumbing (slicing, to-Montgomery, ok flags, output packing) against the
separately-called components at tiny shapes where a CPU compile is cheap.
Runs over whichever field is active.
"""

import random

import jax.numpy as jnp
import numpy as np

from rust_eth_kzg_tpu.constants import R_SCALAR
from rust_eth_kzg_tpu.models import fk20 as FK
from rust_eth_kzg_tpu.models.fk20 import FK20Config, FK20Prover
from rust_eth_kzg_tpu.models.naive import insecure_setup
from rust_eth_kzg_tpu.models.reed_solomon import ReedSolomon
from rust_eth_kzg_tpu.ops import field as F
from rust_eth_kzg_tpu.ops import limbs as L

random.seed(17)
FR = F.FR


def test_recover_prove_packed_matches_unfused():
    cfg = FK20Config(
        poly_len=32, coset_size=4, expansion=2, fk20_window=4, commit_window=None
    )
    g1s, _, _ = insecure_setup(cfg.poly_len, 0)
    prover = FK20Prover(g1s, cfg)
    rs = ReedSolomon(
        poly_len=cfg.poly_len,
        expansion_factor=cfg.expansion,
        block_size=cfg.num_proofs,
    )

    b = 2
    ext = rs.codeword_length
    polys = [
        [random.randrange(R_SCALAR) for _ in range(cfg.poly_len)] for _ in range(b)
    ]
    poly_dev = jnp.asarray(
        np.stack([FR.to_mont_host(p) for p in polys], axis=1)
    )  # [L, B, n]
    codeword = rs.encode(poly_dev)  # [L, B, ext] Montgomery, natural order
    cw_std = np.asarray(F.from_mont(FR, codeword))

    # erase exactly where the vanishing polynomial of `missing` vanishes —
    # self-consistent with construct_vanishing_poly's semantics by definition
    missing = list(range(rs.acceptable_num_block_erasures))  # worst case
    z_std = np.asarray(rs.construct_vanishing_poly(missing))
    z_eval = np.asarray(
        F.from_mont(
            FR,
            rs.evaluation_domain.fft(
                F.to_mont(FR, jnp.asarray(z_std))[:, None, :]
            ),
        )
    )[:, 0]
    zero_positions = [
        j for j in range(ext) if L.limbs_to_int(z_eval[:, j]) % R_SCALAR == 0
    ]
    assert len(zero_positions) == len(missing) * rs.num_blocks
    e_std = cw_std.copy()
    e_std[:, :, zero_positions] = 0

    # unfused reference: recover then prove then pack
    want_poly = rs.recover_polynomial_coefficient(
        F.to_mont(FR, jnp.asarray(e_std)), missing
    )
    rec = np.asarray(
        FR.from_mont_host(np.asarray(want_poly).reshape(FR.nlimbs, -1))
    ).reshape(b, cfg.poly_len)
    for i in range(b):
        assert rec[i].tolist() == polys[i], "recovered polynomial mismatch"
    want_proofs, want_cells = prover.prove_from_poly(want_poly)
    want_pack = np.asarray(FK.pack_prove_outputs(want_proofs, want_cells))

    # fused program: identical bits out (uint16 transfer form, sparse z)
    z_small = np.asarray(rs.construct_vanishing_poly_small(missing))
    nz = rs.acceptable_num_block_erasures + 1
    assert z_small.shape == (FR.nlimbs, nz)
    # the small form spread at stride num_blocks must equal the dense form
    spread = np.zeros_like(z_std)
    spread[:, np.arange(nz) * rs.num_blocks] = z_small
    np.testing.assert_array_equal(spread, z_std)
    packed_in = jnp.asarray(
        np.concatenate(
            [
                e_std.ravel(),
                np.broadcast_to(
                    z_small[:, None, :], (FR.nlimbs, b, nz)
                ).ravel(),
            ]
        ).astype(np.uint16)
    )
    out = np.asarray(
        FK._recover_prove_packed(rs, prover, prover.tables, packed_in, b)
    ).astype(np.int64)
    ok = out[:b]
    assert ok.astype(bool).all(), "degree check must pass on valid erasures"
    np.testing.assert_array_equal(out[b:], want_pack)

    # corrupt one surviving evaluation -> the fused degree check must trip.
    # NOTE: at MAXIMUM erasures the survivors exactly determine a degree-
    # < poly_len polynomial (zero redundancy), so corruption is undetectable
    # by construction; the negative case needs spare redundancy — use half
    # the tolerable erasure count.
    missing2 = missing[: len(missing) // 2]
    z2_std = np.asarray(rs.construct_vanishing_poly(missing2))
    z2_small = np.asarray(rs.construct_vanishing_poly_small(missing2))
    z2_eval = np.asarray(
        F.from_mont(
            FR,
            rs.evaluation_domain.fft(
                F.to_mont(FR, jnp.asarray(z2_std))[:, None, :]
            ),
        )
    )[:, 0]
    zeros2 = {
        j for j in range(ext) if L.limbs_to_int(z2_eval[:, j]) % R_SCALAR == 0
    }
    bad = cw_std.copy()
    bad[:, :, sorted(zeros2)] = 0
    keep = [j for j in range(ext) if j not in zeros2]
    bad[0, 0, keep[0]] = (bad[0, 0, keep[0]] + 1) % (1 << 15)
    packed_bad = jnp.asarray(
        np.concatenate(
            [
                bad.ravel(),
                np.broadcast_to(
                    z2_small[:, None, :], (FR.nlimbs, b, nz)
                ).ravel(),
            ]
        ).astype(np.uint16)
    )
    out_bad = np.asarray(
        FK._recover_prove_packed(rs, prover, prover.tables, packed_bad, b)
    )
    assert not bool(out_bad[0]), "corrupted input must fail the degree check"
    assert bool(out_bad[1]), "untouched batch entry must still pass"
