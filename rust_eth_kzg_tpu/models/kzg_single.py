"""Single-point KZG open/verify (the EIP-4844 core).

Rebuild of /root/reference/crates/cryptography/kzg_single_open/src/{prover.rs,
verifier.rs}: the Ruffini quotient runs as a log-depth associative scan on
device (ops/poly.py); the final pairing checks run on the host BLS layer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import R_SCALAR
from ..errors import InvalidProofError
from ..ops import curve as C
from ..ops import field as F
from ..ops import msm as M
from ..ops import poly as POLY
from ..utils import bls_host as bls
from ..utils import native

FR = F.FR


class SingleOpenProver:
    """Computes proofs pi = [q(tau)]_1 with q = (f - f(z)) / (X - z).

    Shares the commit-key fixed-base tables with the FK20 prover when present.
    """

    def __init__(self, commit_tables=None, commit_points=None):
        self._tables = commit_tables
        self._points = commit_points

    @partial(jax.jit, static_argnums=0)
    def compute_kzg_proof(self, poly: jnp.ndarray, z: jnp.ndarray):
        """poly [L, B, n] Montgomery coeffs, z [L, B] Montgomery point.

        Returns (proof G1 [B], y [L, B]). Matches Prover::compute_kzg_proof
        (prover.rs:29-38): quotient by synthetic division, then an MSM over the
        first n-1 SRS points (padded with a zero scalar to reuse the n-point
        commit tables).
        """
        quotient, y = POLY.divide_by_linear(poly, z)
        zero = jnp.zeros(quotient.shape[:-1] + (1,), quotient.dtype)
        padded = jnp.concatenate([quotient, zero], axis=-1)
        if self._tables is not None:
            proof = M.fixed_base_msm(self._tables, padded)
        else:
            pts = C.G1(
                *(
                    jnp.broadcast_to(
                        c[:, None], (c.shape[0], padded.shape[1]) + c.shape[1:]
                    )
                    for c in self._points
                )
            )
            proof = M.lincomb(pts, padded)
        return proof, y


class SingleOpenVerifier:
    """Pairing checks for single openings (verifier.rs:10-108); host-side."""

    def __init__(self, gen_g1, gen_g2, tau_g2):
        self.gen_g1 = gen_g1
        self.gen_g2 = gen_g2
        self.tau_g2 = tau_g2

    def verify_kzg_proof(self, commitment, z: int, y: int, proof) -> None:
        """e(C - [y]_1, -[1]_2) * e(pi, [tau - z]_2) == 1 or raise."""
        lhs_g1 = bls.g1_add(commitment, bls.g1_neg(bls.g1_mul(self.gen_g1, y)))
        rhs_g2 = bls.g2_add(self.tau_g2, bls.g2_neg(bls.g2_mul(self.gen_g2, z)))
        ok = native.multi_pairings(
            [(lhs_g1, bls.g2_neg(self.gen_g2)), (proof, rhs_g2)]
        )
        if not ok:
            raise InvalidProofError("KZG proof failed the pairing check")

    def verify_kzg_proof_batch(
        self, commitments, zs, ys, proofs, r_powers
    ) -> None:
        """Random-linear-combination batch check (verifier.rs:60-108):
        one size-(2n+1) MSM + one size-n MSM + 2 pairings."""
        n = len(commitments)
        assert n == len(zs) == len(ys) == len(proofs) == len(r_powers)
        y_lincomb = sum(r * y for r, y in zip(r_powers, ys)) % R_SCALAR
        points = list(commitments) + [self.gen_g1] + list(proofs)
        scalars = (
            list(r_powers)
            + [(-y_lincomb) % R_SCALAR]
            + [r * z % R_SCALAR for r, z in zip(r_powers, zs)]
        )
        lhs_g1 = _device_msm(points, scalars)
        rhs_g1 = _device_msm(list(proofs), list(r_powers))
        ok = native.multi_pairings(
            [(lhs_g1, bls.g2_neg(self.gen_g2)), (rhs_g1, self.tau_g2)]
        )
        if not ok:
            raise InvalidProofError("batch KZG proof failed the pairing check")


def _device_msm(points: list, scalars: list[int]):
    """Variable-base MSM for host point lists: runs on device, returns host."""
    dp = C.points_to_device(points)
    return C.points_from_device(M.lincomb_host(dp, scalars))[0]
