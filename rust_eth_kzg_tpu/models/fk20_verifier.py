"""FK20 batch verifier for cell proofs.

Rebuild of /root/reference/crates/cryptography/kzg_multi_open/src/fk20/
verifier.rs:39-384: the three proof/commitment MSMs and the <=128 batched
64-point coset IFFTs run on device; Fiat-Shamir, the per-batch scalar
bookkeeping, and the closing 2-pairing check run on the host.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import R_SCALAR
from ..errors import InvalidProofError
from ..ops import curve as C
from ..ops import field as F
from ..ops import limbs as L
from ..ops import msm as M
from ..ops import ntt
from ..utils import bls_host as bls
from ..utils import native
from ..utils import fiat_shamir as fs
from . import cosets

FR = F.FR


class FK20Verifier:
    def __init__(
        self,
        g1s: list,
        g2s: list,
        coset_size: int,
        num_coefficients: int,
        num_points_to_open: int,
        num_cosets: int,
    ):
        assert num_cosets * coset_size == num_points_to_open
        assert len(g2s) > coset_size, "need more G2 points than the coset size"
        self.g1s = g1s
        self.g2s = g2s
        self.coset_size = coset_size
        self.num_coefficients = num_coefficients
        self.num_cosets = num_cosets
        self.coset_domain = ntt.domain(coset_size)
        # bit-reversed coset generators, their n-th powers, and the device-side
        # inverse-power scale tables for the per-coset IFFTs (verifier.rs:57-108)
        self.coset_gens = cosets.coset_gens(num_points_to_open, num_cosets, True)
        self.coset_gens_pow_n = [
            pow(g, coset_size, R_SCALAR) for g in self.coset_gens
        ]
        scale = np.empty((num_cosets, coset_size), dtype=object)
        for k, g in enumerate(self.coset_gens):
            ginv = pow(g, R_SCALAR - 2, R_SCALAR)
            acc = 1
            for j in range(coset_size):
                scale[k, j] = acc
                acc = acc * ginv % R_SCALAR
        flat = [int(x) for x in scale.reshape(-1)]
        self._coset_scale = jnp.asarray(FR.to_mont_host(flat)).reshape(
            FR.nlimbs, num_cosets, coset_size
        )
        self.tau_pow_n_g2 = g2s[coset_size]
        self._commit_tables_cache = None

    @property
    def _commit_tables(self):
        """Fixed-base MSM tables over the verifier SRS (g1s[:coset_size]),
        built lazily on the first verify call."""
        if self._commit_tables_cache is None:
            self._commit_tables_cache = M.build_fixed_base_msm(
                C.points_to_device(self.g1s[: self.coset_size]), window=8
            )
        return self._commit_tables_cache

    def verify(
        self,
        dedup_commitments: list,  # host affine points
        commitment_indices: list[int],
        coset_indices: list[int],
        coset_evals_std: np.ndarray,  # [K, coset_size, L] standard-form limbs
        proofs: list,  # host affine points
        r: int,  # Fiat-Shamir challenge (computed by the caller over raw bytes)
    ) -> None:
        batch = len(coset_indices)
        assert batch == len(commitment_indices) == len(proofs)
        r_powers = fs.compute_powers(r, batch)

        # Pad the batch to a power of two with identity points / zero scalars:
        # keeps the number of distinct compiled shapes logarithmic in the
        # supported batch sizes (contributions of padded lanes are zero).
        padded = 1 << max(batch - 1, 0).bit_length()
        pad = padded - batch
        proofs = list(proofs) + [None] * pad
        coset_indices = list(coset_indices) + [0] * pad
        r_powers = r_powers + [0] * pad
        coset_evals_std = np.concatenate(
            [
                np.asarray(coset_evals_std),
                np.zeros((pad,) + np.asarray(coset_evals_std).shape[1:], dtype=np.asarray(coset_evals_std).dtype),
            ],
            axis=0,
        )
        commitment_indices = list(commitment_indices) + [0] * pad
        batch = padded

        # 1-3. the three random-linear-combination MSMs (proofs by r_i,
        # proofs by r_i * h_k^n, dedup commitments by accumulated weights —
        # verifier.rs:186-225) run as ONE batched GLV double-and-add over a
        # [3, padded] point array: a single ~130-step scan instead of three
        # (each scan step is a kernel launch; the verify path is launch-bound)
        weighted = [
            rp * self.coset_gens_pow_n[ci] % R_SCALAR
            for rp, ci in zip(r_powers, coset_indices)
        ]
        weights = [0] * len(dedup_commitments)
        for ci, rp in zip(commitment_indices, r_powers):
            weights[ci] = (weights[ci] + rp) % R_SCALAR
        comm_padded = list(dedup_commitments) + [None] * (
            batch - len(dedup_commitments)
        )
        weights_padded = weights + [0] * (batch - len(weights))
        pts3 = C.points_to_device(list(proofs) * 2 + comm_padded)
        pts3 = C.G1(*(c.reshape(-1, 3, batch) for c in pts3))
        b1, n1, b2, n2 = C.glv_bits_host(
            [int(s) for s in r_powers + weighted + weights_padded]
        )
        # one packed upload for the four GLV bit arrays: each host->device
        # transfer is a ~20 ms round trip on the tunneled TPU
        nb = b1.shape[0]
        packed = jnp.asarray(
            np.concatenate(
                [b1, n1[None], b2, n2[None]], axis=0, dtype=np.bool_
            )
        )
        per_point = C.scalar_mul_glv(
            pts3,
            packed[:nb].reshape(-1, 3, batch),
            packed[nb].reshape(3, batch),
            packed[nb + 1 : 2 * nb + 1].reshape(-1, 3, batch),
            packed[2 * nb + 1].reshape(3, batch),
        )
        sums3 = C.reduce_sum(per_point, axis=2)  # G1 [3]

        # 4. random linear combination of the interpolation polynomials:
        #    per coset, un-bit-reverse, coset-IFFT, scale by r_i; all K at once
        # [K, coset, L] standard-form limbs -> [L, K, coset] Montgomery,
        # shipped together with the r-power scalars as one packed upload
        cs = self.coset_size
        evals_np = np.moveaxis(np.asarray(coset_evals_std), -1, 0)
        up = jnp.asarray(
            np.concatenate(
                [
                    evals_np.reshape(FR.nlimbs, -1),
                    np.asarray(FR.to_mont_host(r_powers), dtype=evals_np.dtype),
                ],
                axis=1,
            )
        )
        evals = up[:, : batch * cs].reshape(FR.nlimbs, batch, cs)
        r_mont = up[:, batch * cs :]
        evals = F.to_mont(FR, evals)
        evals = ntt.bit_reverse_permutation(evals, axis=-1)
        interp = self.coset_domain.ifft(evals)  # [L, K, coset]
        scale_rows = jnp.take(
            self._coset_scale, jnp.asarray(coset_indices), axis=1
        )  # [L, K, coset]
        interp = F.mont_mul(FR, interp, scale_rows)
        interp = F.mont_mul(FR, interp, r_mont[:, :, None])
        # sum over the K cosets: pairwise tree (log2 K adds, not K)
        k = interp.shape[1]
        while k > 1:
            h = k // 2
            lo = interp[:, :h]
            hi = interp[:, h : 2 * h]
            red = F.add(FR, lo, hi)
            if k % 2:
                red = jnp.concatenate([red, interp[:, -1:]], axis=1)
                k = h + 1
            else:
                k = h
            interp = red
        poly = interp[:, 0]

        # 5. commit to the interpolation polynomial with the verifier SRS
        #    (precomputed fixed-base tables; MXU one-hot lookup path)
        comm_interp = M.fixed_base_msm(self._commit_tables, poly[:, None, :])

        # 6. closing pairing check (verifier.rs:227-260), one device fetch
        all4 = C.G1(
            *(
                jnp.concatenate([s, ci], axis=-1)
                for s, ci in zip(sums3, comm_interp)
            )
        )
        sp, wsp, sc, cip = C.points_from_device(all4)
        pairing_input = bls.g1_add(bls.g1_add(sc, bls.g1_neg(cip)), wsp)
        ok = native.multi_pairings(
            [(sp, self.tau_pow_n_g2), (pairing_input, bls.g2_neg(bls.G2_GEN))]
        )
        if not ok:
            raise InvalidProofError("cell proof batch failed the pairing check")
