"""Reed-Solomon erasure engine over the Fr evaluation domain.

TPU-native rebuild of the reference erasure decoder
(/root/reference/crates/cryptography/erasure_codes/src/reed_solomon.rs:72-385):
the device path (5 NTTs + 2 pointwise products + one batched inversion) is a
single jitted program with all-static shapes; only the vanishing-polynomial
*coefficients* — a <= 64-root product that depends on which cells are missing —
are computed on the host per call (they are tiny and data-dependent).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FR_MULTIPLICATIVE_GENERATOR, R_SCALAR
from ..errors import RecoveryError
from ..ops import field as F
from ..ops import ntt
from ..ops.poly import vanishing_poly_host

FR = F.FR


@dataclass(frozen=True, eq=False)
class ReedSolomon:
    """poly_len coefficients encoded onto an expansion*poly_len domain.

    Block-synchronized erasures: the codeword is split into `num_blocks`
    blocks of `block_size`; a missing cell knocks out the same relative index
    in every block (reed_solomon.rs:220-262).
    """

    poly_len: int
    expansion_factor: int
    block_size: int

    def __post_init__(self):
        assert all(
            x & (x - 1) == 0
            for x in (self.poly_len, self.expansion_factor, self.block_size)
        )

    @property
    def codeword_length(self) -> int:
        return self.poly_len * self.expansion_factor

    @property
    def num_blocks(self) -> int:
        return self.codeword_length // self.block_size

    @property
    def acceptable_num_block_erasures(self) -> int:
        return (self.codeword_length - self.poly_len) // self.num_blocks

    @property
    def evaluation_domain(self):
        return ntt.domain(self.codeword_length)

    def encode(self, poly: jnp.ndarray) -> jnp.ndarray:
        """Coefficients [L, B, poly_len] -> codeword [L, B, 2*poly_len]."""
        pad = self.codeword_length - poly.shape[-1]
        padded = jnp.concatenate(
            [poly, jnp.zeros(poly.shape[:-1] + (pad,), poly.dtype)], axis=-1
        )
        return self.evaluation_domain.fft(padded)

    def construct_vanishing_poly(self, block_indices: list[int]) -> np.ndarray:
        """Host: sparse vanishing polynomial over the codeword domain.

        Z vanishes at index b within *every* block: build the vanishing
        polynomial of the block-domain roots for the missing indices, then
        spread its coefficients at stride num_blocks (reed_solomon.rs:220-262).
        Returns standard-form limbs [L, codeword_length].
        """
        for b in block_indices:
            if b >= self.block_size:
                raise RecoveryError(
                    f"invalid block index {b} for block size {self.block_size}"
                )
        if len(block_indices) > self.acceptable_num_block_erasures:
            raise RecoveryError(
                f"{len(block_indices)} block erasures exceed the maximum "
                f"{self.acceptable_num_block_erasures}"
            )
        block_domain = ntt.domain(self.block_size)
        roots = [block_domain.roots[b] for b in block_indices]
        small = vanishing_poly_host(roots)
        z = [0] * self.codeword_length
        for i, c in enumerate(small):
            z[i * self.num_blocks] = c
        from ..ops import limbs as L

        return L.ints_to_limbs(z, FR.nlimbs)

    def construct_vanishing_poly_small(self, block_indices: list[int]) -> np.ndarray:
        """Host: the UN-spread vanishing coefficients, [L, nz] with
        nz = acceptable_num_block_erasures + 1 (zero-padded).

        The dense codeword-domain polynomial (`construct_vanishing_poly`)
        is exactly these coefficients spread at stride num_blocks — 64x the
        bytes of the same information. The fused recover path uploads this
        form and spreads on device (models/fk20._recover_prove_packed)."""
        for b in block_indices:
            if b >= self.block_size:
                raise RecoveryError(
                    f"invalid block index {b} for block size {self.block_size}"
                )
        if len(block_indices) > self.acceptable_num_block_erasures:
            raise RecoveryError(
                f"{len(block_indices)} block erasures exceed the maximum "
                f"{self.acceptable_num_block_erasures}"
            )
        block_domain = ntt.domain(self.block_size)
        roots = [block_domain.roots[b] for b in block_indices]
        small = vanishing_poly_host(roots)
        nz = self.acceptable_num_block_erasures + 1
        z = list(small) + [0] * (nz - len(small))
        from ..ops import limbs as L

        return L.ints_to_limbs(z, FR.nlimbs)

    @partial(jax.jit, static_argnums=0)
    def _recover_device(self, e_eval: jnp.ndarray, z_std: jnp.ndarray):
        """Device part: e_eval [L, B, n] Montgomery (zeros at erasures),
        z_std [L, n] (shared) or [L, B, n] (per-blob) standard-form vanishing
        coefficients.

        Returns (coefficients [L, B, n] Montgomery, ok_mask [B]) where ok is
        False if the recovered polynomial exceeds degree poly_len
        (reed_solomon.rs:365-383)."""
        g = FR_MULTIPLICATIVE_GENERATOR
        dom = self.evaluation_domain
        z_x = F.to_mont(FR, z_std)
        if z_x.ndim == 2:
            z_x = z_x[:, None, :]  # [L, 1, n] broadcasts over the blob batch
        z_eval = dom.fft(z_x)
        ez_eval = F.mont_mul(FR, z_eval, e_eval)
        dz_coeffs = dom.ifft(ez_eval)
        dz_coset = dom.coset_fft(dz_coeffs, g)
        z_coset = dom.coset_fft(z_x, g)
        z_inv = F.batch_inverse(
            FR, z_coset.reshape(FR.nlimbs, -1), axis=1
        ).reshape(z_coset.shape)
        d_eval = F.mont_mul(FR, dz_coset, z_inv)
        d_coeffs = dom.coset_ifft(d_eval, g)
        high = d_coeffs[..., self.poly_len :]
        ok = jnp.all(F.is_zero(FR, high, bound_kp=2), axis=-1)
        return d_coeffs, ok

    def recover_polynomial_coefficient(
        self, e_eval: jnp.ndarray, missing_block_indices: list[int]
    ) -> jnp.ndarray:
        """codeword-with-zeros [L, B, n] + missing in-block indices -> coeffs.

        Raises RecoveryError if too many erasures or a degree check fails.
        """
        z_std = jnp.asarray(self.construct_vanishing_poly(missing_block_indices))
        d_coeffs, ok = self._recover_device(e_eval, z_std)
        if not bool(np.asarray(ok).all()):
            raise RecoveryError(
                "recovered polynomial has invalid degree (corrupt input cells?)"
            )
        return d_coeffs[..., : self.poly_len]

    def recover_polynomial_coefficient_batch(
        self, e_eval: jnp.ndarray, z_std: jnp.ndarray
    ) -> jnp.ndarray:
        """Batched variant with per-blob vanishing polynomials: e_eval
        [L, B, n], z_std [L, B, n] standard-form (from
        `construct_vanishing_poly` per blob). One device program for all B."""
        d_coeffs, ok = self._recover_device(e_eval, z_std)
        if not bool(np.asarray(ok).all()):
            bad = [i for i, v in enumerate(np.asarray(ok)) if not v]
            raise RecoveryError(
                f"recovered polynomial has invalid degree for batch entries "
                f"{bad} (corrupt input cells?)"
            )
        return d_coeffs[..., : self.poly_len]
