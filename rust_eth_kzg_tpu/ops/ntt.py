"""NTT engine: radix-2 DIT over Fr, coset variants, and the G1 group-FFT.

TPU-native rebuild of the reference's Domain/FFT layer
(/root/reference/crates/cryptography/polynomial/src/{domain.rs:40-224,fft.rs:46-177}).
Instead of an in-place scalar butterfly loop with thread-chunk parallelism, each
stage is one fused vector step over the whole (batched) array: a gather for the
bit-reversal, then log2(n) stages of `a +/- w*b` on `[L, B, n]` limb arrays.
The semantic contract matches the reference exactly: `fft` evaluates a
coefficient vector at the domain's roots of unity in natural order
[f(w^0), f(w^1), ...]; `ifft` inverts it.

All twiddle tables are precomputed on the host in Montgomery form and closed
over as constants, so a Domain's transforms trace into single XLA programs.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import R_SCALAR, ROOT_OF_UNITY, TWO_ADICITY
from . import curve as C
from . import field as F

FR = F.FR


def bitrev_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def bit_reverse_permutation(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Bit-reversal reorder along one axis (a free gather on TPU).

    Single shared helper replacing the reference's three copies
    (see SURVEY.md §2 row 12).
    """
    n = x.shape[axis]
    return jnp.take(x, jnp.asarray(bitrev_indices(n)), axis=axis)


@lru_cache(maxsize=None)
def domain(size: int) -> "Domain":
    return Domain(size)


class Domain:
    """Roots-of-unity domain of power-of-two size over Fr."""

    def __init__(self, size: int):
        assert size & (size - 1) == 0 and size > 0, "domain size must be 2^k"
        log_size = size.bit_length() - 1
        assert log_size <= TWO_ADICITY
        self.size = size
        self.log_size = log_size
        self.generator = pow(ROOT_OF_UNITY, 1 << (TWO_ADICITY - log_size), R_SCALAR)
        self.generator_inv = pow(self.generator, R_SCALAR - 2, R_SCALAR)
        self.size_inv = pow(size, R_SCALAR - 2, R_SCALAR)
        # roots in natural order (host ints, handy for oracles/cosets)
        self.roots = [1] * size
        for i in range(1, size):
            self.roots[i] = self.roots[i - 1] * self.generator % R_SCALAR

        # per-stage twiddle tables w_m^j, j < 2^s for stage s (Montgomery [L, half])
        def stage_twiddles(gen):
            tables = []
            for s in range(log_size):
                half = 1 << s
                step = pow(gen, size >> (s + 1), R_SCALAR)
                tw = [pow(step, j, R_SCALAR) for j in range(half)]
                tables.append(np.asarray(FR.to_mont_host(tw)))
            return tables

        self._fwd_twiddles = stage_twiddles(self.generator)
        self._inv_twiddles = stage_twiddles(self.generator_inv)
        self._size_inv_mont = np.asarray(FR.to_mont_host([self.size_inv]))[:, 0]

    # --- scalar transforms: x is [L, B, n] (or [L, n]) Montgomery limbs ---

    def _dit(self, x, tables):
        squeeze = x.ndim == 2
        if squeeze:
            x = x[:, None, :]
        nl, b, n = x.shape
        assert n == self.size
        x = bit_reverse_permutation(x, axis=-1)
        for s in range(self.log_size):
            half = 1 << s
            m = half * 2
            x = x.reshape(nl, b, n // m, m)
            a, t = x[..., :half], x[..., half:]
            tw = jnp.asarray(tables[s]).reshape(nl, 1, 1, half)
            t = F.mont_mul(FR, t, tw)
            x = jnp.concatenate([F.add(FR, a, t), F.sub(FR, a, t, 4)], axis=-1)
            x = x.reshape(nl, b, n)
        return x[:, 0, :] if squeeze else x

    @partial(jax.jit, static_argnums=0)
    def fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Evaluate at the domain roots (natural order). Input padded by caller."""
        return self._dit(coeffs, self._fwd_twiddles)

    @partial(jax.jit, static_argnums=0)
    def ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        out = self._dit(evals, self._inv_twiddles)
        scale = FR.broadcast_const(self._size_inv_mont, out.shape[1:])
        return F.mont_mul(FR, out, scale)

    def _coset_powers(self, gen_int: int):
        pw = [1] * self.size
        for i in range(1, self.size):
            pw[i] = pw[i - 1] * gen_int % R_SCALAR
        return np.asarray(FR.to_mont_host(pw))

    @partial(jax.jit, static_argnums=(0, 2))
    def coset_fft(self, coeffs: jnp.ndarray, coset_gen: int) -> jnp.ndarray:
        """FFT over the coset g*H: scale coefficient k by g^k, then FFT.

        Matches Domain::coset_fft_scalars
        (/root/reference/crates/cryptography/polynomial/src/domain.rs:129-142).
        """
        scale = jnp.asarray(self._coset_powers(coset_gen))
        scale = scale.reshape((FR.nlimbs,) + (1,) * (coeffs.ndim - 2) + (self.size,))
        return self.fft(F.mont_mul(FR, coeffs, scale))

    @partial(jax.jit, static_argnums=(0, 2))
    def coset_ifft(self, evals: jnp.ndarray, coset_gen: int) -> jnp.ndarray:
        gen_inv = pow(coset_gen, R_SCALAR - 2, R_SCALAR)
        out = self.ifft(evals)
        scale = jnp.asarray(self._coset_powers(gen_inv))
        scale = scale.reshape((FR.nlimbs,) + (1,) * (out.ndim - 2) + (self.size,))
        return F.mont_mul(FR, out, scale)

    # --- G1 group transforms: p is a curve.G1 with batch shape [B, n] ---

    def _twiddle_bits(self, gen: int):
        """Static MSB-first bit tables per stage for the group butterflies."""
        tables = []
        for s in range(self.log_size):
            half = 1 << s
            step = pow(gen, self.size >> (s + 1), R_SCALAR)
            tw = [pow(step, j, R_SCALAR) for j in range(half)]
            bits = np.zeros((255, half), dtype=bool)
            for j, w in enumerate(tw):
                for t in range(255):
                    bits[t, j] = (w >> (254 - t)) & 1
            tables.append(bits)
        return tables

    def _dit_g1(self, p: C.G1, bit_tables) -> C.G1:
        b, n = p.batch_shape
        assert n == self.size
        p = C.G1(*(bit_reverse_permutation(c, axis=-1) for c in p))
        for s in range(self.log_size):
            half = 1 << s
            m = half * 2
            p = C.G1(*(c.reshape(-1, b, n // m, m) for c in p))
            a = C.G1(*(c[..., :half] for c in p))
            t = C.G1(*(c[..., half:] for c in p))
            bits = jnp.asarray(bit_tables[s])[:, None, None, :]
            bits = jnp.broadcast_to(bits, (255, b, n // m, half))
            wt = C.scalar_mul(t, bits)
            lo = C.add(a, wt)
            hi = C.add(a, C.neg(wt))
            p = C.G1(
                *(
                    jnp.concatenate([l, h], axis=-1).reshape(-1, b, n)
                    for l, h in zip(lo, hi)
                )
            )
        return p

    @partial(jax.jit, static_argnums=0)
    def fft_g1(self, p: C.G1) -> C.G1:
        """Group FFT: out[i] = sum_j roots[i]^j * p[j].

        Matches Domain::fft_g1
        (/root/reference/crates/cryptography/polynomial/src/domain.rs:149-160);
        the butterfly's twiddle scalar-muls are batched across every block of a
        stage so all lanes advance through one shared double-and-add schedule.
        """
        if not hasattr(self, "_fwd_bits"):
            self._fwd_bits = self._twiddle_bits(self.generator)
        return self._dit_g1(p, self._fwd_bits)

    @partial(jax.jit, static_argnums=(0, 2))
    def ifft_g1(self, p: C.G1, take_n: int | None = None) -> C.G1:
        """Inverse group FFT, optionally truncated before the 1/n scaling.

        Matches Domain::ifft_g1_take_n (domain.rs:172-194).
        """
        if not hasattr(self, "_inv_bits"):
            self._inv_bits = self._twiddle_bits(self.generator_inv)
        out = self._dit_g1(p, self._inv_bits)
        if take_n is not None:
            out = C.G1(*(c[..., :take_n] for c in out))
        ninv_bits = np.zeros((255, 1, 1), dtype=bool)
        for t in range(255):
            ninv_bits[t, 0, 0] = (self.size_inv >> (254 - t)) & 1
        bits = jnp.broadcast_to(
            jnp.asarray(ninv_bits), (255,) + tuple(out.batch_shape)
        )
        return C.scalar_mul(out, bits)
