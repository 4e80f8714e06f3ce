"""NTT engine: radix-2 DIT over Fr, coset variants, and the G1 group-FFT.

TPU-native rebuild of the reference's Domain/FFT layer
(/root/reference/crates/cryptography/polynomial/src/{domain.rs:40-224,fft.rs:46-177}).
Instead of an in-place scalar butterfly loop with thread-chunk parallelism, the
transform runs as a `lax.scan` over stages of a *uniform butterfly*: every
stage is `out[i] = x[a_i] +/- w_i * x[b_i]` with precomputed per-stage index
vectors, twiddles, and sign masks. One compiled stage body serves all log2(n)
stages — compile time stays flat in n, and each stage is one fused vector step
over the whole batched array.

Semantics match the reference exactly: `fft` evaluates a coefficient vector at
the domain's roots of unity in natural order [f(w^0), f(w^1), ...]; `ifft`
inverts it; coset variants scale by generator powers; `fft_g1`/`ifft_g1` run
the same schedule over curve points (the twiddle multiply becomes a batched
double-and-add over static twiddle bit tables).
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


def _pair_schedule(size: int, gen: int):
    """Distinct-pair butterfly schedule: stage s has n/2 butterflies (a, b, w)
    producing a+wb and a-wb; positions i and i+h of the uniform schedule share
    one (a, b, w) triple, so computing per-pair halves the twiddle-multiply
    lane volume (the dominant cost of the G1 group-FFT).

    Returns (idx_a [S,n/2], idx_b [S,n/2], perm [S,n], tw_ints [S,n/2]):
    out = concat(a+wb, a-wb)[perm].
    """
    log_n = size.bit_length() - 1
    half = size // 2
    idx_a = np.zeros((log_n, half), dtype=np.int64)
    idx_b = np.zeros((log_n, half), dtype=np.int64)
    perm = np.zeros((log_n, size), dtype=np.int64)
    tw = np.zeros((log_n, half), dtype=object)
    for s in range(log_n):
        h = 1 << s
        lower = np.array([i for i in range(size) if not (i >> s) & 1])
        rank = {int(i): r for r, i in enumerate(lower)}
        idx_a[s] = lower
        idx_b[s] = lower + h
        step = pow(gen, size >> (s + 1), R_SCALAR)
        tw[s] = np.array(
            [pow(step, int(i % (2 * h) % h), R_SCALAR) for i in lower],
            dtype=object,
        )
        for i in range(size):
            if (i >> s) & 1:
                perm[s, i] = half + rank[i - h]
            else:
                perm[s, i] = rank[i]
    return idx_a, idx_b, perm, tw


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

        self._sched = {}
        for tag, gen in (("fwd", self.generator), ("inv", self.generator_inv)):
            idx_a, idx_b, perm, tw = _pair_schedule(size, gen)
            tw_mont = (
                np.stack([FR.to_mont_host(list(row)) for row in tw], axis=0)
                if size > 1
                else np.zeros((0, FR.nlimbs, 0))
            )  # [S, L, n/2]
            self._sched[tag] = (
                jnp.asarray(idx_a),
                jnp.asarray(idx_b),
                jnp.asarray(perm),
                jnp.asarray(tw_mont),
            )
        self._size_inv_mont = np.asarray(FR.to_mont_host([self.size_inv]))[:, 0]
        self._g1_bits = {}

    # --- scalar transforms: x is [L, B, n] (or [L, n]) Montgomery limbs ---

    def _dit(self, x, tag):
        from . import pallas_kernels as PK

        squeeze = x.ndim == 2
        if squeeze:
            x = x[:, None, :]
        nl, b, n = x.shape
        assert n == self.size, f"expected size {self.size}, got {n}"
        x = bit_reverse_permutation(x, axis=-1)
        if n == 1:
            return x[:, 0, :] if squeeze else x
        idx_a, idx_b, perm, tw = self._sched[tag]
        fused = PK.enabled()

        def butterfly(a, bb, w):
            if fused:
                return PK.field_butterfly(FR, a, bb, w)
            t = F.mont_mul(FR, bb, w)
            return F.add(FR, a, t), F.sub(FR, a, t, 2)

        # stage 0: all twiddles are 1 — plain add/sub on the distinct pairs
        a0 = jnp.take(x, idx_a[0], axis=-1)
        b0 = jnp.take(x, idx_b[0], axis=-1)
        cat0 = jnp.concatenate(
            [F.add(FR, a0, b0), F.sub(FR, a0, b0, 2)], axis=-1
        )
        x = jnp.take(cat0, perm[0], axis=-1)

        def stage(x, args):
            ia, ib, pm, w = args
            a = jnp.take(x, ia, axis=-1)
            bb = jnp.take(x, ib, axis=-1)
            plus, minus = butterfly(a, bb, w[:, None, :])
            cat = jnp.concatenate([plus, minus], axis=-1)
            return jnp.take(cat, pm, axis=-1), None

        if n > 2:
            x, _ = jax.lax.scan(
                stage, x, (idx_a[1:], idx_b[1:], perm[1:], tw[1:])
            )
        return x[:, 0, :] if squeeze else x

    @partial(jax.jit, static_argnums=0)
    def fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Evaluate at the domain roots (natural order). Caller pads input."""
        return self._dit(coeffs, "fwd")

    @partial(jax.jit, static_argnums=0)
    def ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        out = self._dit(evals, "inv")
        scale = FR.broadcast_const(self._size_inv_mont, out.shape[1:])
        return F.mont_mul(FR, out, scale)

    def _coset_powers(self, gen_int: int):
        pw = [1] * self.size
        for i in range(1, self.size):
            pw[i] = pw[i - 1] * gen_int % R_SCALAR
        return np.asarray(FR.to_mont_host(pw))

    @partial(jax.jit, static_argnums=(0, 2), static_argnames=("coset_gen",))
    def coset_fft(self, coeffs: jnp.ndarray, coset_gen: int) -> jnp.ndarray:
        """FFT over the coset g*H: scale coefficient k by g^k, then FFT.

        Matches Domain::coset_fft_scalars
        (/root/reference/crates/cryptography/polynomial/src/domain.rs:129-142).
        """
        scale = jnp.asarray(self._coset_powers(coset_gen))
        scale = scale.reshape((FR.nlimbs,) + (1,) * (coeffs.ndim - 2) + (self.size,))
        return self.fft(F.mont_mul(FR, coeffs, scale))

    @partial(jax.jit, static_argnums=(0, 2), static_argnames=("coset_gen",))
    def coset_ifft(self, evals: jnp.ndarray, coset_gen: int) -> jnp.ndarray:
        gen_inv = pow(coset_gen, R_SCALAR - 2, R_SCALAR)
        out = self.ifft(evals)
        scale = jnp.asarray(self._coset_powers(gen_inv))
        scale = scale.reshape((FR.nlimbs,) + (1,) * (out.ndim - 2) + (self.size,))
        return F.mont_mul(FR, out, scale)

    # --- G1 group transforms: p is a curve.G1 with batch shape [B, n] ---

    def _g1_pair_schedule(self, tag: str, gen: int):
        """Static per-stage distinct-pair schedule + GLV-split twiddle tables
        (cached as numpy — the jnp conversion must happen per-trace to avoid
        leaking tracers).

        Returns (idx_a [S, n/2], idx_b, perm [S, n], bits1 [S, NB, n/2],
        neg1 [S, n/2], bits2, neg2): each stage computes n/2 twiddle
        scalar-muls (not n — see _pair_schedule) over two ~129-bit GLV halves.
        """
        if tag not in self._g1_bits:
            idx_a, idx_b, perm, tw = _pair_schedule(self.size, gen)
            s, half = tw.shape
            nb = C.GLV_NBITS
            bits1 = np.zeros((s, nb, half), dtype=bool)
            bits2 = np.zeros((s, nb, half), dtype=bool)
            neg1 = np.zeros((s, half), dtype=bool)
            neg2 = np.zeros((s, half), dtype=bool)
            for st in range(s):
                b1, n1, b2, n2 = C.glv_bits_host([int(w) for w in tw[st]])
                bits1[st], bits2[st] = b1, b2
                neg1[st], neg2[st] = n1, n2
            self._g1_bits[tag] = (idx_a, idx_b, perm, bits1, neg1, bits2, neg2)
        return self._g1_bits[tag]

    def _dit_g1(self, p: C.G1, tag: str, gen: int) -> C.G1:
        b, n = p.batch_shape
        assert n == self.size
        p = C.G1(*(bit_reverse_permutation(c, axis=-1) for c in p))
        half = n // 2
        if n == 1:
            return p
        idx_a, idx_b, perm, bits1, neg1, bits2, neg2 = (
            jnp.asarray(t) for t in self._g1_pair_schedule(tag, gen)
        )

        # stage 0 twiddles are all w = 1 (exponent i mod 1 == 0): run it as a
        # plain add/sub outside the scan instead of a 130-step GLV multiply
        a0 = C.G1(*(jnp.take(c, idx_a[0], axis=-1) for c in p))
        b0 = C.G1(*(jnp.take(c, idx_b[0], axis=-1) for c in p))
        cat0 = C.G1(
            *(
                jnp.concatenate([cp, cm], axis=-1)
                for cp, cm in zip(C.add(a0, b0), C.add(a0, C.neg(b0)))
            )
        )
        p = C.G1(*(jnp.take(c, perm[0], axis=-1) for c in cat0))
        if n == 2:
            return p

        def stage(p, args):
            ia, ib, pm, b1, n1, b2, n2 = args
            a = C.G1(*(jnp.take(c, ia, axis=-1) for c in p))
            t = C.G1(*(jnp.take(c, ib, axis=-1) for c in p))
            bshape = (C.GLV_NBITS, b, half)
            wt = C.scalar_mul_glv(
                t,
                jnp.broadcast_to(b1[:, None, :], bshape),
                jnp.broadcast_to(n1[None, :], (b, half)),
                jnp.broadcast_to(b2[:, None, :], bshape),
                jnp.broadcast_to(n2[None, :], (b, half)),
            )
            plus = C.add(a, wt)
            minus = C.add(a, C.neg(wt))
            cat = C.G1(
                *(
                    jnp.concatenate([cp, cm], axis=-1)
                    for cp, cm in zip(plus, minus)
                )
            )
            return C.G1(*(jnp.take(c, pm, axis=-1) for c in cat)), None

        p, _ = jax.lax.scan(
            stage,
            p,
            (
                idx_a[1:],
                idx_b[1:],
                perm[1:],
                bits1[1:],
                neg1[1:],
                bits2[1:],
                neg2[1:],
            ),
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
        return self._dit_g1(p, "fwd", self.generator)

    @partial(
        jax.jit,
        static_argnums=(0, 2, 3),
        static_argnames=("take_n", "prescaled"),
    )
    def ifft_g1(
        self, p: C.G1, take_n: int | None = None, prescaled: bool = False
    ) -> C.G1:
        """Inverse group FFT, optionally truncated before the 1/n scaling.

        Matches Domain::ifft_g1_take_n (domain.rs:172-194). With
        `prescaled=True` the final 1/n group scalar-multiply is skipped — the
        caller has already folded 1/n into whatever Fr scalars produced `p`
        (an Fr multiply per lane instead of a ~130-step G1 double-and-add).
        """
        out = self._dit_g1(p, "inv", self.generator_inv)
        if take_n is not None:
            out = C.G1(*(c[..., :take_n] for c in out))
        if prescaled:
            return out
        b1, n1, b2, n2 = C.glv_bits_host([self.size_inv])
        shape = (C.GLV_NBITS,) + tuple(out.batch_shape)
        return C.scalar_mul_glv(
            out,
            jnp.broadcast_to(jnp.asarray(b1)[:, :1, None], shape),
            jnp.broadcast_to(jnp.asarray(n1), out.batch_shape),
            jnp.broadcast_to(jnp.asarray(b2)[:, :1, None], shape),
            jnp.broadcast_to(jnp.asarray(n2), out.batch_shape),
        )

    @property
    def size_inv_mont(self) -> np.ndarray:
        return self._size_inv_mont
