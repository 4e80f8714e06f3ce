"""Batched prime-field arithmetic for the TPU: Montgomery CIOS over 15-bit limbs.

This is the TPU-native replacement for blst's field assembly (consumed by the
reference at /root/reference/crates/cryptography/bls12_381/src/lib.rs:45-140):
instead of one scalar value per register, every operation acts on an array of
field elements shaped `[L, *batch]` (limb-major), so the batch axis maps onto
the 8x128 VPU lanes and XLA fuses the unrolled limb arithmetic.

Design:
- radix B = 2^15 in int32 lanes. Products of normalized limbs are < 2^30
  (signed-safe) and CIOS accumulators stay < 2^23 between carry sweeps.
- **Lazy reduction**: values are *not* kept canonical. `mont_mul` accepts any
  inputs with value < 25p (Fp) / < 181r (Fr) and returns a value < 2p; add and
  sub never reduce. Chains of a few additions between multiplications are
  therefore free of conditional subtractions. Canonicalization happens only at
  serialization boundaries and equality checks.
- Limbs are always kept normalized in [0, 2^15) by a carry sweep at the end of
  every op, so products never overflow.

All functions are jit-friendly (static shapes, no Python-level data-dependent
control flow).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FP_LIMBS, FR_LIMBS, LIMB_BITS, LIMB_MASK, P, R_SCALAR
from . import limbs as limb_utils


# eq=False gives identity-based hashing so a FieldSpec can be a static jit arg.
@dataclass(frozen=True, eq=False)
class FieldSpec:
    """Static per-field constants (host numpy; broadcast into kernels)."""

    modulus: int
    nlimbs: int
    # derived
    r: int = field(init=False)  # Montgomery radix B^nlimbs
    r_mod_p: int = field(init=False)
    r2_mod_p: int = field(init=False)
    n0inv: int = field(init=False)  # -p^-1 mod 2^15
    p_limbs: np.ndarray = field(init=False)  # [L]
    p2_limbs: np.ndarray = field(init=False)  # 2p, for lazy subtraction
    p4_limbs: np.ndarray = field(init=False)  # 4p
    one_mont: np.ndarray = field(init=False)  # R mod p, [L]
    r2_limbs: np.ndarray = field(init=False)
    zero: np.ndarray = field(init=False)

    def __post_init__(self):
        object.__setattr__(self, "r", 1 << (LIMB_BITS * self.nlimbs))
        object.__setattr__(self, "r_mod_p", self.r % self.modulus)
        object.__setattr__(self, "r2_mod_p", self.r * self.r % self.modulus)
        object.__setattr__(
            self, "n0inv", (-pow(self.modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        )
        object.__setattr__(
            self, "p_limbs", limb_utils.int_to_limbs(self.modulus, self.nlimbs)
        )
        object.__setattr__(
            self, "p2_limbs", limb_utils.int_to_limbs(2 * self.modulus, self.nlimbs)
        )
        object.__setattr__(
            self, "p4_limbs", limb_utils.int_to_limbs(4 * self.modulus, self.nlimbs)
        )
        object.__setattr__(
            self, "one_mont", limb_utils.int_to_limbs(self.r_mod_p, self.nlimbs)
        )
        object.__setattr__(
            self, "r2_limbs", limb_utils.int_to_limbs(self.r2_mod_p, self.nlimbs)
        )
        object.__setattr__(self, "zero", np.zeros(self.nlimbs, dtype=np.int32))

    # --- host-side conversion helpers ---

    def to_mont_host(self, values) -> np.ndarray:
        """Python ints -> Montgomery limb array [L, N]."""
        m = self.modulus
        return limb_utils.ints_to_limbs(
            [v % m * self.r_mod_p % m for v in values], self.nlimbs
        )

    def from_mont_host(self, limbs) -> list:
        """Montgomery limb array [L, N] (any lazy bound) -> canonical ints."""
        r_inv = pow(self.r_mod_p, -1, self.modulus)
        return [
            v * r_inv % self.modulus for v in limb_utils.limbs_to_ints(np.asarray(limbs))
        ]

    def broadcast_const(self, const_limbs: np.ndarray, batch_shape) -> jnp.ndarray:
        return jnp.broadcast_to(
            dev_const(const_limbs).reshape((self.nlimbs,) + (1,) * len(batch_shape)),
            (self.nlimbs,) + tuple(batch_shape),
        )


FR = FieldSpec(modulus=R_SCALAR, nlimbs=FR_LIMBS)
FP = FieldSpec(modulus=P, nlimbs=FP_LIMBS)


# --- device-constant indirection -------------------------------------------
# Pallas kernels may not close over array constants; while tracing a kernel
# body, ops/pallas_kernels.py installs a table mapping each field constant
# (keyed by its bytes) to a kernel input ref value. Outside kernels this is a
# plain jnp.asarray.

_DEVICE_CONSTS: dict[bytes, jnp.ndarray] | None = None


class device_consts:
    """Context manager installing a {const_bytes: traced value} table."""

    def __init__(self, table: dict[bytes, jnp.ndarray]):
        self.table = table

    def __enter__(self):
        global _DEVICE_CONSTS
        self._prev = _DEVICE_CONSTS
        _DEVICE_CONSTS = self.table

    def __exit__(self, *exc):
        global _DEVICE_CONSTS
        _DEVICE_CONSTS = self._prev


def dev_const(arr: np.ndarray) -> jnp.ndarray:
    arr = np.asarray(arr)
    if _DEVICE_CONSTS is not None:
        got = _DEVICE_CONSTS.get(arr.tobytes())
        if got is not None:
            return got.reshape(arr.shape)
    return jnp.asarray(arr)


def _carry_sweep(t: jnp.ndarray) -> jnp.ndarray:
    """Full signed carry propagation along the limb axis (axis 0).

    Input limbs may be any int32 values (including negatives, e.g. from `sub`);
    output limbs are in [0, 2^15) provided the represented value is >= 0 and
    fits the limb count.

    Inside a Pallas kernel (device_consts installed) the loop is unrolled:
    Mosaic cannot lower lax.scan with extensive inputs/outputs. The jnp path
    keeps the scan so XLA graphs stay compact.
    """
    if _DEVICE_CONSTS is not None:
        carry = jnp.zeros_like(t[0])
        rows = []
        for j in range(t.shape[0]):
            v = t[j] + carry
            rows.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return jnp.stack(rows)

    def step(carry, row):
        v = row + carry
        return v >> LIMB_BITS, v & LIMB_MASK

    _, out = jax.lax.scan(step, jnp.zeros_like(t[0]), t)
    return out


def add_values(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """value(a) + value(b); no reduction. Un-jitted (Pallas-inlinable) body."""
    return _carry_sweep(a + b)


def sub_values(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray, kp: int = 2) -> jnp.ndarray:
    """value(a) - value(b) + kp*p (kp in {2, 4}); caller must have value(b) < kp*p."""
    const = spec.p2_limbs if kp == 2 else spec.p4_limbs
    shift = dev_const(const).reshape((spec.nlimbs,) + (1,) * (a.ndim - 1))
    return _carry_sweep(a - b + shift)


def neg_values(spec: FieldSpec, a: jnp.ndarray, kp: int = 2) -> jnp.ndarray:
    """kp*p - value(a)."""
    const = spec.p2_limbs if kp == 2 else spec.p4_limbs
    shift = dev_const(const).reshape((spec.nlimbs,) + (1,) * (a.ndim - 1))
    return _carry_sweep(shift - a)


def double_values(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return _carry_sweep(a + a)


add = partial(jax.jit, static_argnums=0)(add_values)
sub = partial(jax.jit, static_argnums=(0, 3))(sub_values)
neg = partial(jax.jit, static_argnums=(0, 2))(neg_values)
double = partial(jax.jit, static_argnums=0)(double_values)


def mont_mul_values(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Un-jitted CIOS body (trace-time unrolled); shared by the jnp path and
    the Pallas kernels (ops/pallas_kernels.py), which inline it on VMEM values.

    Formulated with concatenations instead of scatter-adds: Mosaic has no
    scatter lowering, and the concat form also gives XLA a pure elementwise
    dataflow.
    """
    nl = spec.nlimbs
    a, b = jnp.broadcast_arrays(a, b)
    batch_shape = a.shape[1:]
    # accumulator rows [L+2, *batch]
    t = jnp.zeros((nl + 2,) + tuple(batch_shape), dtype=jnp.int32)
    p_row = dev_const(spec.p_limbs).reshape((nl,) + (1,) * len(batch_shape))
    zero_row = jnp.zeros((1,) + tuple(batch_shape), dtype=jnp.int32)

    def shifted_add(t, prod):
        # t += lo(prod) + (hi(prod) << one limb), as one concat + one add
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        contrib = jnp.concatenate(
            [lo[:1], lo[1:] + hi[: nl - 1], hi[nl - 1 :], zero_row], axis=0
        )
        return t + contrib

    for i in range(nl):
        t = shifted_add(t, a[i] * b)  # products < 2^30, accum < 2^23
        m = ((t[0] & LIMB_MASK) * spec.n0inv) & LIMB_MASK
        t = shifted_add(t, m * p_row)
        # t[0] is now divisible by 2^15; shift the accumulator down one limb
        carry0 = t[0] >> LIMB_BITS
        t = jnp.concatenate([(t[1] + carry0)[None], t[2:], zero_row], axis=0)

    return _carry_sweep(t)[:nl]


@partial(jax.jit, static_argnums=0)
def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^-1 mod p (up to a multiple of p; result < 2p).

    CIOS with the limb loop unrolled at trace time. a, b: [L, *batch] with
    normalized limbs; values may be lazily-reduced multiples of p (see module
    docstring for bounds).
    """
    return mont_mul_values(spec, a, b)


def mont_sqr(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


def mont_mul_const(spec: FieldSpec, a: jnp.ndarray, const_limbs: np.ndarray) -> jnp.ndarray:
    """Montgomery product with a per-field constant (e.g. R^2 for to_mont)."""
    c = spec.broadcast_const(const_limbs, a.shape[1:])
    return mont_mul(spec, a, c)


@partial(jax.jit, static_argnums=0)
def to_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul_const(spec, a, spec.r2_limbs)


@partial(jax.jit, static_argnums=0)
def from_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery -> canonical standard form in [0, p)."""
    one = spec.broadcast_const(
        limb_utils.int_to_limbs(1, spec.nlimbs), a.shape[1:]
    )
    return canonical(spec, mont_mul(spec, a, one))


def _cond_sub(spec: FieldSpec, a: jnp.ndarray, const_limbs: np.ndarray) -> jnp.ndarray:
    """a - c if a >= c else a (values compared as integers)."""
    shift = jnp.asarray(const_limbs).reshape((spec.nlimbs,) + (1,) * (a.ndim - 1))
    diff = a - shift

    def step(carry, row):
        v = row + carry
        return v >> LIMB_BITS, v & LIMB_MASK

    borrow, reduced = jax.lax.scan(step, jnp.zeros_like(a[0]), diff)
    return jnp.where(borrow < 0, a, reduced)


@partial(jax.jit, static_argnums=(0, 2))
def canonical(spec: FieldSpec, a: jnp.ndarray, bound_kp: int = 2) -> jnp.ndarray:
    """Reduce a value < bound_kp * p into [0, p) with log2(bound_kp)+... subtractions."""
    k = bound_kp
    while k > 1:
        k = (k + 1) // 2
        mult = limb_utils.int_to_limbs(k * spec.modulus, spec.nlimbs)
        a = _cond_sub(spec, a, mult)
    return _cond_sub(spec, a, spec.p_limbs)


@partial(jax.jit, static_argnums=(0, 2))
def is_zero(spec: FieldSpec, a: jnp.ndarray, bound_kp: int = 2) -> jnp.ndarray:
    """Boolean [*batch]: value == 0 mod p."""
    return jnp.all(canonical(spec, a, bound_kp) == 0, axis=0)


@partial(jax.jit, static_argnums=(0, 3))
def equal(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray, bound_kp: int = 2) -> jnp.ndarray:
    return jnp.all(
        canonical(spec, a, bound_kp) == canonical(spec, b, bound_kp), axis=0
    )


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise `cond ? a : b` where cond is [*batch] and a, b are [L, *batch]."""
    return jnp.where(cond[None], a, b)


@partial(jax.jit, static_argnums=(0, 2))
def pow_fixed(spec: FieldSpec, a: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """a^exponent in Montgomery form (square-and-multiply via lax.scan)."""
    nbits = max(exponent.bit_length(), 1)
    bits = jnp.asarray(
        [(exponent >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.bool_
    )
    one = spec.broadcast_const(spec.one_mont, a.shape[1:])

    def step(acc, bit):
        acc = mont_sqr(spec, acc)
        acc = select(
            jnp.broadcast_to(bit, acc.shape[1:]), mont_mul(spec, acc, a), acc
        )
        return acc, None

    out, _ = jax.lax.scan(step, one, bits)
    return out


@partial(jax.jit, static_argnums=0)
def inv_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery inverse via Fermat (a^(p-2)); a must be nonzero mod p."""
    return pow_fixed(spec, a, spec.modulus - 2)


@partial(jax.jit, static_argnums=(0, 2))
def batch_inverse(spec: FieldSpec, a: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Montgomery's trick over one batch axis: ~1 inversion per 32 elements.

    TPU-shaped replacement for the reference's scratchpad scan
    (/root/reference/crates/cryptography/bls12_381/src/batch_inversion.rs:6-57).
    The N elements are blocked into columns of K=32: a forward `lax.scan`
    builds per-column prefix products (one compiled mont_mul body, K
    sequential steps over all columns in parallel), the column totals are
    inverted together by one Fermat exponentiation, and a backward scan
    distributes the inverses. Graph size stays flat in N — the earlier
    log-depth associative_scan unrolled ~2*log2(N) full CIOS bodies, which
    blew up XLA compile time for table-sized N.
    """
    from . import pallas_kernels as PK

    if PK.enabled():
        # fused single-kernel path: elementwise over the whole array, so the
        # blocking axis is irrelevant
        shape = a.shape
        flat = a.reshape(spec.nlimbs, -1)
        return PK.batch_inverse_flat(spec, flat).reshape(shape)

    if axis != 1:
        a = jnp.moveaxis(a, axis, 1)
    n = a.shape[1]
    rest = a.shape[2:]
    nl = spec.nlimbs

    k = min(32, n)
    npad = -(-n // k) * k
    flat = a.reshape(nl, n, -1)  # [L, N, R]
    if npad != n:
        ones = spec.broadcast_const(spec.one_mont, (npad - n, flat.shape[-1]))
        flat = jnp.concatenate([flat, ones], axis=1)
    cols = flat.reshape(nl, npad // k, k, -1)  # [L, C, K, R]
    x = jnp.moveaxis(cols, 2, 0)  # [K, L, C, R]

    one = spec.broadcast_const(spec.one_mont, x.shape[2:])

    def fwd(carry, xi):
        nxt = mont_mul(spec, carry, xi)
        return nxt, carry  # emit the *exclusive* prefix

    total, prefix_excl = jax.lax.scan(fwd, one, x)  # total: [L, C, R]
    total_inv = inv_mont(spec, total)

    def bwd(carry, args):
        xi, pi = args
        out = mont_mul(spec, carry, pi)  # inv(x_i) = (prod_{j>i} x_j)^-1-ish
        nxt = mont_mul(spec, carry, xi)
        return nxt, out

    _, inv_rev = jax.lax.scan(
        bwd, total_inv, (x[::-1], prefix_excl[::-1])
    )
    inv = inv_rev[::-1]  # [K, L, C, R]
    out = jnp.moveaxis(inv, 0, 2).reshape(nl, npad, -1)[:, :n]
    out = out.reshape((nl, n) + rest)
    if axis != 1:
        out = jnp.moveaxis(out, 1, axis)
    return out
