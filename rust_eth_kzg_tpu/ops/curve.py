"""Batched G1 arithmetic for the TPU: complete projective formulas over Fp limbs.

TPU-native replacement for blst's G1 group ops (consumed by the reference at
/root/reference/crates/cryptography/bls12_381/src/{lincomb.rs,batch_addition.rs}).
Instead of branchy affine/Jacobian code, we use the *complete* projective
addition/doubling formulas of Renes-Costello-Batina 2015 (eprint 2015/1060,
Algorithms 7-9 specialized to a = 0): they are exception-free — identity,
doubling and inverse inputs all flow through the same straight-line code — so
every lane of the VPU executes the same instructions with no masking for the
group-law edge cases.

A point set is a NamedTuple of three limb arrays `[FP_LIMBS, *batch]` in
Montgomery form. The identity is (0 : R : 0). Coordinates are lazily reduced:
all values stay < 4p between operations (see ops/field.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FP_LIMBS, P
from . import field as F
from . import limbs as limb_utils

FP = F.FP
# b3 = 3*b = 12, premultiplied into Montgomery form, used as a constant multiplier
B3_MONT = limb_utils.int_to_limbs(12 * FP.r_mod_p % P, FP_LIMBS)


class G1(NamedTuple):
    """Projective (X : Y : Z), each [FP_LIMBS, *batch] Montgomery limbs."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[1:]


class G1Affine(NamedTuple):
    """Affine (x, y) + identity mask, each [FP_LIMBS, *batch] / [*batch]."""

    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray  # bool [*batch]


def identity(batch_shape=()) -> G1:
    zero = FP.broadcast_const(FP.zero, batch_shape)
    one = FP.broadcast_const(FP.one_mont, batch_shape)
    return G1(x=zero, y=one, z=zero)


def _mul(a, b):
    return F.mont_mul_values(FP, a, b)


def _mul_b3(a):
    c = FP.broadcast_const(B3_MONT, a.shape[1:])
    return F.mont_mul_values(FP, a, c)


def _add(a, b):
    return F.add_values(FP, a, b)


def _sub(a, b, kp=2):
    return F.sub_values(FP, a, b, kp)


def add_values(p: G1, q: G1) -> G1:
    """Complete projective addition (RCB 2015, Algorithm 7 with a=0, b3 via
    constant Montgomery multiply). Handles identity / doubling / inverse lanes.

    Bound discipline: inputs < 4p per coordinate, outputs < 4p.
    Un-jitted body, shared by the XLA path and the fused Pallas kernel
    (ops/pallas_kernels.py).
    """
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = _mul(x1, x2)
    t1 = _mul(y1, y2)
    t2 = _mul(z1, z2)
    t3 = _sub(_sub(_mul(_add(x1, y1), _add(x2, y2)), t0), t1)  # x1y2 + x2y1, < 6p
    t4 = _sub(_sub(_mul(_add(y1, z1), _add(y2, z2)), t1), t2)  # y1z2 + y2z1, < 6p
    ty = _sub(_sub(_mul(_add(x1, z1), _add(x2, z2)), t0), t2)  # x1z2 + x2z1, < 6p
    t0_3 = _add(_add(t0, t0), t0)  # 3 x1x2, < 6p
    t2_b = _mul_b3(t2)  # 3b z1z2, < 2p
    z3 = _add(t1, t2_b)  # < 4p
    t1_n = _sub(t1, t2_b)  # y1y2 - 3b z1z2, < 4p
    ty_b = _mul_b3(ty)  # 3b (x1z2 + x2z1), < 2p
    x3 = _sub(_mul(t3, t1_n), _mul(t4, ty_b))  # < 4p
    y3 = _add(_mul(t1_n, z3), _mul(ty_b, t0_3))  # < 4p
    z3 = _add(_mul(z3, t4), _mul(t0_3, t3))  # < 4p
    return G1(x=x3, y=y3, z=z3)


def add_mixed_values(p: G1, q_affine: G1Affine) -> G1:
    """Complete mixed addition (RCB Algorithm 8 shape, a=0): q has Z = 1.

    Lanes where `q_affine.inf` is set return `p` unchanged (affine form cannot
    encode the identity, so it is masked at the output select).
    """
    x1, y1, z1 = p
    x2, y2 = q_affine.x, q_affine.y
    t0 = _mul(x1, x2)
    t1 = _mul(y1, y2)
    t3 = _sub(_sub(_mul(_add(x1, y1), _add(x2, y2)), t0), t1)  # < 6p
    t4 = _add(_mul(y2, z1), y1)  # y1 + y2 z1, < 6p
    ty = _add(_mul(x2, z1), x1)  # x1 + x2 z1, < 6p
    t0_3 = _add(_add(t0, t0), t0)
    t2_b = _mul_b3(z1)  # 3b z1, < 2p
    z3 = _add(t1, t2_b)
    t1_n = _sub(t1, t2_b)
    ty_b = _mul_b3(ty)
    x3 = _sub(_mul(t3, t1_n), _mul(t4, ty_b))
    y3 = _add(_mul(t1_n, z3), _mul(ty_b, t0_3))
    z3 = _add(_mul(z3, t4), _mul(t0_3, t3))
    out = G1(x=x3, y=y3, z=z3)
    return select(q_affine.inf, p, out)


def add_affine_values(a: G1Affine, b: G1Affine) -> G1:
    """Affine + affine -> projective, *incomplete* chord formula (8 muls vs 13
    for the complete mixed add). Used for the first level of MSM window-sum
    trees, where both operands are canonical table entries.

    u = y2-y1, v = x2-x1; Z3 = v^3, X3 = v*(u^2 - v^2*(x1+x2)),
    Y3 = u*(x1*v^2 - (u^2 - v^2*(x1+x2))) - y1*v^3.

    Exception lanes:
    - either input identity: handled by output selects on the inf masks.
    - opposite points (v=0, u!=0): X3=Z3=0, Y3=-u^3 != 0 — a valid projective
      identity, correct by construction.
    - equal points (v=0, u=0): returns the invalid (0:0:0). Callers must
      guarantee distinct non-identity inputs. For window sums over fixed-base
      tables two cases arise: lanes pairing *distinct* SRS points, where
      equality would encode a nontrivial discrete-log relation (computationally
      negligible — same assumption as the reference's incomplete batch-affine
      tree, /root/reference/crates/cryptography/bls12_381/src/batch_addition.rs:46-124);
      and lanes pairing the SAME base point across Lim-Lee chains, where
      equality is the scalar condition d1 = ±d2·2^(window·wpc·chains/2) mod r —
      parameter-dependent, so it is checked exhaustively at table-build time
      (ops/msm.py `_assert_no_chord_collision`).

    Bounds: x < p canonical, y < 2p (possibly negated); outputs < 4p.
    """
    x1, y1 = a.x, a.y
    x2, y2 = b.x, b.y
    u = _sub(y2, y1, kp=2)  # < 4p
    v = _sub(x2, x1, kp=2)  # < 3p
    usq = _mul(u, u)  # < 2p
    vsq = _mul(v, v)  # < 2p
    vcu = _mul(v, vsq)  # < 2p
    d = _mul(vsq, _add(x1, x2))  # < 2p
    w = _sub(usq, d, kp=2)  # x3 * v^2, < 4p
    x3 = _mul(v, w)  # < 2p
    t = _sub(_mul(x1, vsq), w, kp=4)  # < 6p
    y3 = _sub(_mul(u, t), _mul(y1, vcu), kp=2)  # < 4p
    one = FP.broadcast_const(FP.one_mont, x1.shape[1:])
    zero = jnp.zeros_like(x1)
    pa = G1(
        x=F.select(a.inf, zero, x1),
        y=F.select(a.inf, one, y1),
        z=F.select(a.inf, zero, one),
    )
    pb = G1(
        x=F.select(b.inf, zero, x2),
        y=F.select(b.inf, one, y2),
        z=F.select(b.inf, zero, one),
    )
    out = G1(x=x3, y=y3, z=vcu)
    out = select(b.inf, pa, out)
    return select(a.inf, pb, out)


def double_values(p: G1) -> G1:
    """Complete projective doubling (RCB Algorithm 9, a=0). Bounds < 4p."""
    x, y, z = p
    t0 = _mul(y, y)
    z3 = F.double_values(FP, F.double_values(FP, F.double_values(FP, t0)))  # 8 y^2, < 16p
    t1 = _mul(y, z)
    t2 = _mul_b3(_mul(z, z))  # 3b z^2, < 2p
    x3 = _mul(t2, z3)  # < 2p
    y3 = _add(t0, t2)  # < 4p
    z3 = _mul(t1, z3)  # < 2p
    t2_3 = _add(_add(t2, t2), t2)  # < 6p
    t0 = _sub(t0, t2_3, kp=8)  # y^2 - 9b z^2 (+8p), < 10p
    y3 = _add(_mul(t0, y3), x3)  # < 4p
    t1 = _mul(x, y)
    x3 = F.double_values(FP, _mul(t0, t1))  # < 4p
    return G1(x=x3, y=y3, z=z3)


# Public jitted entry points. Each dispatches to the fused Pallas kernel when
# it is enabled for the current backend (ops/pallas_kernels.py), otherwise
# traces the straight-line jnp body and lets XLA fuse it.


@jax.jit
def add(p: G1, q: G1) -> G1:
    from . import pallas_kernels as PK

    if PK.enabled():
        return PK.g1_add(p, q)
    return add_values(p, q)


@jax.jit
def add_mixed(p: G1, q_affine: G1Affine) -> G1:
    from . import pallas_kernels as PK

    if PK.enabled():
        return PK.g1_add_mixed(p, q_affine)
    return add_mixed_values(p, q_affine)


@jax.jit
def add_affine(a: G1Affine, b: G1Affine) -> G1:
    from . import pallas_kernels as PK

    if PK.enabled():
        return PK.g1_add_affine(a, b)
    return add_affine_values(a, b)


@jax.jit
def double(p: G1) -> G1:
    from . import pallas_kernels as PK

    if PK.enabled():
        return PK.g1_double(p)
    return double_values(p)


@jax.jit
def neg(p: G1) -> G1:
    return G1(x=p.x, y=F.neg(FP, p.y, kp=4), z=p.z)


def select(cond: jnp.ndarray, a: G1, b: G1) -> G1:
    """Lanewise `cond ? a : b`; cond is [*batch]."""
    c = cond[None]
    return G1(
        x=jnp.where(c, a.x, b.x), y=jnp.where(c, a.y, b.y), z=jnp.where(c, a.z, b.z)
    )


@jax.jit
def is_identity(p: G1) -> jnp.ndarray:
    return F.is_zero(FP, p.z, bound_kp=4)


@jax.jit
def equal(p: G1, q: G1) -> jnp.ndarray:
    """Projective equality: x1 z2 == x2 z1 and y1 z2 == y2 z1 (identity-aware)."""
    both_inf = jnp.logical_and(is_identity(p), is_identity(q))
    one_inf = jnp.logical_xor(is_identity(p), is_identity(q))
    ex = F.equal(FP, _mul(p.x, q.z), _mul(q.x, p.z))
    ey = F.equal(FP, _mul(p.y, q.z), _mul(q.y, p.z))
    return jnp.logical_or(both_inf, jnp.logical_and(~one_inf, ex & ey))


@partial(jax.jit, static_argnums=1)
def reduce_sum(p: G1, axis: int = 1) -> G1:
    """Sum of points along one batch axis by log-depth pairwise addition.

    Each level adds the two halves at *half* width (log2(n) distinct shapes,
    n-1 total point additions — a full-width roll-and-add formulation would
    do n*log2(n)/2, a 6x overspend at n=64, and this tree is the inner loop
    of the fixed-base MSM window sums).
    """
    arrs = [jnp.moveaxis(c, axis, -1) for c in p]
    p = G1(*arrs)
    n = p.x.shape[-1]
    pow2 = 1 << max(n - 1, 0).bit_length()
    if pow2 != n:
        idp = identity(p.batch_shape[:-1] + (pow2 - n,))
        p = G1(*(jnp.concatenate([c, i], axis=-1) for c, i in zip(p, idp)))
        n = pow2
    while n > 1:
        h = n // 2
        lo = G1(*(c[..., :h] for c in p))
        hi = G1(*(c[..., h:] for c in p))
        p = add(lo, hi)
        n = h
    return G1(*(c[..., 0] for c in p))


# --- GLV endomorphism: phi(x, y) = (beta*x, y) acts as multiplication by
# lambda (a cube root of unity mod r on these j=0 curves); scalars split into
# two half-width parts so scalar multiplication needs half the doublings.
# The lattice basis and digit width come from constants (BLS12-381 or the
# tiny test field). ---

from ..constants import GLV_BETA as _GLV_BETA
from ..constants import GLV_BASIS as _GLV_BASIS
from ..constants import GLV_LAMBDA, GLV_NBITS

_GLV_BETA_MONT = limb_utils.int_to_limbs(_GLV_BETA * FP.r_mod_p % P, FP_LIMBS)


def _round_div(a: int, b: int) -> int:
    """round(a / b) for b > 0, correct for negative a."""
    return (2 * a + b) // (2 * b)


def glv_decompose(k: int):
    """k -> (|k1|, k1<0, |k2|, k2<0) with k = k1 + k2*lambda (mod r),
    |ki| < 2^(GLV_NBITS-1): Babai rounding against the short lattice basis
    v1 = (x1, y1), v2 = (x2, y2) of {(x, y) : x + y*lambda = 0 mod r}."""
    from ..constants import R_SCALAR

    x1, y1, x2, y2 = _GLV_BASIS
    det = x1 * y2 - x2 * y1  # = +-r
    if det < 0:
        # _round_div requires a positive divisor (advisor r4-low); negating
        # the whole basis keeps the lattice and flips det positive
        x1, y1, x2, y2, det = -x1, -y1, -x2, -y2, -det
    k %= R_SCALAR
    c1 = _round_div(k * y2, det)
    c2 = _round_div(-k * y1, det)
    k1 = k - c1 * x1 - c2 * x2
    k2 = -(c1 * y1 + c2 * y2)
    assert (k1 + k2 * GLV_LAMBDA) % R_SCALAR == k
    assert abs(k1) < (1 << (GLV_NBITS - 1)) and abs(k2) < (1 << (GLV_NBITS - 1))
    return abs(k1), k1 < 0, abs(k2), k2 < 0


def glv_bits_host(scalars: list[int]):
    """Host ints -> (bits1 [GLV_NBITS, N], neg1 [N], bits2, neg2) numpy arrays
    (MSB-first bits). Bit extraction is vectorized (to_bytes + unpackbits):
    the per-bit Python loop cost ~30 ms for a 384-scalar verify batch."""
    n = len(scalars)
    nbytes = (GLV_NBITS + 7) // 8
    raw1 = bytearray(n * nbytes)
    raw2 = bytearray(n * nbytes)
    neg1 = np.zeros(n, dtype=bool)
    neg2 = np.zeros(n, dtype=bool)
    for i, k in enumerate(scalars):
        a1, n1, a2, n2 = glv_decompose(int(k))
        neg1[i], neg2[i] = n1, n2
        raw1[i * nbytes : (i + 1) * nbytes] = a1.to_bytes(nbytes, "big")
        raw2[i * nbytes : (i + 1) * nbytes] = a2.to_bytes(nbytes, "big")
    pad = 8 * nbytes - GLV_NBITS  # leading pad bits in each big-endian block
    bits1 = np.unpackbits(
        np.frombuffer(bytes(raw1), dtype=np.uint8).reshape(n, nbytes), axis=1
    )[:, pad:].T.astype(bool)
    bits2 = np.unpackbits(
        np.frombuffer(bytes(raw2), dtype=np.uint8).reshape(n, nbytes), axis=1
    )[:, pad:].T.astype(bool)
    return bits1, neg1, bits2, neg2


@jax.jit
def glv_endomorphism(p: G1) -> G1:
    return G1(x=F.mont_mul_const(FP, p.x, _GLV_BETA_MONT), y=p.y, z=p.z)


@jax.jit
def scalar_mul_glv(
    p: G1,
    bits1: jnp.ndarray,
    neg1: jnp.ndarray,
    bits2: jnp.ndarray,
    neg2: jnp.ndarray,
) -> G1:
    """k*p via the GLV split with width-2 windows: a 16-entry on-the-fly
    table {a*P1 + b*P2 : a, b in 0..3} turns the ~130-bit double-and-add into
    65 iterations of (2 doublings + 1 table add) — the sequential step count
    is what dominates on narrow batches (G1-FFT twiddles, verifier MSMs).

    bits*: [GLV_NBITS, *batch] MSB-first; neg*: [*batch].
    """
    p1 = select(neg1, neg(p), p)
    phi = glv_endomorphism(p)
    p2 = select(neg2, neg(phi), phi)
    ident = identity(p.batch_shape)

    # table[a*4+b] = a*P1 + b*P2 (16 entries, batched); 2 doublings + 11 adds
    p1_2 = double(p1)
    p1_3 = add(p1_2, p1)
    p2_2 = double(p2)
    p2_3 = add(p2_2, p2)
    row0 = [ident, p2, p2_2, p2_3]
    row1 = [add(a, p1) for a in row0]
    row2 = [add(a, p1_2) for a in row0]
    row3 = [add(a, p1_3) for a in row0]
    entries = row0 + row1 + row2 + row3
    table = G1(
        *(jnp.stack([e[i] for e in entries]) for i in range(3))
    )  # [16, L, *batch]

    # 2-bit MSB-first digits: d = (4*d1 + d2) indexes the table
    nb = bits1.shape[0]
    assert nb % 2 == 0
    d1 = 2 * bits1[0::2].astype(jnp.int32) + bits1[1::2].astype(jnp.int32)
    d2 = 2 * bits2[0::2].astype(jnp.int32) + bits2[1::2].astype(jnp.int32)
    digits = 4 * d1 + d2  # [nb/2, *batch] in 0..15

    def pick(tab, d):
        """Binary select tree over the leading size-16 axis; d: [*batch]."""
        k = tab.x.shape[0]
        bit = 8
        while k > 1:
            h = k // 2
            m = (d & bit) != 0
            tab = G1(
                *(jnp.where(m[None, None], c[h:], c[:h]) for c in tab)
            )
            k = h
            bit >>= 1
        return G1(*(c[0] for c in tab))

    def step(acc, d):
        acc = double(double(acc))
        return add(acc, pick(table, d)), None

    acc, _ = jax.lax.scan(step, ident, digits)
    return acc


@partial(jax.jit, static_argnums=1)
def scalar_mul_static(p: G1, k: int) -> G1:
    """k*p for a compile-time integer k: double-and-add as a `lax.scan` over
    the static bit pattern, so the compiled graph holds ONE double/add body
    regardless of bits(k). Used for the endomorphism subgroup check
    (multiply by z^2 - 1) where k is a fixed curve constant.
    """
    if k == 0:
        return identity(p.batch_shape)
    nbits = k.bit_length()
    bits = jnp.asarray(
        [(k >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=bool
    )
    acc0 = identity(p.batch_shape)

    def step(acc, bit):
        acc = double(acc)
        with_p = add(acc, p)
        return select(jnp.broadcast_to(bit, acc.batch_shape), with_p, acc), None

    acc, _ = jax.lax.scan(step, acc0, bits)
    return acc


@jax.jit
def scalar_mul(p: G1, scalar_bits: jnp.ndarray) -> G1:
    """Double-and-add: scalar_bits is [nbits, *batch] (MSB first), p is [*batch].

    Constant sequence of complete ops per lane; used for small/irregular scalar
    multiplications (the hot paths use windowed MSM kernels instead).
    """
    acc = identity(p.batch_shape)

    def step(acc, bits):
        acc = double(acc)
        with_p = add(acc, p)
        return select(bits, with_p, acc), None

    acc, _ = jax.lax.scan(step, acc, scalar_bits)
    return acc


@jax.jit
def batch_normalize(p: G1) -> G1Affine:
    """Projective -> affine over the full batch with one Montgomery inversion.

    Equivalent of the reference's `g1_batch_normalize`
    (/root/reference/crates/cryptography/bls12_381/src/lib.rs:56-104);
    identity lanes are flagged and mapped to (0, 0).

    All arithmetic runs on 2-D [L, N] views: a small trailing batch dim
    (e.g. the table builder's 16-wide multiples axis) otherwise tiles as
    (8, 128) with up to 8x HBM padding on every temp, which OOMs the
    table-build program at mainnet shapes.
    """
    batch = p.batch_shape
    p = G1(*(c.reshape(FP_LIMBS, -1) for c in p))
    inf = is_identity(p)
    one = FP.broadcast_const(FP.one_mont, p.batch_shape)
    z_safe = F.select(inf, one, p.z)
    zinv = F.batch_inverse(FP, z_safe, axis=1)
    x = F.canonical(FP, _mul(p.x, zinv))
    y = F.canonical(FP, _mul(p.y, zinv))
    zero = FP.broadcast_const(FP.zero, p.batch_shape)
    return G1Affine(
        x=F.select(inf, zero, x).reshape((FP_LIMBS,) + batch),
        y=F.select(inf, zero, y).reshape((FP_LIMBS,) + batch),
        inf=inf.reshape(batch),
    )


# ---------------------------------------------------------------------------
# Host <-> device conversion
# ---------------------------------------------------------------------------


def points_to_device(points) -> G1:
    """List of host affine points ((x, y) ints or None) -> projective G1 [.., N].

    The three coordinate arrays ship as ONE packed device_put: on the
    tunneled remote TPU every host->device transfer costs a ~20 ms round
    trip, so three separate uploads tripled the latency of every
    verifier-path point transfer."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            zs.append(1)
    packed = np.concatenate(
        [FP.to_mont_host(xs), FP.to_mont_host(ys), FP.to_mont_host(zs)], axis=0
    )
    dev = jnp.asarray(packed)
    nl = FP.nlimbs
    return G1(x=dev[:nl], y=dev[nl : 2 * nl], z=dev[2 * nl :])


def affine_to_device(points) -> G1Affine:
    """List of host affine points -> G1Affine arrays (identity lanes masked)."""
    xs, ys, inf = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(1)
            inf.append(True)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            inf.append(False)
    return G1Affine(
        x=jnp.asarray(FP.to_mont_host(xs)),
        y=jnp.asarray(FP.to_mont_host(ys)),
        inf=jnp.asarray(np.array(inf)),
    )


@jax.jit
def _pack_affine(p: G1) -> jnp.ndarray:
    """Normalize + pack (x, y, inf) into one array for a single-RTT fetch."""
    aff = batch_normalize(p)
    return jnp.concatenate(
        [aff.x, aff.y, aff.inf[None].astype(aff.x.dtype)], axis=0
    )


def points_from_device(p: G1) -> list:
    """Projective G1 (any batch shape, flattened) -> list of host affine/None.

    One packed device->host fetch: on the tunneled remote TPU each fetch is
    a ~20 ms round trip, and the x/y/inf triple fetched separately put three
    of them on the verify critical path."""
    flat = G1(*(c.reshape(FP_LIMBS, -1) for c in p))
    host = np.asarray(_pack_affine(flat))
    xs = FP.from_mont_host(host[:FP_LIMBS])
    ys = FP.from_mont_host(host[FP_LIMBS : 2 * FP_LIMBS])
    inf = host[2 * FP_LIMBS].astype(bool)
    return [None if i else (x, y) for x, y, i in zip(xs, ys, inf)]


def affine_from_device(aff: G1Affine) -> list:
    packed = jnp.concatenate(
        [
            aff.x.reshape(FP_LIMBS, -1),
            aff.y.reshape(FP_LIMBS, -1),
            aff.inf.reshape(1, -1).astype(aff.x.dtype),
        ],
        axis=0,
    )
    host = np.asarray(packed)  # one device->host round trip
    xs = FP.from_mont_host(host[:FP_LIMBS])
    ys = FP.from_mont_host(host[FP_LIMBS : 2 * FP_LIMBS])
    inf = host[2 * FP_LIMBS].astype(bool)
    return [None if i else (x, y) for x, y, i in zip(xs, ys, inf)]
