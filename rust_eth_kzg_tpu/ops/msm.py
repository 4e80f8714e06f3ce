"""MSM engines: fixed-base windowed tables and generic lincomb.

TPU-native rebuild of the reference MSM stack
(/root/reference/crates/cryptography/bls12_381/src/{lincomb.rs,fixed_base_msm.rs,
fixed_base_msm_window.rs,booth_encoding.rs,batch_addition.rs}):

- `FixedBaseMSM` replaces the Booth-window + batch-affine-addition design with a
  TPU-shaped equivalent: signed w-bit digits are extracted on device, table
  entries are fetched with one gather per window, and each window's point sum
  is a log-depth tree of *complete* projective additions (no batch-inversion
  trick needed — the complete formulas are branch-free already). A Horner loop
  over windows shares the doublings across all points.
- `lincomb` (variable-base MSM) is a batched double-and-add + log-tree
  reduction; identity points and zero scalars flow through the complete
  formulas without the reference's filtering step (lincomb.rs:13-22).

Many *independent* MSMs (e.g. FK20's 128 per blob) are one batched call —
batch axes ride the VPU lanes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FP_LIMBS, FR_LIMBS, LIMB_BITS, SCALAR_BITS
from . import curve as C
from . import field as F

FR = F.FR
FP = F.FP


def scalar_bits_msb(scalars_mont: jnp.ndarray, nbits: int | None = None) -> jnp.ndarray:
    """Montgomery Fr scalars [L, *batch] -> MSB-first bit array [nbits, *batch]."""
    if nbits is None:
        nbits = min(SCALAR_BITS - 1, FR.modulus.bit_length())
    std = F.from_mont(FR, scalars_mont)  # canonical standard form
    zero = jnp.zeros_like(std[0])
    rows = []
    for t in range(nbits - 1, -1, -1):
        limb, off = divmod(t, LIMB_BITS)
        rows.append((std[limb] >> off) & 1 if limb < std.shape[0] else zero)
    return jnp.stack(rows).astype(bool)


@partial(jax.jit, static_argnums=1)
def signed_digits(scalars_mont: jnp.ndarray, window: int) -> jnp.ndarray:
    """Signed w-bit digit decomposition (LSB window first): [n_win, *batch] int32.

    k = sum_t d_t 2^(w t) with d_t in [-2^(w-1), 2^(w-1)]. Device analog of
    `get_booth_index` (/root/reference/crates/cryptography/bls12_381/src/
    booth_encoding.rs:4-46).
    """
    std = F.from_mont(FR, scalars_mont)
    n_win = SCALAR_BITS // window + 1
    half = 1 << (window - 1)
    full = 1 << window
    unsigned = []
    for t in range(n_win):
        lo_bit = t * window
        acc = jnp.zeros_like(std[0])
        for b in range(window):
            bit = lo_bit + b
            limb, off = divmod(bit, LIMB_BITS)
            if limb < std.shape[0]:
                acc = acc | (((std[limb] >> off) & 1) << b)
        unsigned.append(acc)
    u = jnp.stack(unsigned)  # [n_win, *batch]

    def step(carry, ut):
        e = ut + carry
        over = e > half
        d = jnp.where(over, e - full, e)
        return over.astype(jnp.int32), d

    _, digits = jax.lax.scan(step, jnp.zeros_like(u[0]), u)
    return digits


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class FixedBaseMSM:
    """Precomputed window tables for a fixed point set.

    table_rows: [*instance, chains*P, 2*FP_LIMBS, D] float32 — the affine
    Montgomery x-limbs then y-limbs (each limb < 2^15, exact in f32) of
    d * (2^(window*wpc*j) point_i) for d = 1..D (D = 2^(w-1)), chain
    j = 0..chains-1. The f32/limbs-by-D layout exists because table lookups
    run as one-hot MXU matmuls: XLA's native gather moves ~1 GB/s on this
    table while a batched [2L, D] x [D, n_digit_rows] matmul streams it at
    matrix-unit speed (and one matmul serves every window at once).
    base_inf: [*instance, chains*P] identity mask of the base points (every
    multiple of an identity base is the identity, so no per-entry mask is
    needed).

    `chains` is the Lim-Lee comb factor: scalar windows are split across
    `chains` pre-scaled copies of the point set, shrinking the sequential
    Horner doubling chain from ~SCALAR_BITS to window*wpc at the cost of
    chains-times table memory. `wpc` = windows per chain.
    """

    table_rows: jnp.ndarray
    base_inf: jnp.ndarray
    window: int
    # number of leading "instance" axes in the table's point dims: the tables
    # may hold many independent MSM problems (FK20 keeps one 64-point MSM per
    # proof slot), aligned against the trailing batch axes of the scalars.
    instance_ndim: int = 0
    chains: int = 1
    wpc: int = 0

    @property
    def num_points(self) -> int:
        return self.table_rows.shape[-3] // self.chains

    @property
    def digits_per_entry(self) -> int:
        return self.table_rows.shape[-1]

    def tree_flatten(self):
        return (self.table_rows, self.base_inf), (
            self.window,
            self.instance_ndim,
            self.chains,
            self.wpc,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(
            *children,
            window=aux[0],
            instance_ndim=aux[1],
            chains=aux[2],
            wpc=aux[3],
        )


@partial(jax.jit, static_argnums=2)
def _table_chunk(acc: C.G1, pows, dc: int):
    """Next dc multiples starting at `acc`, normalized to affine [L, P, dc].

    Log-depth block doubling (round-4 init fix): the block of multiples
    [acc, acc+B, ..., acc+(w-1)B] extends to width 2w with ONE batched
    complete add of w*B (`pows[j]` = 2^j * B, precomputed by the caller) —
    log2(dc) batched adds instead of dc sequential ones. The old per-step
    scan was latency-bound and dominated cold context initialization.
    """
    block = C.G1(*(c[..., None] for c in acc))
    w, j = 1, 0
    while w < dc:
        pw = pows[j]
        ext = C.add(
            block,
            C.G1(*(jnp.broadcast_to(c[..., None], c.shape + (w,)) for c in pw)),
        )
        block = C.G1(
            *(jnp.concatenate([b, e], axis=-1) for b, e in zip(block, ext))
        )
        w, j = 2 * w, j + 1
    acc_next = C.add(acc, pows[j])  # + dc * B
    return acc_next, C.batch_normalize(block)


@jax.jit
def _rows_layout(aff_x: jnp.ndarray, aff_y: jnp.ndarray) -> jnp.ndarray:
    """[L, *pts, dc] x/y limb arrays -> [*pts, 4L, dc] bf16 matmul layout.

    Each 15-bit limb is split into 8-bit hi/lo halves so the one-hot table
    matmul is exact at the MXU's native bf16 rate (bf16 has an 8-bit
    mantissa; f32 dots at DEFAULT precision also round through bf16 passes).
    Row order: [x_hi, y_hi, x_lo, y_lo], each block 2L rows.
    """
    rows = jnp.concatenate([aff_x, aff_y], axis=0)  # [2L, *pts, dc]
    hi = rows >> 8
    lo = rows & 0xFF
    split = jnp.concatenate([hi, lo], axis=0)  # [4L, *pts, dc]
    return jnp.moveaxis(split, 0, -2).astype(jnp.bfloat16)


def _build_tables(points: C.G1, window: int):
    """points: G1 [*pts] -> multiples 1..2^(w-1) as [*pts, 4L, D] bf16 tables.

    Built in chunks along the multiples axis (dc) AND in slices along the
    point axis: the working set of one (slice, chunk) build step is
    slice_pts * dc lanes ~ 1M (the block multiples + normalize temporaries
    peak at ~2 GB) regardless of the total table size. The un-sliced mainnet
    fk20 build (32768 chained points x 64-wide blocks) exhausted HBM.
    Slices share one flattened shape, so `_table_chunk` compiles once and is
    reused across the fk20 and commit builds (both slice to 16384 points)."""
    d = 1 << (window - 1)
    base_aff = C.batch_normalize(points)
    dc = min(64, d)
    nlev = dc.bit_length() - 1
    pshape = points.x.shape[1:]
    npts = int(np.prod(pshape, dtype=np.int64))
    flat = C.G1(*(c.reshape(c.shape[0], npts) for c in points))
    pows_full = [flat]  # 2^j * B for j = 0..log2(dc)
    for _ in range(nlev):
        pows_full.append(C.double(pows_full[-1]))
    slice_pts = max(1, min(npts, (1 << 20) // dc))
    out_slices = []
    for s0 in range(0, npts, slice_pts):
        s1 = min(npts, s0 + slice_pts)
        acc = C.G1(*(c[:, s0:s1] for c in flat))
        pows = tuple(
            C.G1(*(c[:, s0:s1] for c in p)) for p in pows_full
        )
        rows = []
        for _ in range(d // dc):
            acc, aff = _table_chunk(acc, pows, dc)
            rows.append(_rows_layout(aff.x, aff.y))
        out_slices.append(jnp.concatenate(rows, axis=-1))  # [S, 4L, D]
    rows_all = (
        out_slices[0]
        if len(out_slices) == 1
        else jnp.concatenate(out_slices, axis=0)
    )
    return rows_all.reshape(pshape + rows_all.shape[1:]), base_aff.inf


@partial(jax.jit, static_argnums=(1, 2))
def _chain_scaled_points(points: C.G1, chains: int, shift_bits: int) -> C.G1:
    """Concatenate 2^(shift_bits*j) * points for j = 0..chains-1 on the point
    axis (the Lim-Lee pre-scaling; setup-time only)."""
    sets = [points]
    base = points
    for j in range(chains - 1):
        def dbl(_, p):
            return C.double(p)

        base = jax.lax.fori_loop(0, shift_bits, dbl, base)
        sets.append(base)
    return C.G1(
        *(jnp.concatenate([s[i] for s in sets], axis=-1) for i in range(3))
    )


def _assert_no_chord_collision(window: int, wpc: int, chains: int) -> None:
    """Prove the incomplete chord add in _window_sums can never see equal points.

    The first window-sum tree level pairs lane (chain c, point p) with lane
    (chain c + chains/2, point p) — the SAME base point pre-scaled by
    2^(window*wpc*chains/2). Those lanes are equal iff
        d1 = ±d2 * 2^(window*wpc*chains/2)  (mod r)
    for table digits d1, d2 in [1, 2^(window-1)]. This is a parameter-dependent
    invariant (advisor r1-low), so check it exhaustively for the chosen
    (window, wpc, chains) — 2^(w-1) modular muls at table-build time.
    """
    from ..constants import R_SCALAR

    d_max = 1 << (window - 1)
    shift = pow(2, window * wpc * (chains // 2), R_SCALAR)
    for d2 in range(1, d_max + 1):
        t = (d2 * shift) % R_SCALAR
        if 1 <= t <= d_max or 1 <= R_SCALAR - t <= d_max:
            raise AssertionError(
                f"chord-add collision: d2={d2} maps into the digit range for "
                f"(window={window}, wpc={wpc}, chains={chains}); the first "
                "window-sum tree level would produce the invalid (0:0:0)"
            )


def build_fixed_base_msm(
    points: C.G1, window: int, instance_ndim: int = 0, chains: int = 4
) -> FixedBaseMSM:
    """points: G1 with batch shape [*instance, P].

    `chains` > 1 enables the Lim-Lee comb: the table holds `chains` pre-scaled
    copies of the points and the MSM's sequential doubling chain shrinks by
    the same factor (doublings run on a narrow accumulator and dominate
    latency otherwise). chains=4, window=8 costs 4x table memory and cuts the
    Horner depth 33 -> 9 windows.
    """
    n_win = SCALAR_BITS // window + 1
    wpc = -(-n_win // chains)
    if chains > 1 and chains % 2 == 0:
        _assert_no_chord_collision(window, wpc, chains)
    if chains > 1:
        points = _chain_scaled_points(points, chains, window * wpc)
    rows, base_inf = _build_tables(points, window)
    return FixedBaseMSM(
        table_rows=rows,
        base_inf=base_inf,
        window=window,
        instance_ndim=instance_ndim,
        chains=chains,
        wpc=wpc,
    )


def _gather_rows(tables: FixedBaseMSM, idx: jnp.ndarray):
    """Look up table rows for every window at once as one one-hot MXU matmul.

    idx: [W, *lead, *inst, CP] clamped digit indices (|d|-1). Returns
    (gx, gy) int32 limb arrays [FP_LIMBS, W, *lead, *inst, CP]. The batched
    [2L, D] x [D, W*lead] matmul per (inst, point) streams the whole table
    through the MXU once for all windows — XLA's native gather on this table
    runs ~1 GB/s and was 90% of MSM time.
    """
    tbl = tables.table_rows  # [*inst, CP, 4L, D] bf16 (8-bit hi/lo splits)
    inst_cp = tbl.shape[:-2]
    fourl, dcount = tbl.shape[-2], tbl.shape[-1]
    twol = fourl // 2
    ncp = len(inst_cp)
    sp = int(np.prod(inst_cp, dtype=np.int64))
    lead = idx.shape[: idx.ndim - ncp]  # (W, *lead)
    wb = int(np.prod(lead, dtype=np.int64))

    # one-hot of the digit index, [sp, D, wb]; 0/1 is exact in bf16 and each
    # output is a single 8-bit table half, so the bf16 MXU passes are exact
    perm = tuple(range(idx.ndim - ncp, idx.ndim)) + tuple(
        range(idx.ndim - ncp)
    )
    idx_t = idx.transpose(perm).reshape(sp, wb)
    oh = (idx_t[:, None, :] == jnp.arange(dcount, dtype=jnp.int32)[None, :, None])
    rows4 = jax.lax.dot_general(
        tbl.reshape(sp, fourl, dcount),
        oh.astype(jnp.bfloat16),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [sp, 4L, wb]
    rows4 = rows4.astype(jnp.int32).transpose(1, 2, 0)  # [4L, wb, sp]
    rows = (rows4[:twol] << 8) | rows4[twol:]  # recombine hi/lo
    rows = rows.reshape((twol,) + lead + inst_cp)
    return rows[:FP_LIMBS], rows[FP_LIMBS:]


def _window_sums(tables: FixedBaseMSM, digits: jnp.ndarray) -> C.G1:
    """Window sums for ALL windows at once.

    digits: [W, *lead, *inst, CP] signed digits. Returns G1 with batch shape
    [W, *lead, *inst] (the point axis reduced by a chord + complete-add tree).
    """
    idx = jnp.maximum(jnp.abs(digits) - 1, 0)
    gx, gy = _gather_rows(tables, idx)
    ncp = tables.instance_ndim + 1
    binf = tables.base_inf.reshape(
        (1,) * (digits.ndim - ncp) + tables.base_inf.shape
    )
    inf = jnp.logical_or(digits == 0, binf)
    gy = F.select(digits < 0, F.neg(FP, gy, kp=2), gy)
    k = gx.shape[-1]
    if k % 2 == 0 and k > 1:
        # first tree level as an *incomplete* affine chord addition (8 vs 13
        # field muls; see curve.add_affine_values for why equal-point lanes
        # cannot occur over fixed-base tables)
        h = k // 2
        lo = C.G1Affine(x=gx[..., :h], y=gy[..., :h], inf=inf[..., :h])
        hi = C.G1Affine(x=gx[..., h:], y=gy[..., h:], inf=inf[..., h:])
        proj = C.add_affine(lo, hi)
    else:
        one = FP.broadcast_const(FP.one_mont, gx.shape[1:])
        zero = FP.broadcast_const(FP.zero, gx.shape[1:])
        proj = C.G1(
            x=F.select(inf, zero, gx),
            y=F.select(inf, one, gy),
            z=F.select(inf, zero, one),
        )
    return C.reduce_sum(proj, axis=proj.x.ndim - 1)


@jax.jit
def fixed_base_msm(tables: FixedBaseMSM, scalars_mont: jnp.ndarray) -> C.G1:
    """MSM over the fixed point set: sum_i k_i * P_i.

    scalars_mont: [FR_LIMBS, *batch, P] with P == tables.num_points. Returns a
    G1 with batch shape [*batch]. Replaces FixedBaseMSMPrecompWindow::msm
    (/root/reference/crates/cryptography/bls12_381/src/fixed_base_msm_window.rs:102-168):
    all window sums are computed up front (one table matmul + one batched
    addition tree across every window), then a short Horner scan shares the
    `w` doublings per window across all points and batched MSM instances.
    With Lim-Lee chains, window j*wpc+s addresses chain j's pre-scaled copy
    of the point set, so the Horner runs over only `wpc` steps.
    """
    w = tables.window
    digits = signed_digits(scalars_mont, w)  # [n_win, *batch, P]
    n_win = digits.shape[0]

    chains, wpc = tables.chains, tables.wpc
    if chains > 1:
        pad = chains * wpc - n_win
        digits = jnp.pad(digits, [(0, pad)] + [(0, 0)] * (digits.ndim - 1))
        d = digits.reshape((chains, wpc) + digits.shape[1:])
        d = jnp.moveaxis(d, 0, -2)  # [wpc, *batch, chains, P]
        digits = d.reshape((wpc,) + d.shape[1:-2] + (chains * d.shape[-1],))
        n_win = wpc

    wsums = _window_sums(tables, digits)  # G1 [n_win, *batch]
    if n_win == 1:
        return C.G1(*(c[:, 0] for c in wsums))

    acc = C.G1(*(c[:, n_win - 1] for c in wsums))
    rest = C.G1(*(jnp.moveaxis(c, 1, 0)[n_win - 2 :: -1] for c in wsums))

    # Horner over the remaining windows, most significant first, as a scan so
    # the program size stays one window-body regardless of scalar width.
    def step(acc, ws):
        for _ in range(w):
            acc = C.double(acc)
        return C.add(acc, C.G1(*ws)), None

    acc, _ = jax.lax.scan(step, acc, tuple(rest))
    return acc


def _gather_lanes(arrs: list[jnp.ndarray], idx: jnp.ndarray, src_len: int):
    """Gather along the last axis via an exact one-hot MXU matmul.

    arrs: list of [L_i, *batch, src_len] int32 limb arrays (15-bit limbs);
    idx: [*batch, m] int32 with values in [0, src_len). Returns the list of
    [L_i, *batch, m] arrays with out[..., i] = in[..., idx[..., i]].

    XLA's native gather on TPU moves these limb arrays at ~1 GB/s; the
    batched [2L, n] x [n, m] one-hot matmul streams them through the MXU
    instead (the same trick as `_gather_rows`). Each 15-bit limb splits into
    exact-in-bf16 8-bit halves, and each one-hot column has exactly one 1,
    so the f32-accumulated product is exact.
    """
    cat = jnp.concatenate(arrs, axis=0)
    lt = cat.shape[0]
    batch = cat.shape[1:-1]
    m = idx.shape[-1]
    sp = int(np.prod(batch, dtype=np.int64)) if batch else 1
    vals = cat.reshape(lt, sp, src_len)
    v2 = jnp.concatenate([vals >> 8, vals & 0xFF], axis=0).astype(jnp.bfloat16)
    v2 = jnp.moveaxis(v2, 1, 0)  # [sp, 2Lt, n]
    oh = (
        idx.reshape(sp, m)[:, None, :]
        == jnp.arange(src_len, dtype=jnp.int32)[None, :, None]
    )  # [sp, n(j), m(i)]
    out = jax.lax.dot_general(
        v2,
        oh.astype(jnp.bfloat16),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # [sp, 2Lt, m]
    out = jnp.moveaxis(out, 0, 1)
    res = (out[:lt] << 8) | out[lt:]
    res = res.reshape((lt,) + batch + (m,))
    splits = []
    off = 0
    for a in arrs:
        splits.append(res[off : off + a.shape[0]])
        off += a.shape[0]
    return splits


def _incl_scan_add(p: C.G1) -> C.G1:
    """Work-efficient inclusive prefix scan of group addition (last axis).

    Recursive pairing (Ladner-Fischer shape): combine adjacent pairs, scan
    the half-length array, then fix up even positions — 2n total complete
    adds at halving lane widths, vs n*log2(n) for Hillis-Steele. This is the
    cost that made the round-4 Pippenger 253 ms; the scan is its hot loop.
    n must be a power of two (callers pad with identity).
    """
    n = p.x.shape[-1]
    if n == 1:
        return p
    even = C.G1(*(c[..., 0::2] for c in p))
    odd = C.G1(*(c[..., 1::2] for c in p))
    s = _incl_scan_add(C.add(even, odd))  # [.., n/2] pair-inclusive sums
    idp = C.identity(p.batch_shape[:-1] + (1,))
    sprev = C.G1(
        *(jnp.concatenate([i, c[..., :-1]], axis=-1) for i, c in zip(idp, s))
    )
    out_even = C.add(sprev, even)
    return C.G1(
        *(
            jnp.stack([ce, co], axis=-1).reshape(ce.shape[:-1] + (n,))
            for ce, co in zip(out_even, s)
        )
    )


@partial(jax.jit, static_argnums=2)
def pippenger_msm(
    points: C.G1, scalars_mont: jnp.ndarray, window: int = 8
) -> C.G1:
    """Variable-base MSM sum_i k_i P_i by signed-window bucket accumulation.

    TPU-native Pippenger, replacing blst's `multi_exp` behind `g1_lincomb`
    (/root/reference/crates/cryptography/bls12_381/src/lincomb.rs:29-59). The
    serial bucket loop becomes data-parallel machinery:

    1. signed w-bit digits per window (shared `signed_digits`);
    2. per window, argsort the lanes by bucket index |d|-1 (one XLA sort);
       zero digits sort last as bucket h and become identity lanes;
    3. permute the signed points into sorted order with the one-hot MXU
       matmul (`_gather_lanes` — XLA's gather is ~1 GB/s on these arrays);
    4. ONE plain (unsegmented) suffix scan T[i] = sum_{j>=i} P_sorted[j] via
       the work-efficient `_incl_scan_add` on the reversed array — 2N
       complete adds per window, not the N*log2(N) of round 4's segmented
       Hillis-Steele;
    5. the window sum falls out of the identity
           sum_b (b+1) * bucket_b = sum_{j=0..h-1} S_j,
       where S_j = sum over lanes with bucket >= j = T[start_j] and
       start_j = #lanes with bucket < j (a cumsum of the one-hot histogram);
       gather T at the h start positions and tree-reduce — no per-bucket
       totals, no segment flags;
    6. Horner over windows (w doublings + 1 add per window).

    points: G1 [*batch, N]; scalars_mont: [FR_LIMBS, *batch, N]. Returns G1
    with batch shape [*batch]. Total group work ~(2N + h) complete adds per
    window — within 2x of serial Pippenger's N + 2h, on fully parallel lanes.
    """
    digits = signed_digits(scalars_mont, window)  # [W, *batch, N] int32
    n_win = digits.shape[0]
    h = 1 << (window - 1)
    n = points.x.shape[-1]
    pow2 = 1 << max(n - 1, 0).bit_length()

    # per-window signed points: negate y where d < 0, identity where d == 0
    d = digits
    neg_mask = d < 0
    zero_mask = d == 0
    bx = jnp.broadcast_to(points.x[:, None], (FP_LIMBS,) + d.shape)
    by = jnp.broadcast_to(points.y[:, None], (FP_LIMBS,) + d.shape)
    bz = jnp.broadcast_to(points.z[:, None], (FP_LIMBS,) + d.shape)
    by = F.select(neg_mask, F.neg(FP, by, kp=4), by)
    one = FP.broadcast_const(FP.one_mont, d.shape)
    zero = jnp.zeros_like(bx)
    bx = F.select(zero_mask, zero, bx)
    by = F.select(zero_mask, one, by)
    bz = F.select(zero_mask, zero, bz)

    # bucket index per lane; zero-digit lanes get h so they sort to the end
    # (they are identity points, harmless inside the suffix scan)
    b_idx = jnp.where(zero_mask, h, jnp.abs(d) - 1)  # [W, *batch, N]
    if pow2 != n:
        pad = pow2 - n
        padw = [(0, 0)] * (b_idx.ndim - 1) + [(0, pad)]
        b_idx = jnp.pad(b_idx, padw, constant_values=h)
        padl = [(0, 0)] + padw
        bx = jnp.pad(bx, padl)
        bz = jnp.pad(bz, padl)
        by = jnp.pad(by, padl)
        by = by.at[..., n:].set(one[..., :1])  # identity (0 : 1 : 0)
    order = jnp.argsort(b_idx, axis=-1).astype(jnp.int32)

    px, py, pz = _gather_lanes([bx, by, bz], order, pow2)
    rev = C.G1(
        *(c[..., ::-1] for c in C.G1(px, py, pz))
    )
    pre = _incl_scan_add(rev)  # pre[i] = sum of last i+1 sorted lanes
    t_scan = C.G1(*(c[..., ::-1] for c in pre))  # T[i] = sum_{j>=i}
    idp = C.identity(t_scan.batch_shape[:-1] + (1,))
    t_scan = C.G1(
        *(jnp.concatenate([c, i], axis=-1) for c, i in zip(t_scan, idp))
    )  # T[pow2] = identity (start_j == pow2 <=> S_j empty)

    # start_j = #lanes with bucket < j, from the unsorted histogram
    counts = jnp.sum(
        b_idx[..., None] == jnp.arange(h, dtype=jnp.int32), axis=-2
    )  # [W, *batch, h]
    start = jnp.cumsum(counts, axis=-1) - counts  # exclusive prefix

    sx, sy, sz = _gather_lanes(
        [t_scan.x, t_scan.y, t_scan.z], start.astype(jnp.int32), pow2 + 1
    )
    wsums = C.reduce_sum(C.G1(sx, sy, sz), axis=sx.ndim - 1)  # [W, *batch]

    # Horner over windows, most significant first
    acc = C.G1(*(c[:, n_win - 1] for c in wsums))
    rest = C.G1(*(jnp.moveaxis(c, 1, 0)[n_win - 2 :: -1] for c in wsums))

    def step(acc, ws):
        for _ in range(window):
            acc = C.double(acc)
        return C.add(acc, C.G1(*ws)), None

    acc, _ = jax.lax.scan(step, acc, tuple(rest))
    return acc


def lincomb_host(points: C.G1, scalars: list[int]) -> C.G1:
    """Variable-base MSM where the scalars are host integers (verifier paths):
    GLV-split double-and-add (half the depth of the generic `lincomb`)."""
    b1, n1, b2, n2 = C.glv_bits_host([int(s) for s in scalars])
    per_point = C.scalar_mul_glv(
        points, jnp.asarray(b1), jnp.asarray(n1), jnp.asarray(b2), jnp.asarray(n2)
    )
    return C.reduce_sum(per_point, axis=per_point.x.ndim - 1)


def lincomb(points: C.G1, scalars_mont: jnp.ndarray) -> C.G1:
    """Variable-base MSM sum_i k_i * P_i over the last batch axis.

    points: G1 [*batch, N]; scalars_mont: [FR_LIMBS, *batch, N]. The complete
    formulas make the reference's identity/zero filtering
    (/root/reference/crates/cryptography/bls12_381/src/lincomb.rs:13-22)
    unnecessary: those lanes simply contribute the identity.

    Dispatches on N (a static shape): large point sets run the Pippenger
    bucket engine; small ones keep the simple double-and-add scan whose graph
    is a single add/double body (cheaper to compile, and at tiny N the bucket
    machinery has nothing to amortize).
    """
    n = points.x.shape[-1]
    if n >= 64:
        window = min(8, max(4, n.bit_length() - 4))
        return pippenger_msm(points, scalars_mont, window)
    return _lincomb_scan(points, scalars_mont)


@jax.jit
def _lincomb_scan(points: C.G1, scalars_mont: jnp.ndarray) -> C.G1:
    bits = scalar_bits_msb(scalars_mont)  # [255, *batch, N]
    per_point = C.scalar_mul(points, bits)  # [*batch, N]
    return C.reduce_sum(per_point, axis=per_point.x.ndim - 1)
