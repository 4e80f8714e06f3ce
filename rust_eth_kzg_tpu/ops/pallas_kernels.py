"""Fused Pallas TPU kernels for the hot field/curve inner loops.

The jnp compute path (ops/field.py, ops/curve.py) expresses every operator as
straight-line limb arithmetic and relies on XLA fusion. These kernels fuse the
*whole* complete-formula group operation (12+ Montgomery multiplies plus the
lazy add/sub chains) into a single VMEM-resident Pallas program, so the ~50
intermediate [L, N] limb arrays never round-trip through HBM. They are the
TPU-native analog of blst's hand-written assembly field/group ops (consumed by
the reference at /root/reference/crates/cryptography/bls12_381/src/lib.rs:45-140).

Dispatch: `enabled()` is checked at trace time by the public curve ops
(ops/curve.py `add`/`add_mixed`/`double`). Control via KZG_TPU_PALLAS:
  "auto" (default) — on when the default JAX backend is a TPU
  "1" / "0"        — force on/off
  "interpret"      — on, in interpreter mode (CPU tests)

The kernel bodies reuse the exact un-jitted formula implementations
(curve.add_values etc.), so the Pallas path is bit-identical to the XLA path
by construction. Field constants (p, 2p, 4p, 3b) cannot be captured by a
Pallas kernel as array closures; they enter as tiny [L, 1] inputs and are
routed to the shared bodies through field.device_consts.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import FP_LIMBS
from . import curve as C
from . import field as F

# lanes per grid step: [FP_LIMBS, _TILE] int32 blocks. 512 lanes measured
# fastest for the fused group-op kernels (44 vs 76 ns/lane at 2048 — smaller
# working sets keep the CIOS temporaries closer to the vector registers);
# 4096 fails to compile outright.
_TILE = int(os.environ.get("KZG_TPU_TILE", "512"))
_MIN_TILE = min(256, _TILE)


def _mode() -> str:
    return os.environ.get("KZG_TPU_PALLAS", "auto")


@functools.cache
def _backend_is_tpu() -> bool:
    """True when the default backend is real TPU silicon. The deployment
    hardware registers its PJRT plugin under the platform name "axon" (not
    "tpu"), so check the device platform/kind too (advisor finding r1-med)."""
    backend = jax.default_backend()
    if backend in ("tpu", "axon"):
        return True
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return "tpu" in (dev.platform or "").lower() or "tpu" in (
        getattr(dev, "device_kind", "") or ""
    ).lower()


@functools.cache
def enabled() -> bool:
    m = _mode()
    if m == "0":
        return False
    if m in ("1", "interpret"):
        return True
    return _backend_is_tpu()


@functools.cache
def _interpret() -> bool:
    return _mode() == "interpret" or not _backend_is_tpu()


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _tile_for(n: int) -> tuple[int, int]:
    tile = min(_TILE, _round_up(max(n, 1), _MIN_TILE))
    return tile, _round_up(max(n, 1), tile)


def _flatten_pad(arr: jnp.ndarray, npad: int) -> jnp.ndarray:
    flat = arr.reshape(arr.shape[0], -1)
    return jnp.pad(flat, ((0, 0), (0, npad - flat.shape[1])))


def _fp_const_arrays() -> list[np.ndarray]:
    return [
        np.asarray(F.FP.p_limbs),
        np.asarray(F.FP.p2_limbs),
        np.asarray(F.FP.p4_limbs),
        np.asarray(C.B3_MONT),
        np.asarray(F.FP.one_mont),
    ]


def _spec_const_arrays(spec: F.FieldSpec) -> list[np.ndarray]:
    return [
        np.asarray(spec.p_limbs),
        np.asarray(spec.p2_limbs),
        np.asarray(spec.p4_limbs),
    ]


def _launch(body, const_arrays, ins, n_out: int, nlimbs: int, tile: int, npad: int):
    """Run `body(list_of_input_values) -> tuple_of_output_values` as a kernel.

    const_arrays enter as [L, 1] inputs and are installed as the field-constant
    table for the traced body; ins are [L, npad] limb arrays tiled on lanes.
    """
    nconst = len(const_arrays)
    nin = len(ins)

    def kernel(*refs):
        crefs = refs[:nconst]
        irefs = refs[nconst : nconst + nin]
        orefs = refs[nconst + nin :]
        table = {
            arr.tobytes(): cref[:] for arr, cref in zip(const_arrays, crefs)
        }
        with F.device_consts(table):
            outs = body([r[:] for r in irefs])
        for oref, val in zip(orefs, outs):
            oref[:] = val

    cspec = pl.BlockSpec(
        (nlimbs, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    dspec = pl.BlockSpec(
        (nlimbs, tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    cin = [jnp.asarray(a, jnp.int32).reshape(nlimbs, 1) for a in const_arrays]
    return pl.pallas_call(
        kernel,
        grid=(npad // tile,),
        in_specs=[cspec] * nconst + [dspec] * nin,
        out_specs=tuple([dspec] * n_out),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nlimbs, npad), jnp.int32) for _ in range(n_out)
        ),
        interpret=_interpret(),
    )(*cin, *ins)


def _g1_call(body, coords, batch) -> C.G1:
    n = int(np.prod(batch, dtype=np.int64)) if batch else 1
    tile, npad = _tile_for(n)
    ins = [_flatten_pad(a, npad) for a in coords]
    outs = _launch(body, _fp_const_arrays(), ins, 3, FP_LIMBS, tile, npad)
    return C.G1(*(o[:, :n].reshape((FP_LIMBS,) + tuple(batch)) for o in outs))


def g1_add(p: C.G1, q: C.G1) -> C.G1:
    """Fused complete projective addition (curve.add_values) as one kernel."""
    batch = jnp.broadcast_shapes(p.x.shape[1:], q.x.shape[1:])
    p, q = _broadcast_g1(p, batch), _broadcast_g1(q, batch)

    def body(vals):
        x1, y1, z1, x2, y2, z2 = vals
        out = C.add_values(C.G1(x1, y1, z1), C.G1(x2, y2, z2))
        return out.x, out.y, out.z

    return _g1_call(body, [p.x, p.y, p.z, q.x, q.y, q.z], batch)


def g1_double(p: C.G1) -> C.G1:
    """Fused complete projective doubling (curve.double_values)."""

    def body(vals):
        out = C.double_values(C.G1(*vals))
        return out.x, out.y, out.z

    return _g1_call(body, [p.x, p.y, p.z], p.x.shape[1:])


def g1_add_mixed(p: C.G1, q_affine: C.G1Affine) -> C.G1:
    """Fused complete mixed addition; the affine identity mask rides along as
    one int32 limb row."""
    batch = jnp.broadcast_shapes(p.x.shape[1:], q_affine.x.shape[1:])
    shape = (FP_LIMBS,) + tuple(batch)
    inf_row = jnp.broadcast_to(q_affine.inf.astype(jnp.int32)[None], shape)
    qx = jnp.broadcast_to(q_affine.x, shape)
    qy = jnp.broadcast_to(q_affine.y, shape)
    p = _broadcast_g1(p, batch)

    def body(vals):
        x1, y1, z1, x2, y2, infm = vals
        aff = C.G1Affine(x=x2, y=y2, inf=infm[0, :] != 0)
        out = C.add_mixed_values(C.G1(x1, y1, z1), aff)
        return out.x, out.y, out.z

    return _g1_call(body, [p.x, p.y, p.z, qx, qy, inf_row], batch)


def _broadcast_g1(p: C.G1, batch) -> C.G1:
    shape = (FP_LIMBS,) + tuple(batch)
    return C.G1(*(jnp.broadcast_to(c, shape) for c in p))


def g1_add_affine(a: C.G1Affine, b: C.G1Affine) -> C.G1:
    """Fused incomplete affine+affine chord addition (curve.add_affine_values):
    8 field muls per lane; the identity masks ride along as int32 limb rows."""
    batch = jnp.broadcast_shapes(a.x.shape[1:], b.x.shape[1:])
    shape = (FP_LIMBS,) + tuple(batch)

    def mask_row(aff):
        return jnp.broadcast_to(aff.inf.astype(jnp.int32)[None], shape)

    ins = [
        jnp.broadcast_to(a.x, shape),
        jnp.broadcast_to(a.y, shape),
        mask_row(a),
        jnp.broadcast_to(b.x, shape),
        jnp.broadcast_to(b.y, shape),
        mask_row(b),
    ]

    def body(vals):
        ax, ay, am, bx, by, bm = vals
        out = C.add_affine_values(
            C.G1Affine(x=ax, y=ay, inf=am[0, :] != 0),
            C.G1Affine(x=bx, y=by, inf=bm[0, :] != 0),
        )
        return out.x, out.y, out.z

    return _g1_call(body, ins, batch)


def _spec_const_arrays_inv(spec: F.FieldSpec) -> list[np.ndarray]:
    return _spec_const_arrays(spec) + [np.asarray(spec.one_mont)]


def field_butterfly(
    spec: F.FieldSpec, a: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray
):
    """Fused NTT butterfly: returns (a + w*b, a - w*b + 2p) in one kernel.

    The Montgomery multiply plus the add/sub pair is the whole inner loop of
    every scalar NTT stage; fusing it keeps the ~30 CIOS temporaries in VMEM
    (the XLA path is ~40x slower per lane, see README perf notes).
    """
    a, b, w = jnp.broadcast_arrays(a, b, w)
    batch = a.shape[1:]
    n = int(np.prod(batch, dtype=np.int64)) if batch else 1
    tile, npad = _tile_for(n)
    ins = [_flatten_pad(x, npad) for x in (a, b, w)]

    def body(vals):
        av, bv, wv = vals
        t = F.mont_mul_values(spec, bv, wv)
        return (
            F.add_values(spec, av, t),
            F.sub_values(spec, av, t, 2),
        )

    outs = _launch(
        body, _spec_const_arrays(spec), ins, 2, spec.nlimbs, tile, npad
    )
    return tuple(
        o[:, :n].reshape((spec.nlimbs,) + tuple(batch)) for o in outs
    )


def batch_inverse_flat(spec: F.FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Montgomery inverse of a [L, N] limb array as ONE kernel.

    Montgomery's trick (blocked prefix products over chunks of K=32) with the
    block-total Fermat exponentiation a^(p-2) run *inside* the kernel as a
    fori_loop over exponent bits — the jnp path launches ~570 tiny sequential
    XLA ops for the same chain and is launch-latency-bound. Zero lanes poison
    their 32-element block (same contract as the jnp fallback).
    """
    nl = spec.nlimbs
    n = a.shape[1]
    k = 32
    c = max(1, -(-n // k))
    c = _round_up(c, 128)
    # the grid below is c // ct with floor division: c must be a multiple of
    # the tile ct, or the tail block is silently never written (advisor
    # finding r1-high; e.g. c=640 with ct=512 dropped the last 128 columns)
    ct = min(512, c)
    c = _round_up(c, ct)
    npad = k * c
    if npad != n:
        ones = spec.broadcast_const(spec.one_mont, (npad - n,))
        a = jnp.concatenate([a, ones], axis=1)
    x = a.reshape(nl, k, c)

    exponent = spec.modulus - 2
    nbits = exponent.bit_length()
    bits = np.array(
        [[(exponent >> (nbits - 1 - t)) & 1] for t in range(nbits)], np.int32
    )

    const_arrays = _spec_const_arrays_inv(spec)
    nconst = len(const_arrays)

    def kernel(*refs):
        bits_ref = refs[0]
        crefs = refs[1 : 1 + nconst]
        x_ref = refs[1 + nconst]
        out_ref = refs[2 + nconst]
        scratch = refs[3 + nconst]
        table = {
            arr.tobytes(): cref[:] for arr, cref in zip(const_arrays, crefs)
        }
        with F.device_consts(table):
            one = jnp.broadcast_to(
                crefs[-1][:].reshape(nl, 1), (nl, x_ref.shape[-1])
            )

            def fwd(i, carry):
                scratch[:, pl.ds(i, 1), :] = carry[:, None]
                xi = x_ref[:, pl.ds(i, 1), :][:, 0]
                return F.mont_mul_values(spec, carry, xi)

            total = jax.lax.fori_loop(0, k, fwd, one)

            def pow_body(t, acc):
                acc = F.mont_mul_values(spec, acc, acc)
                m = F.mont_mul_values(spec, acc, total)
                return jnp.where(bits_ref[t, 0] != 0, m, acc)

            inv = jax.lax.fori_loop(0, nbits, pow_body, one)

            def bwd(j, carry):
                i = k - 1 - j
                xi = x_ref[:, pl.ds(i, 1), :][:, 0]
                pi = scratch[:, pl.ds(i, 1), :][:, 0]
                out_ref[:, pl.ds(i, 1), :] = F.mont_mul_values(
                    spec, carry, pi
                )[:, None]
                return F.mont_mul_values(spec, carry, xi)

            jax.lax.fori_loop(0, k, bwd, inv)

    bspec = pl.BlockSpec((nbits, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    cspec = pl.BlockSpec((nl, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec(
        (nl, k, ct), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    cin = [jnp.asarray(arr, jnp.int32).reshape(nl, 1) for arr in const_arrays]
    out = pl.pallas_call(
        kernel,
        grid=(c // ct,),
        in_specs=[bspec] + [cspec] * nconst + [dspec],
        out_specs=dspec,
        out_shape=jax.ShapeDtypeStruct((nl, k, c), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nl, k, ct), jnp.int32)],
        interpret=_interpret(),
    )(jnp.asarray(bits), *cin, x)
    return out.reshape(nl, npad)[:, :n]


def mont_mul(spec: F.FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Standalone fused Montgomery multiply (microbenchmarks / rooflines)."""
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[1:]
    n = int(np.prod(batch, dtype=np.int64)) if batch else 1
    tile, npad = _tile_for(n)
    nl = spec.nlimbs
    ins = [_flatten_pad(x, npad) for x in (a, b)]

    def body(vals):
        return (F.mont_mul_values(spec, vals[0], vals[1]),)

    out = _launch(body, _spec_const_arrays(spec), ins, 1, nl, tile, npad)[0]
    return out[:, :n].reshape((nl,) + tuple(batch))
