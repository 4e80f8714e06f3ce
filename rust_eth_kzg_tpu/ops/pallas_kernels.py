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

# lanes per grid step: [FP_LIMBS, _TILE] int32 blocks; 26x2048x4B = 208 KiB per
# coordinate block, ~9 blocks of I/O + formula temporaries stay well under the
# ~16 MiB VMEM budget.
_TILE = 2048
_MIN_TILE = 256


def _mode() -> str:
    return os.environ.get("KZG_TPU_PALLAS", "auto")


@functools.cache
def enabled() -> bool:
    m = _mode()
    if m == "0":
        return False
    if m in ("1", "interpret"):
        return True
    return jax.default_backend() == "tpu"


@functools.cache
def _interpret() -> bool:
    return _mode() == "interpret" or jax.default_backend() != "tpu"


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
