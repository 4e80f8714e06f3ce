"""Multi-chip scaling: device meshes and sharded FK20 pipelines.

The reference's only parallelism is rayon threads behind `maybe_rayon`
(/root/reference/crates/maybe_rayon/src/lib.rs:1-16, used at
batch_toeplitz.rs:50-117 and fft.rs:72,119). The TPU-native equivalent is a
`jax.sharding.Mesh` with two axes:

- `dp`   — blob-batch data parallelism: blobs are independent, so sharding the
           batch axis runs with zero collectives (DCN-friendly across hosts).
- `work` — intra-blob work parallelism: FK20's 128 proof slots (the batched
           Toeplitz MSMs + column NTTs) shard across chips; the G1-IFFT that
           mixes slots pulls them back with an all-gather over ICI.

Everything uses standard GSPMD: we annotate shardings and let XLA place the
collectives (scaling-book recipe).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import curve as C
from ..ops import field as F

FR = F.FR


def make_mesh(
    n_devices: int | None = None, dp: int | None = None, devices=None
) -> Mesh:
    """Build a (dp, work) mesh over the available devices (or `devices`)."""
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.array(devices[:n])
    if dp is None:
        # favor work-parallelism inside a host; dp across the rest
        work = 1
        for cand in (8, 4, 2, 1):
            if n % cand == 0:
                work = cand
                break
        dp = n // work
    else:
        work = n // dp
    return Mesh(devices.reshape(dp, work), ("dp", "work"))


def shard_blob_batch(mesh: Mesh, data: jnp.ndarray) -> jnp.ndarray:
    """Place [L, B, n] blob scalars with the batch axis sharded over dp
    and work (blobs are independent; this is the zero-collective layout)."""
    return jax.device_put(data, NamedSharding(mesh, P(None, ("dp", "work"), None)))


def prove_sharded(prover, mesh: Mesh, data: jnp.ndarray):
    """Full FK20 prove with the blob batch sharded across the mesh.

    `data`: [L, B, poly_len] Montgomery blob scalars, B divisible by the mesh
    size. Returns (proofs G1Affine [B, num_proofs], cells). GSPMD partitions
    the whole pipeline; because blobs are independent the per-chip program is
    the single-chip program on B/n blobs.
    """
    data = shard_blob_batch(mesh, data)
    return prover.prove_from_data(data)


def lincomb_sharded(
    points: C.G1, scalars_mont: jnp.ndarray, mesh: Mesh, axis: str = "work"
):
    """Variable-base MSM with the POINT axis sharded over one mesh axis.

    The multi-chip analog of the reference's rayon-chunked lincomb
    (/root/reference/crates/cryptography/bls12_381/src/lincomb.rs:29-59 under
    maybe_rayon): each chip reduces its point slice locally (Pippenger /
    double-and-add via ops.msm.lincomb), then the per-chip partial sums
    combine with an explicit `all_gather` over ICI followed by a log-depth
    tree of complete adds — the group-operation analog of `psum` (G1 addition
    is not an XLA reduction op, so the gather + local tree IS the collective
    reduction).

    points: G1 [*batch, N]; scalars_mont: [L, *batch, N] with N divisible by
    mesh.shape[axis]. Returns G1 [*batch] replicated on every device.
    """
    from jax import shard_map

    from ..ops import msm as M

    nd = points.x.ndim
    spec_in = P(*((None,) * (nd - 1) + (axis,)))
    spec_out = P()

    def body(px, py, pz, s):
        local = M.lincomb(C.G1(px, py, pz), s)
        gx = jax.lax.all_gather(local.x, axis)  # [ndev, L, *batch]
        gy = jax.lax.all_gather(local.y, axis)
        gz = jax.lax.all_gather(local.z, axis)
        part = C.G1(
            *(jnp.moveaxis(c, 0, -1) for c in (gx, gy, gz))
        )  # [L, *batch, ndev]
        return tuple(C.reduce_sum(part, axis=part.x.ndim - 1))

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_in, spec_in, spec_in, spec_in),
        out_specs=(spec_out, spec_out, spec_out),
        check_vma=False,
    )
    return C.G1(*fn(points.x, points.y, points.z, scalars_mont))


def fft_sharded(
    dom, x: jnp.ndarray, mesh: Mesh, axis: str = "work"
) -> jnp.ndarray:
    """Distributed scalar NTT: four-step (Bailey) decomposition with an
    explicit `all_to_all` stage transpose over ICI.

    The single-chip NTT runs stages over strides 1..n/2 in one scan
    (ops/ntt.py); across chips the last log2(ndev) stages would each need
    cross-device exchange. The four-step form needs exactly ONE exchange:

        n = n1 * n2, n1 = mesh.shape[axis]; view x[j1 + n1 j2] as A[j1, j2]
        1. length-n2 NTT along j2 on each chip's j1 rows   (local)
        2. twiddle multiply by w^(j1 k2)                    (local)
        3. transpose j1 <-> k2                              (all_to_all, ICI)
        4. length-n1 NTT along j1                           (local)

    This is the reference's rayon stage-chunking (fft.rs:72,119) re-shaped
    into the one-collective TPU form. x: [L, B, n] Montgomery; returns the
    same natural-order evaluations as dom.fft(x), with the output's n1 blocks
    sharded over the mesh axis (gather with jax.device_get / an all_gather if
    a caller needs full replication).
    """

    from jax import shard_map

    from ..constants import R_SCALAR
    from ..ops import ntt

    n = dom.size
    n1 = mesh.shape[axis]
    assert n % n1 == 0, "domain size must divide by the mesh axis"
    n2 = n // n1
    inner = ntt.domain(n2)
    outer = ntt.domain(n1)
    # w^(j1 * k2) twiddles, [n1, n2] (host-built, Montgomery form)
    w = dom.generator
    tw = [[pow(w, j1 * k2, R_SCALAR) for k2 in range(n2)] for j1 in range(n1)]
    tw_m = np.stack(
        [FR.to_mont_host(row) for row in tw], axis=1
    )  # [L, n1, n2]
    tw_dev = jnp.asarray(tw_m)

    nl, b, _ = x.shape
    # A[j1, j2] = x[j1 + n1 j2]: reshape [n2, n1] then swap -> [n1, n2]
    a = jnp.swapaxes(x.reshape(nl, b, n2, n1), -1, -2)

    def body(ab, twb):
        # ab: [L, B, n1/ndev, n2] local rows; inner NTT along the last axis
        loc = ab.shape[2]
        v = inner.fft(ab.reshape(nl, b * loc, n2)).reshape(ab.shape)
        v = F.mont_mul(FR, v, twb[:, None])  # [L, 1, n1_loc, n2] over batch
        # transpose j1 <-> k2 across chips: one tiled all_to_all over ICI
        v = jax.lax.all_to_all(v, axis, split_axis=3, concat_axis=2, tiled=True)
        # outer NTT along j1 (now fully local): [L, B, n1, n2/ndev]
        v = jnp.swapaxes(v, -1, -2)  # [L, B, n2/ndev, n1]
        v = outer.fft(v.reshape(nl, -1, n1)).reshape(v.shape)
        return jnp.swapaxes(v, -1, -2)  # [L, B, n1, n2/ndev]

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, None, axis, None), P(None, axis, None)),
        out_specs=P(None, None, None, axis),
        check_vma=False,
    )
    out = fn(a, tw_dev)  # [L, B, n1, n2], element [k1, k2] = X[k2 + n2 k1]
    return out.reshape(nl, b, n)


def prove_work_sharded(prover, mesh: Mesh, data: jnp.ndarray):
    """FK20 prove with *intra-blob* work sharding.

    The blob batch shards over `dp` while the FK20 proof-slot axis (the 128
    independent Toeplitz MSMs) shards over `work`: we annotate the slot axis of
    the MSM scalars inside the pipeline and let XLA run each chip's table
    slice locally, then all-gather the slot results over ICI for the G1-IFFT
    that mixes them. This is the layout used when a single blob's latency
    matters more than batch throughput.
    """
    @partial(jax.jit, static_argnums=0)
    def run(prv, tables, d):
        poly = prv.blob_to_poly(d)
        # constrain the per-slot MSM scalars [L, B, slots, coset] so the slot
        # axis (the 2k independent fixed-base MSMs) shards over `work`
        slot_sharding = NamedSharding(mesh, P(None, "dp", "work", None))
        h = prv._h_poly_commitments(poly, slot_sharding, tables=tables)
        proofs = prv._proofs_from_h(h)
        cells = prv._coset_evaluations(poly)
        return C.batch_normalize(proofs), cells

    # the prover's tables live on the default backend's device, which may be a
    # different platform than the mesh (axon TPU vs virtual CPU mesh in the
    # dryrun); move them onto the mesh with the leading slot axis sharded over
    # `work` so each chip holds only its slice of the table (advisor r1-med)
    def _put_leaf(leaf):
        spec = P(*(("work",) + (None,) * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    tables = jax.tree_util.tree_map(_put_leaf, prover.tables)
    data = jax.device_put(data, NamedSharding(mesh, P(None, "dp", None)))
    return run(prover, tables, data)
