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
