"""Measurement-grade device synchronization and timing helpers.

`jax.block_until_ready` is a NO-OP under the tunneled remote-TPU backend used
in this environment: dispatch returns after enqueue and "blocking" on the
output does not wait for execution. The evidence (round 4): a k-chained
Montgomery-mul scan times identically for k=1 and k=16 under
block_until_ready (0.04 ms — pure dispatch), while the first tiny
device-to-host fetch afterwards blocks for the full queued-execution time.
Every wall-clock number taken with block_until_ready on this backend is a
dispatch rate, not a compute time.

The only reliable execution barrier is a device-to-host fetch: `device_get`
of one scalar element of an output leaf blocks until every queued program in
that leaf's dependency chain has executed. The scalar-index op itself
compiles once per shape (warm it before timing) and costs one tunnel
round-trip (~20 ms here) — amortize it by timing several dependent calls per
sync and subtracting `sync_overhead()`.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def sync(tree) -> None:
    """Block until every program producing any array leaf of `tree` ran.

    One scalar is gathered from EVERY leaf (advisor r4-low: leaves produced by
    independent device programs are not ordered behind the first leaf's
    program); the scalar index ops enqueue asynchronously and a single
    device_get call at the end blocks on all of them."""
    scalars = [
        leaf[(0,) * leaf.ndim]
        for leaf in jax.tree_util.tree_leaves(tree)
        if hasattr(leaf, "ndim")
    ]
    if scalars:
        jax.device_get(scalars)


def sync_overhead(tree, probes: int = 3) -> float:
    """Seconds one `sync` costs on already-materialized data (tunnel RTT)."""
    sync(tree)  # drain + warm the scalar-index op
    t0 = time.time()
    for _ in range(probes):
        sync(tree)
    return (time.time() - t0) / probes


def timeit(fn, *args, iters: int = 3) -> float:
    """True seconds per call of `fn(*args)`: warm, enqueue `iters` dependent
    dispatches, fetch-sync once, subtract the measured sync round-trip."""
    out = fn(*args)
    sync(out)  # compile + warm sync gather
    rtt = sync_overhead(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return max((time.time() - t0 - rtt) / iters, 0.0)
