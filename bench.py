"""Benchmark matrix on the real chip (BASELINE.md configurations).

Emits one JSON line per metric ({"metric", "value", "unit", "vs_baseline"});
the LAST line is the headline compute_cells_and_kzg_proofs throughput (the
north-star metric the driver parses). The baseline for the headline is the
Rust reference's multithreaded single-host throughput; the reference publishes
no numbers and this image has no Rust toolchain (BASELINE.md), so we use the
documented estimate of 25 blobs/s (~40 ms/blob multithreaded on a modern
16-core host). Other metrics report vs_baseline = null: no published
reference numbers exist (BASELINE.md), and inventing them would be worse.

MEASUREMENT NOTE (round 4): `jax.block_until_ready` is a no-op on the
tunneled remote-TPU backend here — it returns at enqueue, so timing loops
closed with it measure the DISPATCH rate, not execution. All device-path
numbers recorded in rounds 1-3 (and the round-4 run of 2026-08-20 11:35) are
dispatch rates. This harness now closes every timed region with a scalar
device-to-host fetch (utils/timing.py), the only reliable execution barrier
on this backend, and subtracts the measured fetch round-trip.

Matrix (reference bench configs, file:line in BASELINE.md):
  init (cached tables)            eip7594/benches/benchmark-mt.rs:103-113
  init (cold, tables rebuilt)     same config, no snapshot      [BENCH_COLD=1]
  compute_cells latency (1 blob)  benchmark-mt.rs:36-49
  verify_cell_kzg_proof_batch 128 benchmark-mt.rs:77-101
  recover_cells (64 missing)      benchmark-mt.rs:51-75
  MSM 4096 variable-base          bls12_381/benches/benchmark.rs:47-55
  compute_cells throughput B=16   headline (batched TPU path)
"""

import json
import os
import sys
import time

import jax as _jax

# jax may be pre-imported by the environment; configure the persistent
# compilation cache programmatically (env vars would be read too late).
_jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REFERENCE_BLOBS_PER_S = 25.0


def note(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def emit(metric, value, unit, vs_baseline=None):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 4),
                "unit": unit,
                "vs_baseline": None if vs_baseline is None else round(vs_baseline, 3),
            }
        ),
        flush=True,
    )


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rust_eth_kzg_tpu.api import DASContext
    from rust_eth_kzg_tpu.ops import curve as C
    from rust_eth_kzg_tpu.ops import field as F
    from rust_eth_kzg_tpu.ops import msm as M

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    window = int(os.environ.get("BENCH_WINDOW", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    t_bench_start = time.time()

    cache = os.environ.get(
        "KZG_TPU_TABLE_CACHE", "/root/repo/.tables/mainnet_tables.npz"
    )
    from rust_eth_kzg_tpu.utils.timing import sync as _sync

    t0 = time.time()
    ctx = DASContext(use_precomp=window, table_cache=cache)
    _sync(ctx.prover.tables)  # uploads are async-dispatched; wait for HBM
    init_s = time.time() - t0
    note(f"init (tables on device): {init_s:.1f}s")
    emit("initialize context (cached tables)", init_s, "s")

    rng = np.random.default_rng(42)
    scalars = [int(x) for x in rng.integers(0, 2**62, size=batch * 4096)]
    data = jnp.asarray(F.FR.to_mont_host(scalars)).reshape(F.FR.nlimbs, batch, 4096)

    # --- headline: batched prove throughput (device path, fetch-synced) ---
    from rust_eth_kzg_tpu.utils.timing import sync, timeit

    prove = ctx.prover.prove_from_data
    t0 = time.time()
    out = prove(data)
    sync(out)
    note(f"prove first call (compile+run+sync): {time.time() - t0:.1f}s")
    dt = timeit(prove, data, iters=iters)
    headline_blobs_per_s = batch / dt

    # --- single-blob latency (batch=1) ---
    try:
        data1 = data[:, :1]
        t0 = time.time()
        out = prove(data1)
        sync(out)
        note(f"prove B=1 first call: {time.time() - t0:.1f}s")
        emit(
            "compute_cells_and_kzg_proofs latency (1 blob)",
            timeit(prove, data1, iters=iters) * 1e3,
            "ms",
        )
    except Exception as e:
        note(f"B=1 latency failed: {e!r}")

    # --- user-level cells for verify/recover (includes serialization) ---
    blob = bytes(
        b
        for x in rng.integers(0, 2**31, size=4096)
        for b in int(x).to_bytes(32, "big")
    )
    try:
        t0 = time.time()
        cells, proofs = ctx.compute_cells_and_kzg_proofs(blob)
        note(f"user-level compute_cells (1 blob, incl. serialization): "
             f"{time.time() - t0:.1f}s first call")
        commitment = ctx.blob_to_kzg_commitment(blob)
    except Exception as e:
        note(f"user-level compute failed: {e!r}")
        cells = None

    # --- verify_cell_kzg_proof_batch: 128 cells, 1 unique commitment ---
    if cells is not None:
        try:
            args = (
                [commitment] * 128,
                list(range(128)),
                list(cells),
                list(proofs),
            )
            t0 = time.time()
            ctx.verify_cell_kzg_proof_batch(*args)
            note(f"verify 128 first call (compile+run): {time.time() - t0:.1f}s")
            t0 = time.time()
            for _ in range(iters):
                ctx.verify_cell_kzg_proof_batch(*args)
            emit(
                "verify_cell_kzg_proof_batch (128 cells)",
                (time.time() - t0) / iters * 1e3,
                "ms",
            )
        except Exception as e:
            note(f"verify bench failed: {e!r}")

    # --- recover_cells_and_kzg_proofs: worst case, 64 of 128 missing ---
    if cells is not None:
        try:
            idx = list(range(64))
            have = list(cells[:64])
            t0 = time.time()
            ctx.recover_cells_and_kzg_proofs(idx, have)
            note(f"recover first call (compile+run): {time.time() - t0:.1f}s")
            t0 = time.time()
            for _ in range(iters):
                ctx.recover_cells_and_kzg_proofs(idx, have)
            emit(
                "recover_cells_and_kzg_proofs (64 of 128 missing)",
                (time.time() - t0) / iters * 1e3,
                "ms",
            )
        except Exception as e:
            note(f"recover bench failed: {e!r}")

    # --- variable-base MSM, 4096 points (north-star metric 2) ---
    try:
        from rust_eth_kzg_tpu.utils.trusted_setup import TrustedSetup

        pts = C.points_to_device(TrustedSetup.default().g1_monomial[:4096])
        msm_scalars = [int(x) for x in rng.integers(0, 2**62, size=4096)]
        sm = jnp.asarray(F.FR.to_mont_host(msm_scalars))

        def run_msm():
            return M.lincomb(pts, sm)

        t0 = time.time()
        sync(run_msm())
        note(f"MSM 4096 first call (compile+run+sync): {time.time() - t0:.1f}s")
        emit(
            "G1 MSM 4096 points (Pippenger, variable base)",
            timeit(run_msm, iters=iters) * 1e3,
            "ms",
        )
    except Exception as e:
        note(f"MSM bench failed: {e!r}")

    # --- cold init (tables rebuilt from the SRS on device) ---
    # skipped when the earlier metrics already consumed the wall budget: the
    # rebuild is ~5 min worst-case (table build + possible recompiles) and
    # must not starve the headline metric of its run
    elapsed = time.time() - t_bench_start
    deadline = float(os.environ.get("BENCH_COLD_DEADLINE_S", "1500"))
    if os.environ.get("BENCH_COLD", "1") == "1" and elapsed > deadline:
        note(f"skipping cold init (elapsed {elapsed:.0f}s > {deadline:.0f}s)")
    elif os.environ.get("BENCH_COLD", "1") == "1":
        try:
            import gc

            # the warm context holds ~2 GB of window tables on device (plus
            # the verifier's lazily-built commit tables); drop every live
            # device buffer before the rebuild or the cold build OOMs the chip
            ctx = prove = out = data = None
            try:
                del data1
            except NameError:
                pass
            try:
                del cells, proofs, commitment
            except NameError:
                pass
            try:
                del pts, sm
            except NameError:
                pass
            # the jit caches pin the warm prover (a static_argnums arg) and
            # through it the multi-GB device tables — clear them too
            jax.clear_caches()
            gc.collect()
            t0 = time.time()
            cold = DASContext(use_precomp=window, table_cache=None)
            sync(cold.prover.tables)  # the table build is async-dispatched too
            emit("initialize context (cold, tables rebuilt)", time.time() - t0, "s")
            del cold
            gc.collect()
        except Exception as e:
            note(f"cold init failed: {e!r}")

    # headline LAST (the driver parses the final JSON line)
    emit(
        "compute_cells_and_kzg_proofs throughput",
        headline_blobs_per_s,
        "blobs/s",
        headline_blobs_per_s / REFERENCE_BLOBS_PER_S,
    )


if __name__ == "__main__":
    main()
