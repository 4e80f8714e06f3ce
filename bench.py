"""Benchmark: compute_cells_and_kzg_proofs throughput on the real chip.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}. The baseline
is the Rust reference's multithreaded single-host throughput; the reference
publishes no numbers and this image has no Rust toolchain (BASELINE.md), so we
use the documented estimate of 25 blobs/s (~40 ms/blob multithreaded on a
modern 16-core host) for vs_baseline.
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


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rust_eth_kzg_tpu.api import DASContext
    from rust_eth_kzg_tpu.ops import field as F

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    window = int(os.environ.get("BENCH_WINDOW", "8"))

    cache = os.environ.get(
        "KZG_TPU_TABLE_CACHE", "/root/repo/.tables/mainnet_tables.npz"
    )
    t0 = time.time()
    ctx = DASContext(use_precomp=window, table_cache=cache)
    init_s = time.time() - t0
    print(f"# init (tables on device): {init_s:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(42)
    scalars = [int(x) for x in rng.integers(0, 2**62, size=batch * 4096)]
    data = jnp.asarray(F.FR.to_mont_host(scalars)).reshape(F.FR.nlimbs, batch, 4096)

    prove = ctx.prover.prove_from_data
    t0 = time.time()
    out = prove(data)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    print(f"# first call (compile+run): {compile_s:.1f}s", file=sys.stderr)

    iters = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.time()
    for _ in range(iters):
        out = prove(data)
    jax.block_until_ready(out)
    elapsed = (time.time() - t0) / iters
    blobs_per_s = batch / elapsed

    print(
        json.dumps(
            {
                "metric": "compute_cells_and_kzg_proofs throughput",
                "value": round(blobs_per_s, 3),
                "unit": "blobs/s",
                "vs_baseline": round(blobs_per_s / REFERENCE_BLOBS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
