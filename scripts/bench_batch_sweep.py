"""Throughput vs blob-batch size for the prove pipeline (headline tuning).

The fixed-base window-sum adds scale linearly with B, but the G1-FFT/IFFT
twiddle scans are depth-bound at narrow lane counts (64*B lanes) — larger
batches amortize them. Prints blobs/s per batch size.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from rust_eth_kzg_tpu.api import DASContext
from rust_eth_kzg_tpu.ops import field as F
from rust_eth_kzg_tpu.utils.timing import sync, timeit


def main():
    sizes = [int(s) for s in os.environ.get("SWEEP", "8,16,32,48").split(",")]
    t0 = time.time()
    ctx = DASContext(
        table_cache=os.environ.get(
            "KZG_TPU_TABLE_CACHE", "/root/repo/.tables/mainnet_tables.npz"
        )
    )
    sync(ctx.prover.tables)
    print(f"# init {time.time()-t0:.1f}s", flush=True)
    rng = np.random.default_rng(42)
    prove = ctx.prover.prove_from_data
    for b in sizes:
        scalars = [int(x) for x in rng.integers(0, 2**62, size=b * 4096)]
        data = jnp.asarray(F.FR.to_mont_host(scalars)).reshape(
            F.FR.nlimbs, b, 4096
        )
        try:
            t0 = time.time()
            sync(prove(data))
            print(f"# B={b} first call {time.time()-t0:.1f}s", flush=True)
            dt = timeit(prove, data, iters=3)
            print(
                f"B={b}: {b/dt:.2f} blobs/s ({dt*1e3/b:.2f} ms/blob, "
                f"{dt*1e3:.1f} ms/batch)",
                flush=True,
            )
        except Exception as e:
            print(f"B={b}: FAILED {e!r}", flush=True)
        del data


if __name__ == "__main__":
    main()
