"""Stage-level timing of the FK20 prove pipeline on the current backend.

Times each jitted stage separately (h-poly MSMs, G1 FFT proof phase, coset
evaluations, batch normalize) so optimization effort goes where the
milliseconds are. KZG_TPU_PALLAS=0/1 switches the curve-op backend.
"""

import json
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
from rust_eth_kzg_tpu.ops import curve as C
from rust_eth_kzg_tpu.ops import field as F

FR = F.FR


# fetch-synced timing: block_until_ready is a no-op on the tunneled TPU
# backend (returns at enqueue) — see rust_eth_kzg_tpu/utils/timing.py
from rust_eth_kzg_tpu.utils.timing import timeit


def main():
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    window = int(os.environ.get("BENCH_WINDOW", "8"))
    t0 = time.time()
    ctx = DASContext(use_precomp=window)
    prover = ctx.prover
    print(f"# init {time.time()-t0:.1f}s backend={jax.default_backend()} "
          f"pallas={os.environ.get('KZG_TPU_PALLAS','auto')}", flush=True)

    rng = np.random.default_rng(42)
    scalars = [int(x) for x in rng.integers(0, 2**62, size=batch * 4096)]
    data = jnp.asarray(FR.to_mont_host(scalars)).reshape(FR.nlimbs, batch, 4096)

    poly = prover.blob_to_poly(data)
    jax.block_until_ready(poly)

    h_jit = jax.jit(
        lambda tables, poly: prover._h_poly_commitments(poly, tables=tables)
    )
    h = lambda poly: h_jit(prover.tables, poly)
    proofs_fn = jax.jit(prover._proofs_from_h)
    cells_fn = jax.jit(prover._coset_evaluations)
    norm = jax.jit(C.batch_normalize)

    stages = {}
    stages["blob_to_poly(intt4096)"] = timeit(prover.blob_to_poly, data)
    stages["h_poly(msm)"] = timeit(h, poly)
    hval = h(poly)
    stages["proofs(g1_ifft256+fft128)"] = timeit(proofs_fn, hval)
    pval = proofs_fn(hval)
    stages["cells(ntt8192)"] = timeit(cells_fn, poly)
    stages["normalize(batch_inv)"] = timeit(norm, pval)
    stages["full_prove"] = timeit(prover.prove_from_data, data)

    for k, v in stages.items():
        print(json.dumps({"stage": k, "ms_total": round(v * 1e3, 1),
                          "ms_per_blob": round(v * 1e3 / batch, 2)}), flush=True)


if __name__ == "__main__":
    main()
