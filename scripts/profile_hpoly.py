"""Sub-stage timing of the h-poly commitment path (85% of prove time).

Splits FK20Prover._h_poly_commitments into: circulant gather + column NTT,
table one-hot matmul lookups, window-sum trees, the Horner window
combination, and the closing circulant G1-IFFT.
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
from rust_eth_kzg_tpu.ops import msm as M
from rust_eth_kzg_tpu.utils.timing import sync, timeit

FR = F.FR


def main():
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    t0 = time.time()
    ctx = DASContext(use_precomp=8)
    prover = ctx.prover
    print(f"# init {time.time() - t0:.1f}s", flush=True)

    cfg = prover.config
    rng = np.random.default_rng(42)
    scalars = [int(x) for x in rng.integers(0, 2**62, size=batch * 4096)]
    data = jnp.asarray(FR.to_mont_host(scalars)).reshape(FR.nlimbs, batch, 4096)
    poly = prover.blob_to_poly(data)
    sync(poly)

    k = cfg.poly_len // cfg.coset_size
    stages = {}

    @jax.jit
    def scalars_fn(poly):
        rows = jnp.take(poly, prover._circ_idx.reshape(-1), axis=-1)
        rows = rows.reshape(poly.shape[:-1] + (cfg.coset_size, 2 * k))
        rows = jnp.where(prover._circ_mask[None, None], rows, 0)
        col_fft = prover.circulant_domain.fft(
            rows.reshape(FR.nlimbs, -1, 2 * k)
        ).reshape(rows.shape)
        msm_scalars = jnp.swapaxes(col_fft, -1, -2)
        inv = FR.broadcast_const(
            prover.circulant_domain.size_inv_mont, msm_scalars.shape[1:]
        )
        return F.mont_mul(FR, msm_scalars, inv)

    stages["gather+colNTT+scale"] = timeit(scalars_fn, poly)
    msm_scalars = scalars_fn(poly)
    sync(msm_scalars)

    tables = prover.tables

    @jax.jit
    def digits_fn(tables, s):
        d = M.signed_digits(s, tables.window)
        chains, wpc = tables.chains, tables.wpc
        n_win = d.shape[0]
        pad = chains * wpc - n_win
        d = jnp.pad(d, [(0, pad)] + [(0, 0)] * (d.ndim - 1))
        d = d.reshape((chains, wpc) + d.shape[1:])
        d = jnp.moveaxis(d, 0, -2)
        return d.reshape((wpc,) + d.shape[1:-2] + (chains * d.shape[-1],))

    stages["signed_digits"] = timeit(digits_fn, tables, msm_scalars)
    digits = digits_fn(tables, msm_scalars)
    sync(digits)

    @jax.jit
    def lookup_fn(tables, digits):
        idx = jnp.maximum(jnp.abs(digits) - 1, 0)
        return M._gather_rows(tables, idx)

    stages["table_matmul_lookup"] = timeit(lookup_fn, tables, digits)

    @jax.jit
    def wsum_fn(tables, digits):
        return M._window_sums(tables, digits)

    stages["window_sums(lookup+tree)"] = timeit(wsum_fn, tables, digits)

    @jax.jit
    def msm_fn(tables, s):
        return M.fixed_base_msm(tables, s)

    stages["fixed_base_msm_total"] = timeit(msm_fn, tables, msm_scalars)
    slot_results = msm_fn(tables, msm_scalars)
    sync(slot_results)

    @jax.jit
    def ifft_fn(sr):
        return prover.circulant_domain.ifft_g1(sr, take_n=k, prescaled=True)

    stages["circulant_ifft_g1(128)"] = timeit(ifft_fn, slot_results)

    for key, val in stages.items():
        print(
            json.dumps(
                {"stage": key, "ms_total": round(val * 1e3, 1),
                 "ms_per_blob": round(val * 1e3 / batch, 2)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
