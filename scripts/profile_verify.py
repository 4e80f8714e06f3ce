"""Stage-level timing of verify_cell_kzg_proof_batch (128 cells).

Mirrors FK20Verifier.verify stage by stage with fetch-synced timing
(utils/timing.py) so optimization goes where the milliseconds are.
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
from rust_eth_kzg_tpu.ops import ntt
from rust_eth_kzg_tpu.utils import fiat_shamir as fs
from rust_eth_kzg_tpu.utils import serialization as ser
from rust_eth_kzg_tpu.utils.timing import sync, timeit

FR = F.FR


def hosttime(fn, iters=5):
    fn()
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    return (time.time() - t0) / iters, out if False else fn()


def main():
    window = int(os.environ.get("BENCH_WINDOW", "8"))
    t0 = time.time()
    ctx = DASContext(
        use_precomp=window,
        table_cache=os.environ.get(
            "KZG_TPU_TABLE_CACHE", "/root/repo/.tables/mainnet_tables.npz"
        ),
    )
    print(f"# init {time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(7)
    blob = bytes(
        b
        for x in rng.integers(0, 2**31, size=4096)
        for b in int(x).to_bytes(32, "big")
    )
    cells, proofs = ctx.compute_cells_and_kzg_proofs(blob)
    commitment = ctx.blob_to_kzg_commitment(blob)
    commitments = [commitment] * 128
    cell_indices = list(range(128))
    cells = list(cells)
    proofs = list(proofs)
    print("# fixtures ready", flush=True)

    stages = {}

    # end-to-end (warm)
    ctx.verify_cell_kzg_proof_batch(commitments, cell_indices, cells, proofs)
    t0 = time.time()
    for _ in range(3):
        ctx.verify_cell_kzg_proof_batch(commitments, cell_indices, cells, proofs)
    stages["total"] = (time.time() - t0) / 3

    # host prep
    unique = [bytes(commitments[0])]
    indices = [0] * 128
    pb = [bytes(p) for p in proofs]
    dt, _ = hosttime(lambda: ser.deserialize_g1_batch(unique + pb))
    stages["host_decompress_g1(129)"] = dt
    dt, _ = hosttime(lambda: ser.deserialize_cells_batch(cells))
    stages["host_cells_batch"] = dt
    dt, _ = hosttime(
        lambda: fs.compute_cell_batch_challenge(
            4096, 64, unique, indices, cell_indices, [bytes(c) for c in cells], pb
        )
    )
    stages["host_fiat_shamir"] = dt

    v = ctx.verifier
    dedup_points = ser.deserialize_g1_batch(unique)
    proof_points = ser.deserialize_g1_batch(pb)
    cell_limbs = ser.deserialize_cells_batch(cells)
    r = fs.compute_cell_batch_challenge(
        4096, 64, unique, indices, cell_indices, [bytes(c) for c in cells], pb
    )
    r_powers = fs.compute_powers(r, 128)
    weighted = [
        rp * v.coset_gens_pow_n[ci] % 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
        for rp, ci in zip(r_powers, cell_indices)
    ]
    dt, _ = hosttime(lambda: C.glv_bits_host(r_powers + weighted + r_powers))
    stages["host_glv_bits(384)"] = dt

    # device: upload 3x128 points
    pts_flat = list(proof_points) * 2 + list(dedup_points) + [None] * 127

    def upload():
        out = C.points_to_device(pts_flat)
        sync(out)
        return out

    dt, _ = hosttime(upload, iters=3)
    stages["upload_points(384)"] = dt
    pts3 = C.points_to_device(pts_flat)
    pts3 = C.G1(*(c.reshape(-1, 3, 128) for c in pts3))
    b1, n1, b2, n2 = C.glv_bits_host(
        [int(s) for s in r_powers + weighted + r_powers]
    )
    args = (
        jnp.asarray(b1).reshape(-1, 3, 128),
        jnp.asarray(n1).reshape(3, 128),
        jnp.asarray(b2).reshape(-1, 3, 128),
        jnp.asarray(n2).reshape(3, 128),
    )

    def msm3():
        per_point = C.scalar_mul_glv(pts3, *args)
        return C.reduce_sum(per_point, axis=2)

    stages["device_msm3_glv_scan"] = timeit(msm3, iters=3)

    # device: interpolation polynomial (coset IFFTs + scales + tree sum)
    r_mont = jnp.asarray(FR.to_mont_host(r_powers))
    evals = jnp.asarray(np.moveaxis(np.asarray(cell_limbs), -1, 0))

    @jax.jit
    def interp_poly(evals, r_mont, scale):
        ev = F.to_mont(FR, evals)
        ev = ntt.bit_reverse_permutation(ev, axis=-1)
        it = v.coset_domain.ifft(ev)
        it = F.mont_mul(FR, it, scale)
        it = F.mont_mul(FR, it, r_mont[:, :, None])
        k = it.shape[1]
        while k > 1:
            h = k // 2
            red = F.add(FR, it[:, :h], it[:, h : 2 * h])
            if k % 2:
                red = jnp.concatenate([red, it[:, -1:]], axis=1)
                k = h + 1
            else:
                k = h
            it = red
        return it[:, 0]

    scale_rows = jnp.take(v._coset_scale, jnp.asarray(cell_indices), axis=1)
    stages["device_interp_poly"] = timeit(
        lambda: interp_poly(evals, r_mont, scale_rows), iters=3
    )

    poly = interp_poly(evals, r_mont, scale_rows)
    stages["device_commit_msm64"] = timeit(
        lambda: M.fixed_base_msm(v._commit_tables, poly[:, None, :]), iters=3
    )

    comm = M.fixed_base_msm(v._commit_tables, poly[:, None, :])
    dt, _ = hosttime(lambda: C.points_from_device(comm), iters=3)
    stages["fetch_points"] = dt

    from rust_eth_kzg_tpu.utils import bls_host as bls
    from rust_eth_kzg_tpu.utils import native

    sp = C.points_from_device(comm)[0]
    dt, _ = hosttime(
        lambda: native.multi_pairings(
            [(sp, v.tau_pow_n_g2), (sp, bls.g2_neg(bls.G2_GEN))]
        ),
        iters=3,
    )
    stages["host_pairing"] = dt

    for k, val in stages.items():
        print(json.dumps({"stage": k, "ms": round(val * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
