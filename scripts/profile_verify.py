"""Stage-level timing of verify_cell_kzg_proof_batch (128 cells).

Round-5 architecture: ONE packed upload -> ONE device program (decompress +
3 Pippenger MSMs + coset IFFTs + commit) -> ONE packed fetch -> host pairing.
This script times each stage with fetch-synced timing (utils/timing.py).
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

import numpy as np

from rust_eth_kzg_tpu.api import DASContext
from rust_eth_kzg_tpu.models import fk20_verifier as FV
from rust_eth_kzg_tpu.ops import decompress as D
from rust_eth_kzg_tpu.utils import fiat_shamir as fs
from rust_eth_kzg_tpu.utils import serialization as ser
from rust_eth_kzg_tpu.utils.timing import sync, timeit

from bench import _bench_pack_verify  # shared packing helper


def hosttime(fn, iters=5):
    fn()
    t0 = time.time()
    for _ in range(iters):
        fn()
    return (time.time() - t0) / iters


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

    unique = [bytes(commitment)]
    pb = [bytes(p) for p in proofs]
    stages["host_parse_points(129)"] = hosttime(
        lambda: D.parse_compressed_g1_batch(unique + pb)
    )
    stages["host_cells_batch"] = hosttime(
        lambda: ser.deserialize_cells_batch(cells)
    )
    stages["host_fiat_shamir"] = hosttime(
        lambda: fs.compute_cell_batch_challenge(
            4096, 64, unique, [0] * 128, cell_indices,
            [bytes(c) for c in cells], pb
        )
    )

    v = ctx.verifier
    cell_limbs = ser.deserialize_cells_batch(cells)
    r = fs.compute_cell_batch_challenge(
        4096, 64, unique, [0] * 128, cell_indices, [bytes(c) for c in cells], pb
    )
    stages["host_pack+upload"] = hosttime(
        lambda: _bench_pack_verify(v, cell_limbs, commitment, proofs, r)
    )

    packed = _bench_pack_verify(v, cell_limbs, commitment, proofs, r)
    fn = FV._verify_device
    out = fn(v, v._commit_tables, v._coset_scale, packed, 128, 128)
    sync(out)
    stages["device_program"] = timeit(
        lambda: fn(v, v._commit_tables, v._coset_scale, packed, 128, 128),
        iters=3,
    )
    stages["fetch_packed"] = hosttime(lambda: np.asarray(out), iters=3)

    from rust_eth_kzg_tpu.utils import bls_host as bls
    from rust_eth_kzg_tpu.utils import native

    host = np.asarray(out)
    fl = D.FP.nlimbs
    ax = host[: fl * 4].reshape(fl, 4)
    ay = host[fl * 4 : 2 * fl * 4].reshape(fl, 4)
    sp = (
        D.FP.from_mont_host(ax[:, :1])[0],
        D.FP.from_mont_host(ay[:, :1])[0],
    )
    stages["host_pairing"] = hosttime(
        lambda: native.multi_pairings(
            [(sp, v.tau_pow_n_g2), (sp, bls.g2_neg(bls.G2_GEN))]
        ),
        iters=3,
    )

    for k, val in stages.items():
        print(json.dumps({"stage": k, "ms": round(val * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
