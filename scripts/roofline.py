"""Per-kernel roofline: measured vs speed-of-light field-op throughput.

The north-star metric (BASELINE.md) calls for profiling every hot kernel
against the chip's theoretical ceiling. For limb arithmetic the ceiling is set
by int32 multiply throughput on the VPU:

  ops(mont_mul, L limbs) = L * 2L multiplies  (CIOS: one a_i*b row and one
                           m*p row per outer iteration) plus ~4x that in
                           add/shift/mask ALU ops.

A v5e core's VPU is 8x128 lanes; int32 multiplies issue at ~1/lane/cycle
(no MXU path for 32-bit integer products), so speed-of-light is
  SOL = lanes * clock ≈ 1024 * 0.94e9 ≈ 9.6e11 int32-mult/s  (v5e)

Run: python scripts/roofline.py [N]   (default N = 1<<20 elements)
Prints one JSON line per kernel with measured mult/s and fraction of SOL.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from rust_eth_kzg_tpu.ops import curve as C
from rust_eth_kzg_tpu.ops import field as F

# v5e: 8x128 VPU lanes, ~940 MHz, 4 MACs... int32 multiply ≈ 1/lane/cycle.
SOL_INT32_MUL_PER_S = 1024 * 0.94e9


def bench(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    rng = np.random.default_rng(0)

    rows = []
    for spec, name in ((F.FR, "fr"), (F.FP, "fp")):
        vals = [int(x) for x in rng.integers(0, 2**62, size=2 * n)]
        limbs = jnp.asarray(spec.to_mont_host(vals)).reshape(spec.nlimbs, 2, n)
        a, b = limbs[:, 0], limbs[:, 1]
        mults_per_el = 2 * spec.nlimbs * spec.nlimbs

        for path, fn in (
            ("xla", lambda a, b, s=spec: F.mont_mul(s, a, b)),
            ("pallas", None),
        ):
            if path == "pallas":
                if jax.default_backend() != "tpu":
                    continue
                from rust_eth_kzg_tpu.ops import pallas_kernels as PK

                fn = jax.jit(lambda a, b, s=spec: PK.mont_mul(s, a, b))
            dt = bench(fn, a, b)
            mult_s = n * mults_per_el / dt
            rows.append(
                {
                    "kernel": f"mont_mul_{name}_{path}",
                    "elements": n,
                    "us": round(dt * 1e6, 1),
                    "int32_mult_per_s": f"{mult_s:.3e}",
                    "frac_of_SOL": round(mult_s / SOL_INT32_MUL_PER_S, 3),
                }
            )
            print(json.dumps(rows[-1]), flush=True)

    # fused G1 add (12 mont_mul + 2 b3-mul ≈ 14 Fp muls per lane)
    ng = n // 8
    gen = C.points_to_device(
        [(int(__import__("rust_eth_kzg_tpu.constants", fromlist=["G1_GEN_X"]).G1_GEN_X),
          int(__import__("rust_eth_kzg_tpu.constants", fromlist=["G1_GEN_Y"]).G1_GEN_Y))]
    )
    p = C.G1(*(jnp.broadcast_to(c, (F.FP.nlimbs, ng)) for c in gen))
    dt = bench(jax.jit(C.add), p, p)
    fp_muls = 14 * ng
    mult_s = fp_muls * 2 * F.FP.nlimbs**2 / dt
    row = {
        "kernel": "g1_add_fused",
        "elements": ng,
        "us": round(dt * 1e6, 1),
        "int32_mult_per_s": f"{mult_s:.3e}",
        "frac_of_SOL": round(mult_s / SOL_INT32_MUL_PER_S, 3),
    }
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
