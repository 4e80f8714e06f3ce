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

METHODOLOGY (round 4): `jax.block_until_ready` is a no-op on the tunneled
TPU backend (returns at enqueue), so each kernel is iterated INSIDE one jit
via `lax.scan` (k dependent applications, no per-iteration dispatch) and the
timed region is closed with a scalar device-to-host fetch
(rust_eth_kzg_tpu/utils/timing.py) — the only real execution barrier here.

Run: python scripts/roofline.py [N]   (default N = 1<<20 elements)
Prints one JSON line per kernel and writes ROOFLINE.json at the repo root.
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
from rust_eth_kzg_tpu.ops import ntt
from rust_eth_kzg_tpu.utils.timing import sync, sync_overhead

# v5e: 8x128 VPU lanes, ~940 MHz, int32 multiply ≈ 1/lane/cycle.
SOL_INT32_MUL_PER_S = 1024 * 0.94e9
HBM_GB_S = 819.0  # v5e


def bench_chained(step, x, k=16, iters=4):
    """Seconds per application of `step`, iterated k times inside one jit
    (dependent chain — execution cannot be elided or overlapped) and timed
    across `iters` dispatches closed by one fetch sync."""

    @jax.jit
    def chain(x):
        def body(c, _):
            return step(c), None

        c, _ = jax.lax.scan(body, x, None, length=k)
        return c

    out = chain(x)
    sync(out)
    rtt = sync_overhead(out)
    t0 = time.time()
    for _ in range(iters):
        out = chain(x)
    sync(out)
    return max(time.time() - t0 - rtt, 1e-9) / (iters * k)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    rng = np.random.default_rng(0)
    rows = []

    def record(kernel, elements, dt, mults_per_el=None, bytes_per_el=None):
        row = {"kernel": kernel, "elements": elements, "us": round(dt * 1e6, 1)}
        if mults_per_el:
            mult_s = elements * mults_per_el / dt
            row["int32_mult_per_s"] = f"{mult_s:.3e}"
            row["frac_of_SOL"] = round(mult_s / SOL_INT32_MUL_PER_S, 3)
        if bytes_per_el:
            row["GB_s"] = round(elements * bytes_per_el / dt / 1e9, 1)
            row["frac_of_HBM"] = round(
                elements * bytes_per_el / dt / 1e9 / HBM_GB_S, 3
            )
        rows.append(row)
        print(json.dumps(row), flush=True)

    # --- Montgomery multiplication, Fr (18 limbs) and Fp (26 limbs) ---
    for spec, name in ((F.FR, "fr"), (F.FP, "fp")):
        vals = [int(x) for x in rng.integers(0, 2**62, size=2 * n)]
        limbs = jnp.asarray(spec.to_mont_host(vals)).reshape(spec.nlimbs, 2, n)
        a, b = limbs[:, 0], limbs[:, 1]
        mults_per_el = 2 * spec.nlimbs * spec.nlimbs

        dt = bench_chained(lambda c, b=b, s=spec: F.mont_mul(s, c, b), a)
        record(f"mont_mul_{name}_xla", n, dt, mults_per_el)

        if jax.default_backend() == "tpu":
            from rust_eth_kzg_tpu.ops import pallas_kernels as PK

            dt = bench_chained(lambda c, b=b, s=spec: PK.mont_mul(s, c, b), a)
            record(f"mont_mul_{name}_pallas", n, dt, mults_per_el)

    # --- fused G1 complete add (~14 Fp muls per lane) ---
    ng = n // 8
    from rust_eth_kzg_tpu import constants as K

    gen = C.points_to_device([(int(K.G1_GEN_X), int(K.G1_GEN_Y))])
    p = C.G1(*(jnp.broadcast_to(c, (F.FP.nlimbs, ng)) for c in gen))
    dt = bench_chained(lambda c, q=p: C.add(c, q), p, k=8)
    record("g1_add_fused", ng, dt, 14 * 2 * F.FP.nlimbs**2)

    dt = bench_chained(C.double, p, k=8)
    record("g1_double_fused", ng, dt, 10 * 2 * F.FP.nlimbs**2)

    # --- scalar NTT 8192 (the FK20 eval transform) ---
    dom = ntt.domain(8192)
    vals = [int(x) for x in rng.integers(0, 2**62, size=8192)]
    poly = jnp.asarray(F.FR.to_mont_host(vals)).reshape(F.FR.nlimbs, 1, 8192)
    dt = bench_chained(dom.fft, poly, k=4, iters=4)
    # 13 stages x 4096 butterflies x (1 mul + 2 add); count muls only
    record("ntt_8192", 8192, dt, mults_per_el=13 * 2 * F.FR.nlimbs**2 // 2)

    # --- batch inversion 8192 (reference bench config) ---
    vals = [int(x) for x in rng.integers(1, 2**62, size=8192)]
    arr = jnp.asarray(F.FR.to_mont_host(vals)).reshape(F.FR.nlimbs, 1, 8192)
    dt = bench_chained(lambda c: F.batch_inverse(F.FR, c), arr, k=2, iters=3)
    record("batch_inverse_8192", 8192, dt)

    out_path = Path(__file__).resolve().parent.parent / "ROOFLINE.json"
    out_path.write_text(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
                "sol_int32_mult_per_s": SOL_INT32_MUL_PER_S,
                "hbm_GB_s": HBM_GB_S,
                "methodology": "k-chained lax.scan inside one jit, closed by "
                "a scalar device-to-host fetch (block_until_ready is a no-op "
                "on this tunneled backend; see utils/timing.py)",
                "kernels": rows,
            },
            indent=1,
        )
        + "\n"
    )
    print(f"# wrote {out_path}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
