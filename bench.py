"""Benchmark matrix on the real chip (BASELINE.md configurations).

Emits one JSON line per metric ({"metric", "value", "unit", "vs_baseline"});
the LAST line is the headline compute_cells_and_kzg_proofs throughput (the
north-star metric the driver parses). A metric that fails emits
{"metric", "error"} instead of silently vanishing (round-4 verdict weak #7).

The baseline for the headline is the Rust reference's multithreaded
single-host throughput; the reference publishes no numbers and this image has
no Rust toolchain (BASELINE.md), so we use the documented estimate of
25 blobs/s (~40 ms/blob multithreaded on a modern 16-core host). Other
metrics report vs_baseline = null: no published reference numbers exist.

MEASUREMENT NOTE (round 4): `jax.block_until_ready` is a no-op on the
tunneled remote-TPU backend here — it returns at enqueue, so timing loops
closed with it measure the DISPATCH rate, not execution. This harness closes
every timed region with a scalar device-to-host fetch (utils/timing.py), the
only reliable execution barrier on this backend, and subtracts the measured
fetch round-trip.

Matrix (reference bench configs; file:line in BASELINE.md):
  init (cached/cold)                 eip7594/benches/benchmark-mt.rs:103-113
  compute_cells latency (1 blob)     benchmark-mt.rs:36-49
  FK20 prove in isolation            kzg_multi_open/benches/benchmark.rs:11-38
  verify_cell_kzg_proof_batch 128    benchmark-mt.rs:77-101
  FK20 verify in isolation           kzg_multi_open/benches/benchmark.rs:40-78
  recover_cells (64 missing)         benchmark-mt.rs:51-75
  G1 MSM 4096 variable-base          bls12_381/benches/benchmark.rs:47-55
  fixed-base MSM 64, width 8         bls12_381/benches/benchmark.rs:26-45
  G2 MSM 65                          bls12_381/benches/benchmark.rs:57-66
  batch inversion 8192               bls12_381/benches/benchmark.rs:12-24
  scalar FFT 8192                    polynomial/benches/benchmark.rs:17-25
  G1 FFT 8192 / 128                  polynomial/benches/benchmark.rs:27-33
  RS decode (64 missing blocks)      erasure_codes/benches/benchmark.rs:7-36
  compute_cells throughput B=16      headline (batched TPU path)
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


def emit_error(metric, exc):
    print(json.dumps({"metric": metric, "error": repr(exc)[:300]}), flush=True)
    note(f"{metric} FAILED: {exc!r}")


def metric(name, unit, fn, vs_baseline=None):
    """Run one metric; loud JSON error line on failure instead of silence."""
    try:
        value = fn()
    except Exception as e:  # noqa: BLE001 - the record must survive any failure
        emit_error(name, e)
        return None
    emit(name, value, unit, vs_baseline)
    return value


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rust_eth_kzg_tpu.api import DASContext
    from rust_eth_kzg_tpu.ops import curve as C
    from rust_eth_kzg_tpu.ops import field as F
    from rust_eth_kzg_tpu.ops import msm as M
    from rust_eth_kzg_tpu.ops import ntt
    from rust_eth_kzg_tpu.utils.timing import sync, timeit

    # B=8 measured fastest on v5e (42.8 blobs/s vs 39.3 at 16, 37.7 at 32 —
    # per-blob cost grows past B~8 as the window-sum working set pressures HBM)
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    window = int(os.environ.get("BENCH_WINDOW", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    t_bench_start = time.time()

    cache = os.environ.get(
        "KZG_TPU_TABLE_CACHE", "/root/repo/.tables/mainnet_tables.npz"
    )
    cache_hit = os.path.exists(cache)
    t0 = time.time()
    ctx = DASContext(use_precomp=window, table_cache=cache)
    sync(ctx.prover.tables)  # uploads are async-dispatched; wait for HBM
    init_s = time.time() - t0
    note(f"init (tables on device): {init_s:.1f}s (cache_hit={cache_hit})")
    # label honestly: without a snapshot file this measured a cold rebuild
    if cache_hit:
        emit("initialize context (cached tables)", init_s, "s")
    else:
        emit("initialize context (cold, tables rebuilt)", init_s, "s")

    rng = np.random.default_rng(42)
    scalars = [int(x) for x in rng.integers(0, 2**62, size=batch * 4096)]
    data = jnp.asarray(F.FR.to_mont_host(scalars)).reshape(F.FR.nlimbs, batch, 4096)

    # --- headline: batched prove throughput (device path, fetch-synced) ---
    prove = ctx.prover.prove_from_data
    t0 = time.time()
    out = prove(data)
    sync(out)
    note(f"prove first call (compile+run+sync): {time.time() - t0:.1f}s")
    dt = timeit(prove, data, iters=iters)
    headline_blobs_per_s = batch / dt

    # --- single-blob latency (batch=1) ---
    def m_single():
        data1 = data[:, :1]
        t0 = time.time()
        sync(prove(data1))
        note(f"prove B=1 first call: {time.time() - t0:.1f}s")
        return timeit(prove, data1, iters=iters) * 1e3

    metric("compute_cells_and_kzg_proofs latency (1 blob)", "ms", m_single)

    # --- FK20 prove in isolation (poly already in coefficient form) ---
    def m_fk20_prove():
        poly1 = ctx.prover.blob_to_poly(data[:, :1])
        sync(poly1)
        fn = ctx.prover.prove_from_poly
        sync(fn(poly1))
        return timeit(fn, poly1, iters=iters) * 1e3

    metric("FK20 prove multi-opening (poly 4096, 128 proofs)", "ms", m_fk20_prove)

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
        emit_error("user-level compute_cells", e)
        cells = None

    # --- verify_cell_kzg_proof_batch: 128 cells, 1 unique commitment ---
    if cells is not None:
        def m_verify():
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
            return (time.time() - t0) / iters * 1e3

        metric("verify_cell_kzg_proof_batch (128 cells)", "ms", m_verify)

        # --- FK20 verify in isolation: the device program only ---
        def m_verify_device():
            from rust_eth_kzg_tpu.models import fk20_verifier as FV
            from rust_eth_kzg_tpu.ops import decompress as D
            from rust_eth_kzg_tpu.utils import fiat_shamir as fs
            from rust_eth_kzg_tpu.utils import serialization as ser

            v = ctx.verifier
            cell_limbs = ser.deserialize_cells_batch(list(cells))
            r = fs.compute_cell_batch_challenge(
                ctx.config.poly_len, ctx.config.coset_size,
                [commitment], [0] * 128, list(range(128)),
                [bytes(c) for c in cells], [bytes(p) for p in proofs],
            )
            # build the packed upload once (host prep excluded), time device
            x_std, sort, inf = D.parse_compressed_g1_batch(
                [commitment] + list(proofs)
            )
            # reuse verify()'s packing by calling it once for compile, then
            # time the jitted device fn on the same packed input
            import numpy as _np

            v.verify([commitment], [0] * 128, list(range(128)),
                     cell_limbs, list(proofs), r)
            # time end-to-end minus host: approximate device share by timing
            # the jitted program via its cache entry
            packed = _bench_pack_verify(v, cell_limbs, commitment, proofs, r)
            fn = FV._verify_device
            out = fn(v, v._commit_tables, v._coset_scale, packed, 128, 128)
            sync(out)
            return timeit(
                lambda: fn(v, v._commit_tables, v._coset_scale, packed, 128, 128),
                iters=iters,
            ) * 1e3

        metric(
            "FK20 verify multi-opening (128 openings, device program)",
            "ms",
            m_verify_device,
        )

    # --- recover_cells_and_kzg_proofs: worst case, 64 of 128 missing ---
    if cells is not None:
        def m_recover():
            idx = list(range(64))
            have = list(cells[:64])
            t0 = time.time()
            ctx.recover_cells_and_kzg_proofs(idx, have)
            note(f"recover first call (compile+run): {time.time() - t0:.1f}s")
            t0 = time.time()
            for _ in range(iters):
                ctx.recover_cells_and_kzg_proofs(idx, have)
            return (time.time() - t0) / iters * 1e3

        metric("recover_cells_and_kzg_proofs (64 of 128 missing)", "ms", m_recover)

    # --- RS decode standalone (device program, no re-prove) ---
    def m_rs():
        rs = ctx.rs
        e = jnp.zeros((F.FR.nlimbs, 1, 8192), jnp.int32)
        one = F.FR.broadcast_const(F.FR.one_mont, (1, 8192))
        z = np.asarray(rs.construct_vanishing_poly(list(range(64))))
        zd = jnp.asarray(z)
        fn = lambda: rs._recover_device(one, zd)
        sync(fn())
        return timeit(fn, iters=iters) * 1e3

    metric("RS decode (ext 8192, 64 missing blocks)", "ms", m_rs)

    # --- variable-base MSM, 4096 points (north-star metric 2) ---
    from rust_eth_kzg_tpu.utils.trusted_setup import TrustedSetup

    setup_pts = None

    def m_msm():
        nonlocal setup_pts
        setup_pts = C.points_to_device(TrustedSetup.default().g1_monomial[:4096])
        msm_scalars = [int(x) for x in rng.integers(0, 2**62, size=4096)]
        sm = jnp.asarray(F.FR.to_mont_host(msm_scalars))

        def run_msm():
            return M.lincomb(setup_pts, sm)

        t0 = time.time()
        sync(run_msm())
        note(f"MSM 4096 first call (compile+run+sync): {time.time() - t0:.1f}s")
        return timeit(run_msm, iters=iters) * 1e3

    metric("G1 MSM 4096 points (Pippenger, variable base)", "ms", m_msm)

    # --- fixed-base MSM 64 points, width 8 ---
    # sub-ms op: many dependent dispatches per sync amortize the tunnel RTT
    def m_fixed64():
        pts64 = C.G1(*(c[:, :64] for c in setup_pts))
        t64 = M.build_fixed_base_msm(pts64, window=8, chains=4)
        sm = jnp.asarray(
            F.FR.to_mont_host([int(x) for x in rng.integers(0, 2**62, size=64)])
        )
        fn = lambda: M.fixed_base_msm(t64, sm)
        sync(fn())
        return timeit(fn, iters=100) * 1e6

    metric("fixed-base MSM 64 points (width 8)", "us", m_fixed64)

    # --- G2 MSM 65 on device (ops/curve_g2.py) ---
    def m_g2():
        from rust_eth_kzg_tpu.ops import curve_g2 as G2

        g2s = TrustedSetup.default().g2_monomial  # 65 points
        pts = G2.points_to_device(g2s)
        ks = [int(x) for x in rng.integers(1, 2**62, size=len(g2s))]
        sm = jnp.asarray(F.FR.to_mont_host(ks))
        fn = lambda: G2.g2_lincomb(pts, sm)
        sync(fn())
        return timeit(fn, iters=iters) * 1e3

    metric("G2 MSM 65 points (device)", "ms", m_g2)

    # --- batch inversion 8192 ---
    def m_inv():
        vals = jnp.asarray(
            F.FR.to_mont_host(
                [int(x) | 1 for x in rng.integers(1, 2**62, size=8192)]
            )
        )
        fn = lambda: F.batch_inverse(F.FR, vals, axis=1)
        sync(fn())
        return timeit(fn, iters=50) * 1e6

    metric("batch inversion 8192", "us", m_inv)

    # --- scalar NTT 8192 (k-chained inside one jit: the transform is ~0.4 ms,
    # below the tunnel RTT noise of per-call timing) ---
    def m_ntt():
        dom = ntt.domain(8192)
        x = jnp.asarray(
            F.FR.to_mont_host([int(v) for v in rng.integers(0, 2**62, size=8192)])
        )[:, None, :]

        @jax.jit
        def chain(x):
            for _ in range(16):
                x = dom.fft(x)
            return x

        sync(chain(x))
        return timeit(lambda: chain(x), iters=iters) / 16 * 1e6

    metric("scalar FFT 8192", "us", m_ntt)

    # --- G1 FFT 128 (the FK20 proof-domain transform) and 8192 (baseline row) ---
    def m_g1fft(n):
        def inner():
            dom = ntt.domain(n)
            reps = -(-n // 4096)
            src = C.G1(
                *(
                    jnp.tile(c[:, :4096], (1, reps))[:, None, :n]
                    for c in setup_pts
                )
            )
            fn = lambda: dom.fft_g1(src)
            sync(fn())
            return timeit(fn, iters=iters) * 1e3
        return inner

    metric("G1 FFT 128", "ms", m_g1fft(128))
    metric("G1 FFT 8192", "ms", m_g1fft(8192))

    # --- cold init (tables rebuilt from the SRS on device) ---
    # skipped when the earlier metrics already consumed the wall budget: the
    # rebuild is ~5 min worst-case (table build + possible recompiles) and
    # must not starve the headline metric of its run
    elapsed = time.time() - t_bench_start
    deadline = float(os.environ.get("BENCH_COLD_DEADLINE_S", "1500"))
    if not cache_hit:
        note("skipping cold init (the first init already measured a cold rebuild)")
    elif os.environ.get("BENCH_COLD", "1") == "1" and elapsed > deadline:
        note(f"skipping cold init (elapsed {elapsed:.0f}s > {deadline:.0f}s)")
    elif os.environ.get("BENCH_COLD", "1") == "1":
        def m_cold():
            import gc

            nonlocal ctx, out, data, prove, setup_pts
            # the warm context holds ~2 GB of window tables on device; drop
            # every live device buffer before the rebuild or the cold build
            # OOMs the chip. The jit caches pin the warm prover (a
            # static_argnums arg) and through it the tables — clear them too.
            ctx = prove = out = data = setup_pts = None
            jax.clear_caches()
            gc.collect()
            t0 = time.time()
            cold = DASContext(use_precomp=window, table_cache=None)
            sync(cold.prover.tables)  # the table build is async-dispatched too
            dt = time.time() - t0
            del cold
            gc.collect()
            return dt

        metric("initialize context (cold, tables rebuilt)", "s", m_cold)

    # headline LAST (the driver parses the final JSON line)
    emit(
        "compute_cells_and_kzg_proofs throughput",
        headline_blobs_per_s,
        "blobs/s",
        headline_blobs_per_s / REFERENCE_BLOBS_PER_S,
    )


def _bench_pack_verify(v, cell_limbs, commitment, proofs, r):
    """Rebuild the packed verify upload exactly as FK20Verifier.verify does
    (host prep extracted so the device program can be timed in isolation)."""
    import numpy as np
    import jax.numpy as jnp

    from rust_eth_kzg_tpu.ops import decompress as D
    from rust_eth_kzg_tpu.ops import field as F
    from rust_eth_kzg_tpu.utils import fiat_shamir as fs
    from rust_eth_kzg_tpu.constants import R_SCALAR

    FR = F.FR
    batch = 128
    padded = 128
    n_comm = 1
    r_powers = fs.compute_powers(r, batch)
    x_std, sort, inf = D.parse_compressed_g1_batch([commitment] + list(proofs))
    nl = x_std.shape[0]
    xs = np.zeros((nl, 2 * padded), dtype=np.int32)
    xs[:, :n_comm] = x_std[:, :n_comm]
    xs[:, padded : padded + batch] = x_std[:, n_comm:]
    flags_np = np.zeros((2, 2 * padded), dtype=np.int32)
    flags_np[0, :n_comm] = sort[:n_comm]
    flags_np[0, padded : padded + batch] = sort[n_comm:]
    flags_np[1] = 1
    flags_np[1, :n_comm] = inf[:n_comm]
    flags_np[1, padded : padded + batch] = inf[n_comm:]
    weighted = [
        rp * v.coset_gens_pow_n[ci] % R_SCALAR
        for rp, ci in zip(r_powers, range(128))
    ]
    weights = [0] * n_comm
    for ci, rp in zip([0] * 128, r_powers):
        weights[ci] = (weights[ci] + rp) % R_SCALAR
    scal3 = np.asarray(
        FR.to_mont_host(
            r_powers + weighted + weights + [0] * (padded - n_comm)
        ),
        dtype=np.int32,
    )
    evals = np.moveaxis(np.asarray(cell_limbs), -1, 0).reshape(FR.nlimbs, -1)
    r_mont = np.asarray(FR.to_mont_host(r_powers), dtype=np.int32)
    cidx = np.arange(padded, dtype=np.int32)
    return jnp.asarray(
        np.concatenate(
            [xs.ravel(), flags_np.ravel(), scal3.ravel(), evals.ravel(),
             r_mont.ravel(), cidx]
        ).astype(np.uint16)  # transfer form matches FK20Verifier.verify
    )


if __name__ == "__main__":
    main()
