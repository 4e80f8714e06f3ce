"""Run every test tier and record a reproducible green-suite record.

Round-5 verdict #7: nothing in the repo proved "all tiers green at commit X".
This runner executes each test file in its own pytest invocation (so one
tier's failure cannot mask another), parses the summary counts, and writes
TESTS_r05.json with per-file wall times, pass/fail/skip counts, the commit
hash, and the JAX backend. Re-runs are fast: the persistent compilation
cache (.jax_cache) and the spec-suite table snapshot
(.tables/spec_w4_tables.npz) carry across invocations.

Usage: python scripts/run_all_tests.py [--out TESTS_r05.json] [--files a b c]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# Groups run as ONE pytest invocation each: on the tunneled TPU every fresh
# process pays a multi-minute device claim + its own compiles, so 16
# per-file subprocesses would cost hours. Three groups keep failure
# isolation between tiers while sharing claims/compiles within one.
#
# CRITICAL (learned the hard way): the device pool serializes clients, and
# sitecustomize registers the axon backend in EVERY new python process. A
# test that spawns a python subprocess while its parent holds the TPU claim
# DEADLOCKS the pool (child blocks at import, parent waits on child) — so
# every subprocess-spawning tier runs under a CPU-pinned parent.
DEFAULT_FILES = [
    # unit + adversarial + oracle tiers (one TPU process, shared claims;
    # no python-subprocess spawns in any of these files)
    "tests/test_field.py tests/test_bounds.py tests/test_curve.py "
    "tests/test_curve_g2.py tests/test_ntt.py tests/test_msm.py "
    "tests/test_pallas.py tests/test_pairing.py "
    "tests/test_decompress.py tests/test_fk20.py tests/test_recover_fused.py "
    "tests/test_reed_solomon.py tests/test_production_config.py",
    # subprocess-spawning tiers (tiny-field sweeps + multi-chip CPU mesh):
    # CPU parent, no TPU claim anywhere in the tree
    "cpu::tests/test_msm_sweep.py tests/test_mesh.py "
    "tests/test_mesh_mainnet_geometry.py",
    # consensus-spec vector tiers (session-shared DASContext, one TPU claim)
    "tests/test_spec_eip4844.py tests/test_spec_eip7594.py",
]

_SUMMARY = re.compile(
    r"(?:(\d+) passed)?(?:, )?(?:(\d+) skipped)?(?:, )?(?:(\d+) failed)?"
)


def parse_counts(tail: str):
    passed = failed = skipped = 0
    for line in tail.splitlines()[::-1]:
        line = line.strip()
        if "passed" in line or "failed" in line or "skipped" in line:
            m_p = re.search(r"(\d+) passed", line)
            m_f = re.search(r"(\d+) failed", line)
            m_s = re.search(r"(\d+) skipped", line)
            m_e = re.search(r"(\d+) error", line)
            passed = int(m_p.group(1)) if m_p else 0
            failed = int(m_f.group(1)) if m_f else 0
            failed += int(m_e.group(1)) if m_e else 0
            skipped = int(m_s.group(1)) if m_s else 0
            return passed, failed, skipped
    return 0, 1, 0  # no summary line = treat as failure


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="TESTS_r05.json")
    ap.add_argument("--files", nargs="*", default=None)
    args = ap.parse_args()
    files = args.files or DEFAULT_FILES

    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=ROOT, capture_output=True, text=True
    ).stdout.strip()
    try:
        backend = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.default_backend())"],
            cwd=ROOT,
            capture_output=True,
            text=True,
            timeout=600,
        ).stdout.strip().splitlines()[-1:]
        backend = backend[0] if backend else "unknown"
    except subprocess.TimeoutExpired:
        backend = "unknown (backend probe timed out)"

    records = []
    t_suite = time.time()
    for f in files:
        env = dict(os.environ)
        if f.startswith("cpu::"):
            f = f[len("cpu::"):]
            env.update(JAX_PLATFORMS="cpu", KZG_TPU_PALLAS="0")
        t0 = time.time()
        proc = subprocess.run(
            [
                sys.executable,
                "-m",
                "pytest",
                *f.split(),
                "-q",
                "-p",
                "no:cacheprovider",
            ],
            cwd=ROOT,
            env=env,
            capture_output=True,
            text=True,
            timeout=7200,
        )
        dt = time.time() - t0
        passed, failed, skipped = parse_counts(proc.stdout)
        rec = {
            "file": f,
            "passed": passed,
            "failed": failed,
            "skipped": skipped,
            "seconds": round(dt, 1),
        }
        if proc.returncode != 0:
            rec["rc"] = proc.returncode
            rec["tail"] = proc.stdout[-1500:]
        records.append(rec)
        status = "OK " if proc.returncode == 0 else "FAIL"
        print(
            f"{status} {f}: {passed} passed, {failed} failed, "
            f"{skipped} skipped in {dt:.0f}s",
            flush=True,
        )
        # incremental partial record: if the run is killed mid-suite (round
        # deadline), the completed groups still have a checked-in record
        partial = {
            "commit": commit,
            "backend": backend,
            "green": False,
            "in_progress": True,
            "total_passed": sum(r["passed"] for r in records),
            "total_failed": sum(r["failed"] for r in records),
            "total_seconds": round(time.time() - t_suite, 1),
            "files": records,
        }
        with open(ROOT / args.out, "w") as fh:
            json.dump(partial, fh, indent=1)

    result = {
        "commit": commit,
        "backend": backend,
        "green": all(r["failed"] == 0 and "rc" not in r for r in records),
        "total_passed": sum(r["passed"] for r in records),
        "total_failed": sum(r["failed"] for r in records),
        "total_seconds": round(time.time() - t_suite, 1),
        "files": records,
    }
    out_path = ROOT / args.out
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"\nwrote {out_path}: green={result['green']} "
          f"({result['total_passed']} passed, {result['total_failed']} failed, "
          f"{result['total_seconds']:.0f}s)", flush=True)
    sys.exit(0 if result["green"] else 1)


if __name__ == "__main__":
    main()
