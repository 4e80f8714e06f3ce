"""Multi-chip tier (SURVEY.md §4): sharded pipelines match the single-chip
program bit-exactly on a virtual 8-device CPU mesh.

The reference has no distributed analog (rayon threads only); this tier is
new for the TPU build — it validates that GSPMD partitioning of the FK20
pipeline (dp blob-batch layout and the intra-blob work layout with its
all-gather over the proof-slot axis) changes nothing about the numerics.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_eth_kzg_tpu.models.fk20 import FK20Config, FK20Prover
from rust_eth_kzg_tpu.models.naive import insecure_setup
from rust_eth_kzg_tpu.ops import field as F
from rust_eth_kzg_tpu.parallel import mesh as pmesh

FR = F.FR

# The CPU-mesh tests must run with the CPU as the DEFAULT backend: with a TPU
# default, the curve ops dispatch to Mosaic kernels at trace time
# (pallas_kernels.enabled() keys on the default backend) and cannot lower for
# the CPU mesh devices. When an accelerator is the default, re-invoke this
# module in a CPU-pinned subprocess instead.
_ON_CPU = jax.default_backend() == "cpu"

pytestmark = pytest.mark.skipif(
    len(jax.devices("cpu")) < 8, reason="needs 8 virtual CPU devices"
)

_direct = pytest.mark.skipif(
    not _ON_CPU, reason="runs via the CPU-pinned subprocess wrapper below"
)


@pytest.mark.skipif(_ON_CPU, reason="direct tests run on this backend")
def test_mesh_suite_cpu_subprocess():
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env = dict(
        os.environ, JAX_PLATFORMS="cpu", KZG_TPU_PALLAS="0", XLA_FLAGS=flags
    )
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            os.path.abspath(__file__),
            "-x",
            "-q",
            "-p",
            "no:cacheprovider",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, (
        f"cpu-mesh suite failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}"
    )


@pytest.fixture(scope="module")
def tiny_prover():
    cfg = FK20Config(
        poly_len=64, coset_size=8, expansion=2, fk20_window=4, commit_window=4
    )
    g1s, _, _ = insecure_setup(cfg.poly_len, 1)
    return FK20Prover(g1s, cfg)


@pytest.fixture(scope="module")
def tiny_data(tiny_prover):
    cfg = tiny_prover.config
    rng = np.random.default_rng(7)
    scalars = [int(x) for x in rng.integers(0, 2**62, size=8 * cfg.poly_len)]
    return jnp.asarray(F.FR.to_mont_host(scalars)).reshape(
        FR.nlimbs, 8, cfg.poly_len
    )


@_direct
def test_prove_dp_sharded_matches_single(tiny_prover, tiny_data):
    mesh = pmesh.make_mesh(8, devices=jax.devices("cpu"))
    proofs, cells = pmesh.prove_sharded(tiny_prover, mesh, tiny_data)
    single_proofs, single_cells = tiny_prover.prove_from_data(tiny_data)
    np.testing.assert_array_equal(np.asarray(single_cells), np.asarray(cells))
    np.testing.assert_array_equal(
        np.asarray(single_proofs.x), np.asarray(proofs.x)
    )
    np.testing.assert_array_equal(
        np.asarray(single_proofs.inf), np.asarray(proofs.inf)
    )


@_direct
def test_prove_work_sharded_matches_single(tiny_prover, tiny_data):
    mesh = pmesh.make_mesh(8, dp=2, devices=jax.devices("cpu"))
    data_dp = tiny_data[:, :2, :]
    proofs, cells = pmesh.prove_work_sharded(tiny_prover, mesh, data_dp)
    single_proofs, single_cells = tiny_prover.prove_from_data(data_dp)
    np.testing.assert_array_equal(np.asarray(single_cells), np.asarray(cells))
    np.testing.assert_array_equal(
        np.asarray(single_proofs.x), np.asarray(proofs.x)
    )


@_direct
def test_lincomb_sharded_matches_single():
    """Point-sharded MSM (shard_map + all_gather combine) == unsharded."""
    import random

    from rust_eth_kzg_tpu.constants import R_SCALAR
    from rust_eth_kzg_tpu.ops import curve as C
    from rust_eth_kzg_tpu.ops import msm as M
    from rust_eth_kzg_tpu.utils import bls_host as B

    random.seed(31)
    n = 16
    mesh = pmesh.make_mesh(8, devices=jax.devices("cpu"))
    pts = [B.g1_mul(B.G1_GEN, random.randrange(1, R_SCALAR)) for _ in range(n)]
    pts[3] = None
    scal = [random.randrange(R_SCALAR) for _ in range(n)]
    scal[5] = 0
    dev = C.points_to_device(pts)
    sm = jnp.asarray(FR.to_mont_host(scal))
    got = pmesh.lincomb_sharded(dev, sm, mesh, axis="work")
    want = M.lincomb(dev, sm)
    assert bool(np.asarray(C.equal(got, want)))


@_direct
def test_fft_sharded_matches_single():
    """Four-step NTT with explicit all_to_all == single-device domain.fft."""
    import random

    from rust_eth_kzg_tpu.constants import R_SCALAR
    from rust_eth_kzg_tpu.ops import ntt

    random.seed(32)
    n = 64
    mesh = pmesh.make_mesh(8, devices=jax.devices("cpu"))
    dom = ntt.domain(n)
    xs = [random.randrange(R_SCALAR) for _ in range(2 * n)]
    x = jnp.asarray(FR.to_mont_host(xs)).reshape(FR.nlimbs, 2, n)
    got = pmesh.fft_sharded(dom, x, mesh, axis="work")
    want = dom.fft(x)
    assert F.FR.from_mont_host(
        np.asarray(got).reshape(FR.nlimbs, -1)
    ) == F.FR.from_mont_host(np.asarray(want).reshape(FR.nlimbs, -1))
