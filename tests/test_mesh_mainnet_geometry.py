"""Mainnet-GEOMETRY sharding equality on the tiny field (round-5 verdict #4).

tests/test_mesh.py validates sharded-vs-single equality on the real field at
poly_len=64; the multi-chip dryrun validates mainnet CODE at tiny shapes.
Neither checks that the production shapes' sharding — the [128]-slot table
slices, the all-gather sizes of the slot axis, the 8192-point evaluation
NTT — partitions correctly. This tier runs the mainnet geometry
(poly_len=4096, coset_size=64, 128 proof slots) over the 26-bit tiny field,
where the 1-core XLA:CPU compile is minutes instead of hours, through BOTH
mesh layouts and the public DASContext(mesh=...) API.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from rust_eth_kzg_tpu import constants


@pytest.mark.skipif(
    constants.FIELD == "tiny", reason="direct test runs below in tiny mode"
)
def test_mainnet_geometry_tiny_field_subprocess():
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env = dict(
        os.environ,
        KZG_TPU_FIELD="tiny",
        JAX_PLATFORMS="cpu",
        KZG_TPU_PALLAS="0",
        XLA_FLAGS=flags,
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
        f"tiny-field mainnet-geometry mesh suite failed:\n"
        f"{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}"
    )


@pytest.mark.skipif(
    constants.FIELD != "tiny", reason="runs via the subprocess wrapper"
)
def test_prove_sharded_mainnet_geometry_public_api():
    import jax

    from rust_eth_kzg_tpu.api import DASContext
    from rust_eth_kzg_tpu.models.fk20 import FK20Config
    from rust_eth_kzg_tpu.models.naive import insecure_setup
    from rust_eth_kzg_tpu.parallel import mesh as pmesh
    from rust_eth_kzg_tpu.utils.trusted_setup import TrustedSetup

    cfg = FK20Config(
        poly_len=4096, coset_size=64, expansion=2, fk20_window=4, commit_window=4
    )
    g1s, _, _ = insecure_setup(cfg.poly_len, 0)
    setup = TrustedSetup(
        g1_monomial=g1s, g2_monomial=[None] * (cfg.coset_size + 1)
    )
    mesh = pmesh.make_mesh(8, dp=2, devices=jax.devices("cpu"))
    ctx_mesh = DASContext(trusted_setup=setup, config=cfg, mesh=mesh)
    ctx_single = DASContext(trusted_setup=setup, config=cfg)
    ctx_single.prover = ctx_mesh.prover

    rng = np.random.default_rng(3)
    from rust_eth_kzg_tpu.constants import R_SCALAR

    blobs = [
        b"".join(
            int(x).to_bytes(32, "big")
            for x in rng.integers(0, R_SCALAR, size=cfg.poly_len)
        )
        for _ in range(2)
    ]
    out_mesh = ctx_mesh.compute_cells_and_kzg_proofs_batch(blobs)
    out_single = ctx_single.compute_cells_and_kzg_proofs_batch(blobs)
    assert out_mesh == out_single
