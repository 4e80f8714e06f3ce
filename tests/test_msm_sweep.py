"""MSM parameter sweep (reference proptest analog, SURVEY.md §4).

The reference sweeps MSM variants across lengths and window widths with
proptest (/root/reference/crates/cryptography/bls12_381/src/fixed_base_msm.rs:304-378,
batch_addition.rs:287-327). Compiling one BLS12-381 MSM graph per (window,
length) point is minutes on a 1-core XLA:CPU host, so the sweep runs over the
`tiny` field (KZG_TPU_FIELD=tiny, scripts/find_tiny_curve.py) where the same
code compiles ~100x faster: every dispatch path (window widths, chain counts,
digit routing, bucket machinery) is identical, only the limb count differs.

When the suite runs in BLS mode, `test_tiny_field_msm_sweep` re-invokes this
module in a tiny-field subprocess; in tiny mode the sweep runs directly.
"""

import os
import random
import subprocess
import sys

import pytest

from rust_eth_kzg_tpu import constants

random.seed(77)


def _sweep_cases():
    # (n_points, window, chains)
    return [
        (1, 2, 1),
        (3, 3, 1),
        (5, 4, 2),
        (16, 5, 4),
        (8, 7, 2),
    ]


@pytest.mark.skipif(
    constants.FIELD == "tiny", reason="direct sweep runs below in tiny mode"
)
def test_tiny_field_msm_sweep():
    """Run the sweep in a tiny-field subprocess (env must precede import)."""
    env = dict(os.environ, KZG_TPU_FIELD="tiny", JAX_PLATFORMS="cpu")
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
        timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, (
        f"tiny-field sweep failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}"
    )


@pytest.mark.skipif(
    constants.FIELD != "tiny", reason="sweep runs via the subprocess wrapper"
)
@pytest.mark.parametrize("n,window,chains", _sweep_cases())
def test_fixed_base_msm_sweep(n, window, chains):
    import jax.numpy as jnp

    from rust_eth_kzg_tpu.constants import R_SCALAR
    from rust_eth_kzg_tpu.ops import curve as C
    from rust_eth_kzg_tpu.ops import field as F
    from rust_eth_kzg_tpu.ops import msm
    from rust_eth_kzg_tpu.utils import bls_host as B

    pts = [B.g1_mul(B.G1_GEN, random.randrange(1, R_SCALAR)) for _ in range(n)]
    if n > 2:
        pts[2] = None
    scalars = [random.randrange(R_SCALAR) for _ in range(n)]
    scalars[0] = 0
    try:
        tables = msm.build_fixed_base_msm(
            C.points_to_device(pts), window=window, chains=chains
        )
    except AssertionError as e:
        # the chord-collision guard legitimately rejects some (window, wpc,
        # chains) triples over the tiny field's 21-bit scalar group
        pytest.skip(f"parameter triple rejected by collision guard: {e}")
    got = C.points_from_device(
        msm.fixed_base_msm(tables, jnp.asarray(F.FR.to_mont_host(scalars)))
    )[0]
    acc = None
    for p, k in zip(pts, scalars):
        acc = B.g1_add(acc, B.g1_mul(p, k))
    assert got == acc


@pytest.mark.skipif(
    constants.FIELD != "tiny", reason="sweep runs via the subprocess wrapper"
)
@pytest.mark.parametrize("n,window", [(64, 2), (96, 5), (128, 8), (4096, 8)])
def test_pippenger_sweep(n, window):
    import jax.numpy as jnp

    from rust_eth_kzg_tpu.constants import R_SCALAR
    from rust_eth_kzg_tpu.ops import curve as C
    from rust_eth_kzg_tpu.ops import field as F
    from rust_eth_kzg_tpu.ops import msm
    from rust_eth_kzg_tpu.utils import bls_host as B

    pts = [B.g1_mul(B.G1_GEN, random.randrange(1, R_SCALAR)) for _ in range(n)]
    pts[1] = None
    scalars = [random.randrange(R_SCALAR) for _ in range(n)]
    scalars[3] = 0
    got = C.points_from_device(
        msm.pippenger_msm(
            C.points_to_device(pts),
            jnp.asarray(F.FR.to_mont_host(scalars)),
            window,
        )
    )[0]
    acc = None
    for p, k in zip(pts, scalars):
        acc = B.g1_add(acc, B.g1_mul(p, k))
    assert got == acc
