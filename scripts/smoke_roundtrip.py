"""End-to-end smoke test of the user-level API on the real chip.

Exercises the round-5 single-upload/single-fetch paths: packed prove,
device-decompression verify, fused recover+prove. Prints per-stage wall
times (first call = compile; second = steady state).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax as _jax

_jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np


def mark(msg, _t=[time.time()]):
    now = time.time()
    print(f"+{now - _t[0]:7.1f}s  {msg}", flush=True)
    _t[0] = now


def main():
    from rust_eth_kzg_tpu.api import DASContext
    from rust_eth_kzg_tpu.errors import InvalidProofError, SerializationError

    ctx = DASContext(table_cache="/root/repo/.tables/mainnet_tables.npz")
    mark("context init")

    rng = np.random.default_rng(7)
    blob = b"".join(
        int(x).to_bytes(32, "big") for x in rng.integers(0, 2**31, size=4096)
    )
    cells, proofs = ctx.compute_cells_and_kzg_proofs(blob)
    mark("compute_cells_and_kzg_proofs (first call)")
    t0 = time.time()
    cells2, proofs2 = ctx.compute_cells_and_kzg_proofs(blob)
    mark(f"compute_cells_and_kzg_proofs (steady: {time.time()-t0:.3f}s)")
    assert cells == cells2 and proofs == proofs2
    commitment = ctx.blob_to_kzg_commitment(blob)
    mark("blob_to_kzg_commitment")

    # verify all 128
    args = ([commitment] * 128, list(range(128)), list(cells), list(proofs))
    ctx.verify_cell_kzg_proof_batch(*args)
    mark("verify 128 (first call)")
    t0 = time.time()
    ctx.verify_cell_kzg_proof_batch(*args)
    mark(f"verify 128 (steady: {time.time()-t0:.3f}s)")

    # verify sub-batch (different padded shape)
    ctx.verify_cell_kzg_proof_batch(
        [commitment] * 4, [0, 5, 9, 127], [cells[i] for i in (0, 5, 9, 127)],
        [proofs[i] for i in (0, 5, 9, 127)]
    )
    mark("verify 4 (first call)")

    # invalid proof -> InvalidProofError
    try:
        bad = list(proofs)
        bad[0], bad[1] = bad[1], bad[0]
        ctx.verify_cell_kzg_proof_batch(
            [commitment] * 128, list(range(128)), list(cells), bad
        )
        raise AssertionError("swapped proofs must fail")
    except InvalidProofError:
        mark("invalid proof correctly rejected")

    # malformed point -> SerializationError
    try:
        bad = list(proofs)
        raw = bytearray(bad[0])
        raw[0] ^= 0x01  # perturb x -> off curve (or not canonical)
        bad[0] = bytes(raw)
        ctx.verify_cell_kzg_proof_batch(
            [commitment] * 128, list(range(128)), list(cells), bad
        )
        raise AssertionError("malformed proof must fail")
    except SerializationError as e:
        mark(f"malformed proof correctly rejected ({e})")

    # consensus-spec fixture ground truth (user-level drive, not a test rerun)
    import yaml
    from pathlib import Path

    vec = Path("/root/reference/test_vectors")
    case = data = None
    for case in sorted(
        (vec / "compute_cells_and_kzg_proofs").glob("*/*/data.yaml")
    ):
        data = yaml.safe_load(case.read_text())
        if data["output"] is not None:  # skip must-error fixtures here
            break
    fx_blob = bytes.fromhex(data["input"]["blob"][2:])
    want_cells, want_proofs = data["output"]
    got_cells, got_proofs = ctx.compute_cells_and_kzg_proofs(fx_blob)
    assert ["0x" + c.hex() for c in got_cells] == want_cells, case
    assert ["0x" + p.hex() for p in got_proofs] == want_proofs, case
    mark(f"spec fixture matches ({case.parent.name})")

    vcase = sorted(
        (vec / "verify_cell_kzg_proof_batch").glob("*/*/data.yaml")
    )
    ran = 0
    for c in vcase:
        d = yaml.safe_load(c.read_text())
        inp, out = d["input"], d["output"]
        try:
            ctx.verify_cell_kzg_proof_batch(
                [bytes.fromhex(x[2:]) for x in inp["commitments"]],
                list(inp["cell_indices"]),
                [bytes.fromhex(x[2:]) for x in inp["cells"]],
                [bytes.fromhex(x[2:]) for x in inp["proofs"]],
            )
            assert out is True, f"{c}: expected failure"
        except Exception as e:
            assert out is not True, f"{c}: unexpected {e!r}"
        ran += 1
        if ran >= 8:
            break
    mark(f"verify spec fixtures x{ran} match")

    # recover from the first 64 cells
    rec_cells, rec_proofs = ctx.recover_cells_and_kzg_proofs(
        list(range(64)), list(cells[:64])
    )
    mark("recover (first call)")
    assert tuple(rec_cells) == tuple(cells), "recovered cells mismatch"
    assert tuple(rec_proofs) == tuple(proofs), "recovered proofs mismatch"
    t0 = time.time()
    ctx.recover_cells_and_kzg_proofs(list(range(64)), list(cells[:64]))
    mark(f"recover (steady: {time.time()-t0:.3f}s)")

    print("SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
