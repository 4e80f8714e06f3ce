"""Consensus-spec vectors for the EIP-7594 PeerDAS cell API (tier 4)."""

import pytest

from rust_eth_kzg_tpu.errors import Error

from .spec_vectors import load_cases, unhex
from .test_spec_eip4844 import ctx, expect, _check_verify  # session fixture reuse


def test_compute_cells_and_kzg_proofs(ctx):
    cases = load_cases("compute_cells_and_kzg_proofs")
    # batch all valid blobs through one jit call (the TPU-native path),
    # then error cases individually
    valid = [(n, i, o) for n, i, o in cases if o is not None]
    blobs = [unhex(i["blob"]) for _, i, _ in valid]
    results = ctx.compute_cells_and_kzg_proofs_batch(blobs)
    for (name, _, output), (cells, proofs) in zip(valid, results):
        want_cells, want_proofs = output
        assert list(cells) == [unhex(c) for c in want_cells], name
        assert list(proofs) == [unhex(p) for p in want_proofs], name
    for name, inp, output in cases:
        if output is None:
            with pytest.raises(Error):
                ctx.compute_cells_and_kzg_proofs(unhex(inp["blob"]))


def test_recover_cells_and_kzg_proofs(ctx):
    for name, inp, output in load_cases("recover_cells_and_kzg_proofs"):
        got = expect(
            output,
            lambda: ctx.recover_cells_and_kzg_proofs(
                list(inp["cell_indices"]), [unhex(c) for c in inp["cells"]]
            ),
        )
        if output is not None:
            cells, proofs = got
            want_cells, want_proofs = output
            assert list(cells) == [unhex(c) for c in want_cells], name
            assert list(proofs) == [unhex(p) for p in want_proofs], name


def test_verify_cell_kzg_proof_batch(ctx):
    for name, inp, output in load_cases("verify_cell_kzg_proof_batch"):
        _check_verify(
            output,
            lambda: ctx.verify_cell_kzg_proof_batch(
                [unhex(c) for c in inp["commitments"]],
                list(inp["cell_indices"]),
                [unhex(c) for c in inp["cells"]],
                [unhex(p) for p in inp["proofs"]],
            ),
            name,
        )
