"""Consensus-spec vectors for the EIP-4844 blob API (309-fixture tier 4)."""

import pytest

from rust_eth_kzg_tpu.errors import Error

from .spec_vectors import load_cases, unhex


@pytest.fixture(scope="session")
def ctx():
    # narrow window keeps CPU setup light; results are window-independent.
    # The table snapshot makes repeat suite runs skip the build entirely
    # (checkpoint/resume path, utils/persist.py).
    from rust_eth_kzg_tpu.api import DASContext

    return DASContext(
        use_precomp=4, table_cache="/root/repo/.tables/spec_w4_tables.npz"
    )


def expect(output, fn):
    """Run fn; output None means any library error is the correct result."""
    if output is None:
        with pytest.raises(Error):
            fn()
        return None
    return fn()


def test_blob_to_kzg_commitment(ctx):
    for name, inp, output in load_cases("blob_to_kzg_commitment"):
        got = expect(output, lambda: ctx.blob_to_kzg_commitment(unhex(inp["blob"])))
        if output is not None:
            assert got == unhex(output), name


def test_compute_kzg_proof(ctx):
    for name, inp, output in load_cases("compute_kzg_proof"):
        got = expect(
            output,
            lambda: ctx.compute_kzg_proof(unhex(inp["blob"]), unhex(inp["z"])),
        )
        if output is not None:
            proof, y = got
            assert proof == unhex(output[0]), name
            assert y == unhex(output[1]), name


def test_compute_blob_kzg_proof(ctx):
    for name, inp, output in load_cases("compute_blob_kzg_proof"):
        got = expect(
            output,
            lambda: ctx.compute_blob_kzg_proof(
                unhex(inp["blob"]), unhex(inp["commitment"])
            ),
        )
        if output is not None:
            assert got == unhex(output), name


def _check_verify(output, fn, name):
    """Verification vectors: true -> ok, false -> invalid proof, null -> error."""
    if output is True:
        fn()
    elif output is False:
        with pytest.raises(Error) as exc_info:
            fn()
        assert exc_info.value.is_proof_invalid, f"{name}: expected invalid proof"
    else:
        with pytest.raises(Error) as exc_info:
            fn()
        assert not exc_info.value.is_proof_invalid, f"{name}: expected input error"


def test_verify_kzg_proof(ctx):
    for name, inp, output in load_cases("verify_kzg_proof"):
        _check_verify(
            output,
            lambda: ctx.verify_kzg_proof(
                unhex(inp["commitment"]), unhex(inp["z"]), unhex(inp["y"]),
                unhex(inp["proof"]),
            ),
            name,
        )


def test_verify_blob_kzg_proof(ctx):
    for name, inp, output in load_cases("verify_blob_kzg_proof"):
        _check_verify(
            output,
            lambda: ctx.verify_blob_kzg_proof(
                unhex(inp["blob"]), unhex(inp["commitment"]), unhex(inp["proof"])
            ),
            name,
        )


def test_verify_blob_kzg_proof_batch(ctx):
    for name, inp, output in load_cases("verify_blob_kzg_proof_batch"):
        _check_verify(
            output,
            lambda: ctx.verify_blob_kzg_proof_batch(
                [unhex(b) for b in inp["blobs"]],
                [unhex(c) for c in inp["commitments"]],
                [unhex(p) for p in inp["proofs"]],
            ),
            name,
        )
