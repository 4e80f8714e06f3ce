"""Correctness coverage for the SHIPPED configuration (verdict r3 item 4).

The spec suites run `use_precomp=4` to keep CPU setup light; production (and
bench.py) runs window=8 / chains=4 Lim-Lee tables. This smoke test pushes one
valid consensus vector through the production table layout so a regression in
the wide-window/chained path (table build, digit routing, chord-collision
parameters) fails a test instead of silently corrupting bench output.

Requires the mainnet table snapshot (built by bench.py on the bench host;
~1.3 GB, not committed). Skipped where it is absent so CPU-only CI stays
fast.
"""

import os

import pytest

from rust_eth_kzg_tpu import constants

from .spec_vectors import load_cases, unhex

MAINNET_TABLES = os.environ.get(
    "KZG_TPU_TABLE_CACHE", "/root/repo/.tables/mainnet_tables.npz"
)

pytestmark = [
    pytest.mark.skipif(
        constants.FIELD != "bls12_381", reason="spec vectors are BLS12-381 only"
    ),
    pytest.mark.skipif(
        not os.path.exists(MAINNET_TABLES),
        reason="mainnet table snapshot not present (run bench.py first)",
    ),
]


def test_production_window8_chains4_smoke():
    from rust_eth_kzg_tpu.api import DASContext

    ctx = DASContext(use_precomp=8, table_cache=MAINNET_TABLES)
    case = next(
        (n, i, o)
        for n, i, o in load_cases("compute_cells_and_kzg_proofs")
        if o is not None
    )
    name, inp, output = case
    cells, proofs = ctx.compute_cells_and_kzg_proofs(unhex(inp["blob"]))
    want_cells, want_proofs = output
    assert list(cells) == [unhex(c) for c in want_cells], name
    assert list(proofs) == [unhex(p) for p in want_proofs], name
