"""Persist/restore precomputed device tables (checkpoint/resume analog).

The reference's only persistent artifact is the embedded trusted setup; its
expensive context initialization (SRS group-FFTs + MSM window tables,
benchmarked at /root/reference/crates/eip7594/benches/benchmark-mt.rs:103-113)
is recomputed every process start. Here we snapshot the FK20 prover's device
tables to an .npz so later sessions skip the init entirely (SURVEY.md §5
checkpoint/resume parity). `try_load_tables` runs *before* the device build,
so a cache hit skips the SRS group-FFT and the table scans outright.
"""

from __future__ import annotations

import hashlib
import os

import jax.numpy as jnp
import numpy as np

# Bump when the FixedBaseMSM table memory layout changes.
# v4: rows stored as uint8 (the bf16 values are exact 8-bit limb halves) —
# half the snapshot bytes, which halves the host->device upload that
# dominates snapshot init on the tunneled TPU.
LAYOUT_VERSION = 4


def srs_fingerprint(commit_key_points: list) -> str:
    """Content hash of the host SRS points ((x, y) int tuples or None)."""
    h = hashlib.sha256()
    h.update(str(len(commit_key_points)).encode())
    for pt in commit_key_points:
        h.update(repr(pt).encode())
    return h.hexdigest()[:16]


def _table_arrays(prefix: str, tables) -> dict:
    # the bf16 rows hold exact 8-bit limb halves; persist them as uint8
    rows_f = np.asarray(tables.table_rows)
    assert rows_f.size == 0 or float(rows_f.max()) <= 255, (
        "table rows exceed uint8 range — a _rows_layout change requires a "
        "LAYOUT_VERSION bump (advisor r4-low)"
    )
    rows = rows_f.astype(np.uint8)
    return {
        f"{prefix}_rows": rows,
        f"{prefix}_inf": np.asarray(tables.base_inf),
        f"{prefix}_meta": np.asarray(
            [tables.window, tables.instance_ndim, tables.chains, tables.wpc]
        ),
    }


def _table_from(data, prefix: str):
    from ..ops.msm import FixedBaseMSM

    meta = data[f"{prefix}_meta"]
    # upload the uint8 rows (half the bytes of bf16) and widen on device
    rows = jnp.asarray(data[f"{prefix}_rows"]).astype(jnp.bfloat16)
    return FixedBaseMSM(
        table_rows=rows,
        base_inf=jnp.asarray(data[f"{prefix}_inf"]),
        window=int(meta[0]),
        instance_ndim=int(meta[1]),
        chains=int(meta[2]),
        wpc=int(meta[3]),
    )


def save_tables_file(
    path: str, fingerprint: str, fk20=None, commit=None, geometry=None
) -> None:
    """Snapshot built MSM tables keyed by layout version + SRS fingerprint +
    protocol geometry (poly_len, coset_size, expansion) — a cache built under
    a different FK20Config over the same SRS must not load (advisor r1-low)."""
    arrays = {
        "layout_version": np.asarray(LAYOUT_VERSION),
        "fingerprint": np.asarray(fingerprint),
    }
    if geometry is not None:
        arrays["geometry"] = np.asarray(list(geometry), dtype=np.int64)
    if fk20 is not None:
        arrays.update(_table_arrays("fk20", fk20))
    if commit is not None:
        arrays.update(_table_arrays("commit", commit))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    # uncompressed: limb data is high-entropy, compression only costs minutes
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def try_load_tables(
    path: str, fingerprint: str, fk20_window, commit_window, geometry=None
):
    """Load (fk20_tables, commit_tables) if the snapshot matches; else None.

    Matching = same layout version, same SRS content hash, same protocol
    geometry (poly_len, coset_size, expansion), same window widths for
    whichever tables the config enables.
    """
    if not path or not os.path.exists(path):
        return None
    try:
        data = np.load(path)
        if int(data["layout_version"]) != LAYOUT_VERSION:
            return None
        if str(data["fingerprint"]) != fingerprint:
            return None
        if geometry is not None:
            if "geometry" not in data.files:
                return None
            if list(data["geometry"]) != [int(g) for g in geometry]:
                return None
        fk20 = commit = None
        if fk20_window is not None:
            fk20 = _table_from(data, "fk20")
            if fk20.window != fk20_window:
                return None
        if commit_window is not None:
            commit = _table_from(data, "commit")
            if commit.window != commit_window:
                return None
        return fk20, commit
    except (KeyError, OSError, ValueError, TypeError):
        return None


# --- legacy prover-object helpers (kept for the public save/load API) ---


def _prover_geometry(prover):
    cfg = prover.config
    return (cfg.poly_len, cfg.coset_size, cfg.expansion)


def save_prover_tables(prover, path: str) -> None:
    save_tables_file(
        path,
        getattr(prover, "_srs_fingerprint", ""),
        fk20=prover.tables,
        commit=prover.commit_tables,
        geometry=_prover_geometry(prover),
    )


def load_prover_tables(prover, path: str) -> bool:
    """Restore tables in place; returns False if the snapshot is missing or
    shaped for a different config/window/SRS."""
    cfg = prover.config
    loaded = try_load_tables(
        path,
        getattr(prover, "_srs_fingerprint", ""),
        cfg.fk20_window,
        cfg.commit_window,
        geometry=_prover_geometry(prover),
    )
    if loaded is None:
        return False
    fk20, commit = loaded
    if fk20 is not None:
        if prover.tables is not None and fk20.table_rows.shape != tuple(
            prover.tables.table_rows.shape
        ):
            return False
        prover.tables = fk20
    if commit is not None:
        prover.commit_tables = commit
    return True
