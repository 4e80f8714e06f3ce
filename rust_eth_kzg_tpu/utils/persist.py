"""Persist/restore precomputed device tables (checkpoint/resume analog).

The reference's only persistent artifact is the embedded trusted setup; its
expensive context initialization (SRS group-FFTs + MSM window tables,
benchmarked at /root/reference/crates/eip7594/benches/benchmark-mt.rs:103-113)
is recomputed every process start. Here we snapshot the FK20 prover's device
tables to an .npz so later sessions skip the init entirely (SURVEY.md §5
checkpoint/resume parity).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def save_prover_tables(prover, path: str) -> None:
    arrays = {}
    if prover.tables is not None:
        arrays.update(
            fk20_x=np.asarray(prover.tables.table_x),
            fk20_y=np.asarray(prover.tables.table_y),
            fk20_inf=np.asarray(prover.tables.table_inf),
            fk20_window=np.asarray(prover.tables.window),
            fk20_chains=np.asarray(prover.tables.chains),
            fk20_wpc=np.asarray(prover.tables.wpc),
        )
    if prover.commit_tables is not None:
        arrays.update(
            commit_x=np.asarray(prover.commit_tables.table_x),
            commit_y=np.asarray(prover.commit_tables.table_y),
            commit_inf=np.asarray(prover.commit_tables.table_inf),
            commit_window=np.asarray(prover.commit_tables.window),
            commit_chains=np.asarray(prover.commit_tables.chains),
            commit_wpc=np.asarray(prover.commit_tables.wpc),
        )
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def load_prover_tables(prover, path: str) -> bool:
    """Restore tables in place; returns False if the snapshot is missing or
    shaped for a different config/window."""
    from ..ops.msm import FixedBaseMSM

    if not os.path.exists(path):
        return False
    data = np.load(path)
    try:
        if prover.tables is not None:
            if int(data["fk20_window"]) != prover.tables.window or data[
                "fk20_x"
            ].shape != tuple(prover.tables.table_x.shape):
                return False
            prover.tables = FixedBaseMSM(
                table_x=jnp.asarray(data["fk20_x"]),
                table_y=jnp.asarray(data["fk20_y"]),
                table_inf=jnp.asarray(data["fk20_inf"]),
                window=int(data["fk20_window"]),
                instance_ndim=prover.tables.instance_ndim,
                chains=int(data["fk20_chains"]),
                wpc=int(data["fk20_wpc"]),
            )
        if prover.commit_tables is not None:
            if int(data["commit_window"]) != prover.commit_tables.window:
                return False
            prover.commit_tables = FixedBaseMSM(
                table_x=jnp.asarray(data["commit_x"]),
                table_y=jnp.asarray(data["commit_y"]),
                table_inf=jnp.asarray(data["commit_inf"]),
                window=int(data["commit_window"]),
                instance_ndim=0,
                chains=int(data["commit_chains"]),
                wpc=int(data["commit_wpc"]),
            )
    except KeyError:
        return False
    return True
