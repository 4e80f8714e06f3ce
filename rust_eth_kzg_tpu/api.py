"""Public API: `DASContext` (EIP-7594 PeerDAS) and `Context4844` (EIP-4844).

Function names, validation rules, and error semantics mirror the reference's
API crates (/root/reference/crates/eip7594/src/{lib.rs,prover.rs:100-172,
verifier.rs:49-164,recovery.rs:22-151} and /root/reference/crates/eip4844/src/),
so a user of the reference can switch over directly. Inputs/outputs are raw
bytes; the heavy math runs as jitted TPU pipelines, batched over blobs.

Beyond the reference's per-blob calls, every prover entry point also accepts a
*list* of blobs (`*_batch` variants) — the TPU-native way to hit throughput.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import constants as CONST
from .errors import RecoveryError, SerializationError, VerifierError
from .models import cosets
from .models.fk20 import FK20Config, FK20Prover
from .models.fk20_verifier import FK20Verifier
from .models.kzg_single import SingleOpenProver, SingleOpenVerifier
from .models.reed_solomon import ReedSolomon
from .ops import curve as C
from .ops import field as F
from .ops import limbs as L
from .ops import ntt
from .ops import poly as POLY
from .utils import bls_host as bls
from .utils import fiat_shamir as fs
from .utils import serialization as ser
from .utils.trusted_setup import TrustedSetup

FR = F.FR


def _to_mont_device(std_limbs: np.ndarray) -> jnp.ndarray:
    """Standard-form limbs [L, N] -> Montgomery [L, 1, N] on device."""
    return F.to_mont(FR, jnp.asarray(std_limbs))[:, None, :]


def _cells_to_bytes(cells_mont: jnp.ndarray) -> list[tuple[bytes, ...]]:
    """[L, B, num_proofs, coset] Montgomery -> per-blob tuples of cell bytes."""
    std = F.from_mont(FR, cells_mont)
    return _cells_bytes_from_std(np.asarray(std))


def _cells_bytes_from_std(arr: np.ndarray) -> list[tuple[bytes, ...]]:
    """Host standard-form limbs [L, B, K, M] -> per-blob cell byte tuples."""
    nl, b, k, m = arr.shape
    out = []
    for i in range(b):
        flat = ser.serialize_scalars(arr[:, i].reshape(nl, k * m))
        out.append(
            tuple(
                flat[j * CONST.BYTES_PER_CELL : (j + 1) * CONST.BYTES_PER_CELL]
                for j in range(k)
            )
        )
    return out


def _proofs_bytes_from_std(px, py, inf, b: int, k: int) -> list[tuple[bytes, ...]]:
    """Host standard-form affine limbs [FPL, B*K] + inf mask -> compressed
    proof byte tuples per blob."""
    from .ops import limbs as LIMB

    xs = LIMB.limbs_to_ints(px)
    ys = LIMB.limbs_to_ints(py)
    pts = [
        None if inf[j] else (xs[j], ys[j]) for j in range(b * k)
    ]
    return [
        tuple(bls.g1_compress(pts[i * k + j]) for j in range(k)) for i in range(b)
    ]


class Context4844:
    """EIP-4844 blob API (reference: /root/reference/crates/eip4844/src/lib.rs)."""

    def __init__(self, prover: FK20Prover, setup: TrustedSetup):
        self._prover = prover
        self._single = SingleOpenProver(
            commit_tables=prover.commit_tables,
            commit_points=prover._commit_points,
        )
        self._verifier = SingleOpenVerifier(
            gen_g1=setup.g1_monomial[0],
            gen_g2=setup.g2_monomial[0],
            tau_g2=setup.g2_monomial[1],
        )
        self._poly_domain = prover.poly_domain

    # --- prover ---

    def blob_to_kzg_commitment(self, blob: bytes) -> bytes:
        data = _to_mont_device(ser.deserialize_blob(blob))
        commitment = C.points_from_device(self._prover.commit_from_data(data))[0]
        return bls.g1_compress(commitment)

    def compute_kzg_proof(self, blob: bytes, z: bytes) -> tuple[bytes, bytes]:
        data = _to_mont_device(ser.deserialize_blob(blob))
        z_int = _deserialize_scalar_checked(z)
        poly = self._prover.blob_to_poly(data)
        zm = jnp.asarray(FR.to_mont_host([z_int]))
        proof, y = self._single.compute_kzg_proof(poly, zm)
        proof_pt = C.points_from_device(proof)[0]
        y_int = FR.from_mont_host(np.asarray(F.canonical(FR, y)))[0]
        return bls.g1_compress(proof_pt), y_int.to_bytes(32, "big")

    def compute_blob_kzg_proof(self, blob: bytes, commitment: bytes) -> bytes:
        data = _to_mont_device(ser.deserialize_blob(blob))
        ser.deserialize_g1(commitment)  # validation only
        z = fs.compute_blob_challenge(blob, commitment)
        poly = self._prover.blob_to_poly(data)
        zm = jnp.asarray(FR.to_mont_host([z]))
        proof, _ = self._single.compute_kzg_proof(poly, zm)
        return bls.g1_compress(C.points_from_device(proof)[0])

    # --- verifier ---

    def verify_kzg_proof(
        self, commitment: bytes, z: bytes, y: bytes, proof: bytes
    ) -> None:
        c = ser.deserialize_g1(commitment)
        pf = ser.deserialize_g1(proof)
        z_int = _deserialize_scalar_checked(z)
        y_int = _deserialize_scalar_checked(y)
        self._verifier.verify_kzg_proof(c, z_int, y_int, pf)

    def _blob_challenge_eval(self, blob: bytes, commitment: bytes):
        """(z, y = f(z)) for the blob's polynomial."""
        data = _to_mont_device(ser.deserialize_blob(blob))
        z = fs.compute_blob_challenge(blob, commitment)
        poly = self._prover.blob_to_poly(data)
        zm = jnp.asarray(FR.to_mont_host([z]))
        y = POLY.poly_eval(poly, zm)
        y_int = FR.from_mont_host(np.asarray(F.canonical(FR, y)))[0]
        return z, y_int

    def verify_blob_kzg_proof(
        self, blob: bytes, commitment: bytes, proof: bytes
    ) -> None:
        c = ser.deserialize_g1(commitment)
        pf = ser.deserialize_g1(proof)
        z, y = self._blob_challenge_eval(blob, commitment)
        self._verifier.verify_kzg_proof(c, z, y, pf)

    def verify_blob_kzg_proof_batch(
        self, blobs: list[bytes], commitments: list[bytes], proofs: list[bytes]
    ) -> None:
        if not (len(blobs) == len(commitments) == len(proofs)):
            raise VerifierError(
                "batch verification inputs must have the same length: "
                f"{len(blobs)} blobs, {len(commitments)} commitments, "
                f"{len(proofs)} proofs"
            )
        if not blobs:
            return  # empty batch verifies vacuously (eip4844/src/verifier.rs:84)
        cs = ser.deserialize_g1_batch(list(commitments))
        pfs = ser.deserialize_g1_batch(list(proofs))
        # challenges are host hashes; the per-blob polynomial evaluations run
        # as ONE batched device call (deserialize -> IFFT -> Horner over [B])
        zs = [
            fs.compute_blob_challenge(blob, commitment)
            for blob, commitment in zip(blobs, commitments)
        ]
        data = np.stack([ser.deserialize_blob(b) for b in blobs], axis=1)
        poly = self._prover.blob_to_poly(F.to_mont(FR, jnp.asarray(data)))
        zm = jnp.asarray(FR.to_mont_host(zs))  # [L, B]
        y_mont = POLY.poly_eval(poly, zm)  # [L, B]
        ys = FR.from_mont_host(np.asarray(F.canonical(FR, y_mont)))
        r_powers = fs.compute_r_powers_blob_batch(
            self._poly_domain.size, commitments, zs, ys, proofs, len(blobs)
        )
        self._verifier.verify_kzg_proof_batch(cs, zs, ys, pfs, r_powers)


def _deserialize_scalar_checked(data: bytes) -> int:
    if len(data) != CONST.BYTES_PER_FIELD_ELEMENT:
        raise SerializationError(
            f"scalar has invalid length {len(data)}, expected 32"
        )
    value = int.from_bytes(data, "big")
    if value >= CONST.R_SCALAR:
        raise SerializationError("scalar is not canonical")
    return value


class DASContext:
    """EIP-7594 PeerDAS cell API + embedded EIP-4844 context.

    Mirrors DASContext (/root/reference/crates/eip7594/src/lib.rs:41-87).
    `use_precomp` is the window width of the fixed-base MSM tables
    (the reference's UsePrecomp knob; None disables precomputation).
    """

    def __init__(
        self,
        trusted_setup: TrustedSetup | None = None,
        use_precomp: int | None = CONST.RECOMMENDED_PRECOMP_WIDTH,
        table_cache: str | None = None,
        mesh=None,
        config: FK20Config | None = None,
    ):
        """`mesh`: a jax.sharding.Mesh with ("dp", "work") axes (see
        parallel.mesh.make_mesh). When set, the batched prover entry points
        shard transparently: blobs across `dp`, the FK20 proof-slot axis
        (and its MSM table slices) across `work` — the user never touches
        pjit/shard_map, the analog of the reference's `maybe_rayon` switch
        (/root/reference/crates/maybe_rayon/src/lib.rs:1-16).
        `config` overrides the protocol geometry (tests/dryruns only)."""
        import os as _os

        setup = trusted_setup or TrustedSetup.default()
        cfg = config or FK20Config(
            poly_len=CONST.FIELD_ELEMENTS_PER_BLOB,
            coset_size=CONST.FIELD_ELEMENTS_PER_CELL,
            expansion=CONST.EXPANSION_FACTOR,
            fk20_window=use_precomp,
            commit_window=use_precomp,
        )
        self.config = cfg
        self.mesh = mesh
        self._mesh_tables = None
        if table_cache is None:
            table_cache = _os.environ.get("KZG_TPU_TABLE_CACHE") or None
        self.prover = FK20Prover(setup.g1_monomial, cfg, table_cache=table_cache)
        self.rs = ReedSolomon(
            poly_len=cfg.poly_len,
            expansion_factor=cfg.expansion,
            block_size=cfg.num_proofs,
        )
        self.verifier = FK20Verifier(
            g1s=setup.g1_monomial[: len(setup.g2_monomial)],
            g2s=setup.g2_monomial,
            coset_size=cfg.coset_size,
            num_coefficients=cfg.poly_len,
            num_points_to_open=cfg.ext_size,
            num_cosets=cfg.num_proofs,
        )
        self.eip4844 = Context4844(self.prover, setup)

    # --- precomputed-table persistence (checkpoint/resume, SURVEY.md §5) ---

    def save_tables(self, path: str) -> None:
        """Snapshot the device-resident MSM tables; later sessions can skip
        the expensive context initialization via `load_tables`."""
        from .utils.persist import save_prover_tables

        save_prover_tables(self.prover, path)

    def load_tables(self, path: str) -> bool:
        from .utils.persist import load_prover_tables

        return load_prover_tables(self.prover, path)

    # --- EIP-4844 passthrough (eip4844_methods.rs analog) ---

    def blob_to_kzg_commitment(self, blob: bytes) -> bytes:
        return self.eip4844.blob_to_kzg_commitment(blob)

    def compute_kzg_proof(self, blob: bytes, z: bytes):
        return self.eip4844.compute_kzg_proof(blob, z)

    def compute_blob_kzg_proof(self, blob: bytes, commitment: bytes) -> bytes:
        return self.eip4844.compute_blob_kzg_proof(blob, commitment)

    def verify_kzg_proof(self, commitment, z, y, proof) -> None:
        return self.eip4844.verify_kzg_proof(commitment, z, y, proof)

    def verify_blob_kzg_proof(self, blob, commitment, proof) -> None:
        return self.eip4844.verify_blob_kzg_proof(blob, commitment, proof)

    def verify_blob_kzg_proof_batch(self, blobs, commitments, proofs) -> None:
        return self.eip4844.verify_blob_kzg_proof_batch(blobs, commitments, proofs)

    # --- prover API (prover.rs:100-172) ---

    def compute_cells_and_kzg_proofs(self, blob: bytes):
        cells, proofs = self.compute_cells_and_kzg_proofs_batch([blob])[0]
        return cells, proofs

    def compute_cells_and_kzg_proofs_batch(self, blobs: list[bytes]):
        """TPU-native batched variant: one jit invocation for B blobs,
        one packed upload and one packed fetch (each host<->device transfer
        is a ~20 ms round trip on the tunneled TPU)."""
        from .models import fk20 as FK

        if not blobs:
            raise SerializationError("batch contains no blobs")
        if self.config.poly_len == CONST.FIELD_ELEMENTS_PER_BLOB:
            data = np.stack([ser.deserialize_blob(b) for b in blobs], axis=1)
        else:  # non-mainnet geometry (tests/dryruns)
            data = np.stack(
                [ser.deserialize_scalars(b, self.config.poly_len) for b in blobs],
                axis=1,
            )
        data = data.astype(np.uint16)  # 15-bit limbs; halve the upload bytes
        if self.mesh is not None:
            out = self._prove_packed_sharded(jnp.asarray(data))
        else:
            out = FK._prove_packed_from_data(
                self.prover, self.prover.tables, jnp.asarray(data)
            )
        host = np.asarray(out)  # one fetch
        b = len(blobs)
        k = self.config.num_proofs
        cells_std, px, py, inf = FK.unpack_prove_outputs(
            host, b, k, self.config.coset_size
        )
        return list(
            zip(
                _cells_bytes_from_std(cells_std),
                _proofs_bytes_from_std(px, py, inf, b, k),
            )
        )

    def _prove_packed_sharded(self, data_std: jnp.ndarray):
        """Multi-chip prove through the mesh: blob batch over `dp`, the FK20
        proof-slot axis (with its table slices) over `work` — the
        prove_work_sharded layout of parallel/mesh.py behind the public API."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .models import fk20 as FK

        mesh = self.mesh
        dp = mesh.shape.get("dp", 1)
        if data_std.shape[1] % dp != 0:
            from .errors import ProverError

            raise ProverError(
                f"blob batch of {data_std.shape[1]} does not divide the mesh's "
                f"dp axis ({dp}); pad the batch or reshape the mesh"
            )
        if self._mesh_tables is None:
            # shard the per-slot MSM tables across the work axis once; each
            # chip holds only its slice of the multi-GB table arrays
            def _put_leaf(leaf):
                spec = P(*(("work",) + (None,) * (leaf.ndim - 1)))
                return jax.device_put(leaf, NamedSharding(mesh, spec))

            self._mesh_tables = jax.tree_util.tree_map(
                _put_leaf, self.prover.tables
            )
        data = jax.device_put(
            data_std, NamedSharding(mesh, P(None, "dp", None))
        )
        slot_sharding = NamedSharding(mesh, P(None, "dp", "work", None))
        return FK._prove_packed_from_data(
            self.prover, self._mesh_tables, data, slot_sharding
        )

    def compute_cells(self, blob: bytes):
        data = _to_mont_device(ser.deserialize_blob(blob))
        cells = self.prover.extend_from_data(data)
        return _cells_to_bytes(cells)[0]

    def recover_cells_and_kzg_proofs(
        self, cell_indices: list[int], cells: list[bytes]
    ):
        return self.recover_cells_and_kzg_proofs_batch([(cell_indices, cells)])[0]

    def recover_cells_and_kzg_proofs_batch(
        self, batches: list[tuple[list[int], list[bytes]]]
    ):
        """Batched recovery: list of (cell_indices, cells) pairs -> list of
        (cells, proofs). The per-blob erasure patterns may differ; the
        vanishing polynomials are built per blob on the host (tiny), while
        the 5-NTT recovery, its degree check, AND the FK20 re-prove run as
        ONE fused device program over all blobs, with one packed upload and
        one packed fetch. No reference analog (the reference is strictly
        per-blob, recovery.rs:22-88); this is the TPU-native throughput path."""
        from .models import fk20 as FK

        if not batches:
            raise SerializationError("batch contains no recovery inputs")
        e_stds, z_stds = [], []
        for cell_indices, cells in batches:
            e_std, missing = self._recover_inputs(cell_indices, cells)
            e_stds.append(e_std)
            z_stds.append(self.rs.construct_vanishing_poly_small(missing))
        e_std = np.stack(e_stds, axis=1)  # [L, B, ext]
        z_small = np.stack(z_stds, axis=1)  # [L, B, nz]
        b = len(batches)
        # uint16 transfer form: every element is a canonical 15-bit limb
        packed = jnp.asarray(
            np.concatenate([e_std.ravel(), z_small.ravel()]).astype(np.uint16)
        )
        out = FK._recover_prove_packed(
            self.rs, self.prover, self.prover.tables, packed, b
        )
        host = np.asarray(out).astype(np.int32)  # one fetch
        ok = host[:b].astype(bool)
        if not ok.all():
            bad = [i for i, v in enumerate(ok) if not v]
            raise RecoveryError(
                f"recovered polynomial has invalid degree for batch entries "
                f"{bad} (corrupt input cells?)"
            )
        k = self.config.num_proofs
        cells_std, px, py, inf = FK.unpack_prove_outputs(
            host[b:], b, k, self.config.coset_size
        )
        return list(
            zip(
                _cells_bytes_from_std(cells_std),
                _proofs_bytes_from_std(px, py, inf, b, k),
            )
        )

    def _recover_inputs(self, cell_indices, cells):
        # validation (recovery.rs:90-151)
        if len(cell_indices) != len(cells):
            raise RecoveryError(
                f"number of cell indices ({len(cell_indices)}) does not match "
                f"number of cells ({len(cells)})"
            )
        for idx in cell_indices:
            if idx >= CONST.CELLS_PER_EXT_BLOB:
                raise RecoveryError(
                    f"cell index {idx} out of range "
                    f"(max {CONST.CELLS_PER_EXT_BLOB})"
                )
        if any(b >= a for a, b in zip(cell_indices[1:], cell_indices)):
            raise RecoveryError("cell indices must be unique and sorted")
        min_needed = CONST.CELLS_PER_EXT_BLOB // CONST.EXPANSION_FACTOR
        if len(cell_indices) < min_needed:
            raise RecoveryError(
                f"not enough cells to reconstruct: got {len(cells)}, "
                f"need at least {min_needed}"
            )
        if len(cell_indices) > CONST.CELLS_PER_EXT_BLOB:
            raise RecoveryError(
                f"too many cells: got {len(cells)}, max {CONST.CELLS_PER_EXT_BLOB}"
            )

        # deserialize cells -> [K, coset, L] standard-form limbs (one
        # vectorized pass over all K cells; the per-cell loop was ~30 ms)
        cell_limbs = ser.deserialize_cells_batch(cells)
        recovered = cosets.recover_evaluations_in_domain_order(
            CONST.FIELD_ELEMENTS_PER_EXT_BLOB, list(cell_indices), cell_limbs
        )
        assert recovered is not None, "validated inputs cannot fail reordering"
        indices_normal, flat = recovered  # flat: [ext, L]
        missing = [
            i
            for i in range(CONST.CELLS_PER_EXT_BLOB)
            if i not in set(indices_normal)
        ]
        return np.ascontiguousarray(flat.T), missing  # [L, ext] standard form

    # --- verifier API (verifier.rs:49-112) ---

    def verify_cell_kzg_proof_batch(
        self,
        commitments: list[bytes],
        cell_indices: list[int],
        cells: list[bytes],
        proofs: list[bytes],
    ) -> None:
        commitments = [bytes(c) for c in commitments]
        proofs_bytes = [bytes(p) for p in proofs]
        # dedup commitments (verifier.rs:42-65)
        unique, indices = [], []
        seen = {}
        for c in commitments:
            if c not in seen:
                seen[c] = len(unique)
                unique.append(c)
            indices.append(seen[c])

        if not (
            len(indices) == len(cell_indices) == len(cells) == len(proofs_bytes)
        ):
            raise VerifierError(
                "batch verification inputs must have the same length: "
                f"{len(indices)} commitments, {len(cell_indices)} cell indices, "
                f"{len(cells)} cells, {len(proofs_bytes)} proofs"
            )
        for ci in cell_indices:
            if ci >= CONST.CELLS_PER_EXT_BLOB:
                raise VerifierError(
                    f"cell index {ci} out of range (max {CONST.CELLS_PER_EXT_BLOB})"
                )
        if not cells:
            return

        cell_limbs = ser.deserialize_cells_batch(cells)  # [K, coset, L]

        r = fs.compute_cell_batch_challenge(
            self.config.poly_len,
            self.config.coset_size,
            unique,
            indices,
            list(cell_indices),
            [bytes(c) for c in cells],
            proofs_bytes,
        )
        # point decompression (incl. subgroup checks) happens on DEVICE inside
        # verifier.verify — raw bytes go straight into the packed upload
        self.verifier.verify(
            unique,
            indices,
            list(cell_indices),
            cell_limbs,
            proofs_bytes,
            r,
        )
