"""Fiat-Shamir transcripts (SHA-256, host-side).

Byte-exact transcripts per consensus-specs; domain separators and layouts match
/root/reference/crates/eip4844/src/verifier.rs:155-262 and
/root/reference/crates/cryptography/kzg_multi_open/src/fk20/verifier.rs:269-328.
"""

from __future__ import annotations

import hashlib

from ..constants import (
    BYTES_PER_FIELD_ELEMENT,
    FIAT_SHAMIR_PROTOCOL_DOMAIN,
    RANDOM_CHALLENGE_KZG_BATCH_DOMAIN,
    RANDOM_CHALLENGE_KZG_CELL_BATCH_DOMAIN,
    R_SCALAR,
)
from . import bls_host as bls


def compute_blob_challenge(blob: bytes, commitment: bytes) -> int:
    """`compute_challenge` of EIP-4844: hash(DST || width || blob || commitment)."""
    field_elements_per_blob = len(blob) // BYTES_PER_FIELD_ELEMENT
    h = hashlib.sha256()
    h.update(FIAT_SHAMIR_PROTOCOL_DOMAIN)
    h.update(field_elements_per_blob.to_bytes(16, "big"))
    h.update(blob)
    h.update(commitment)
    return bls.reduce_bytes_to_scalar(h.digest())


def compute_r_powers_blob_batch(
    domain_size: int, commitments, zs, ys, proofs, n: int
) -> list[int]:
    """Batch challenge powers for verify_blob_kzg_proof_batch."""
    h = hashlib.sha256()
    h.update(RANDOM_CHALLENGE_KZG_BATCH_DOMAIN)
    h.update(domain_size.to_bytes(8, "big"))
    h.update(n.to_bytes(8, "big"))
    for c, z, y, pf in zip(commitments, zs, ys, proofs):
        h.update(c)
        h.update(z.to_bytes(32, "big"))
        h.update(y.to_bytes(32, "big"))
        h.update(pf)
    r = bls.reduce_bytes_to_scalar(h.digest())
    return compute_powers(r, n)


def compute_cell_batch_challenge(
    num_coefficients: int,
    coset_size: int,
    row_commitments: list[bytes],
    row_indices: list[int],
    coset_indices: list[int],
    coset_evals: list[bytes],
    proofs: list[bytes],
) -> int:
    """Challenge for verify_cell_kzg_proof_batch (RCKZGCBATCH__V1_)."""
    h = hashlib.sha256()
    h.update(RANDOM_CHALLENGE_KZG_CELL_BATCH_DOMAIN)
    h.update(num_coefficients.to_bytes(8, "big"))
    h.update(coset_size.to_bytes(8, "big"))
    h.update(len(row_commitments).to_bytes(8, "big"))
    h.update(len(coset_indices).to_bytes(8, "big"))
    for c in row_commitments:
        h.update(c)
    for k in range(len(coset_indices)):
        h.update(int(row_indices[k]).to_bytes(8, "big"))
        h.update(int(coset_indices[k]).to_bytes(8, "big"))
        h.update(coset_evals[k])
        h.update(proofs[k])
    return bls.reduce_bytes_to_scalar(h.digest())


def compute_powers(value: int, n: int) -> list[int]:
    powers = []
    acc = 1
    for _ in range(n):
        powers.append(acc)
        acc = acc * value % R_SCALAR
    return powers
