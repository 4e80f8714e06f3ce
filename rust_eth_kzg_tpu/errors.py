"""Error taxonomy, mirroring the reference's error enums.

The reference distinguishes "malformed input" errors from "the proof is
simply invalid" via `Error::is_proof_invalid`
(/root/reference/crates/eip7594/src/errors.rs:26-35); the consensus-spec test
harness relies on both mapping to a failed call. We model the same taxonomy as
an exception hierarchy with an `is_proof_invalid` property.
"""

from __future__ import annotations


class Error(Exception):
    """Base error for the library."""

    @property
    def is_proof_invalid(self) -> bool:
        return isinstance(self, InvalidProofError)


class SerializationError(Error):
    """Malformed bytes: wrong lengths, non-canonical scalars, invalid points."""


class ProverError(Error):
    """Failure inside a proving routine."""


class VerifierError(Error):
    """Malformed verification inputs (lengths, index ranges)."""


class InvalidProofError(VerifierError):
    """The proof failed the cryptographic check (well-formed inputs)."""


class RecoveryError(Error):
    """Cell recovery preconditions violated or Reed-Solomon decode failure."""
