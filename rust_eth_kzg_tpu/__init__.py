"""tpu-eth-kzg: a TPU-native KZG commitment library (EIP-4844 + EIP-7594).

Brand-new JAX/XLA design with the capabilities of crate-crypto/rust-eth-kzg:
see SURVEY.md at the repo root for the component map.
"""

from . import constants
from .api import Context4844, DASContext
from .errors import (
    Error,
    InvalidProofError,
    ProverError,
    RecoveryError,
    SerializationError,
    VerifierError,
)
from .utils.trusted_setup import TrustedSetup

__all__ = [
    "DASContext",
    "Context4844",
    "TrustedSetup",
    "Error",
    "SerializationError",
    "ProverError",
    "VerifierError",
    "InvalidProofError",
    "RecoveryError",
    "constants",
]
