"""Coset bookkeeping: generators and evaluation-order recovery (host-side).

Mirrors /root/reference/crates/cryptography/kzg_multi_open/src/fk20/cosets.rs:
these are O(domain) index manipulations done once per call on the host; the
heavy math stays on device.
"""

from __future__ import annotations

import numpy as np

from ..constants import R_SCALAR
from ..ops import ntt


def reverse_bits(n: int, bits: int) -> int:
    out = 0
    for b in range(bits):
        out |= ((n >> b) & 1) << (bits - 1 - b)
    return out


def coset_gens(num_points: int, num_cosets: int, bit_reversed: bool) -> list[int]:
    """Generators h_k of the k-th coset (cosets.rs:89-118)."""
    gen = ntt.domain(num_points).generator
    bits = num_cosets.bit_length() - 1
    out = []
    for i in range(num_cosets):
        exp = reverse_bits(i, bits) if bit_reversed else i
        out.append(pow(gen, exp, R_SCALAR))
    return out


def recover_evaluations_in_domain_order(
    domain_size: int, coset_indices: list[int], coset_evaluations: np.ndarray
):
    """Scatter bit-reversed cells back into natural domain order.

    coset_evaluations: [K, coset_len] standard-form limb columns or any numpy
    rows (we operate on positions only — the dtype is opaque). Returns
    (new_coset_indices, elements [domain_size, ...]) with missing positions
    zero-filled; None if inputs are inconsistent (cosets.rs:141-198).
    """
    if len(coset_indices) == 0:
        return None
    coset_evaluations = np.asarray(coset_evaluations)
    k, coset_len = coset_evaluations.shape[:2]
    if k != len(coset_indices):
        return None
    coset_capacity = domain_size // coset_len
    if any(i >= coset_capacity for i in coset_indices):
        return None

    elements = np.zeros((domain_size,) + coset_evaluations.shape[2:],
                        dtype=coset_evaluations.dtype)
    for idx, evals in zip(coset_indices, coset_evaluations):
        start = idx * coset_len
        elements[start : start + coset_len] = evals
    # un-bit-reverse the whole domain ordering
    rev = ntt.bitrev_indices(domain_size)
    elements = elements[rev]

    bits = coset_capacity.bit_length() - 1
    new_indices = [reverse_bits(i, bits) for i in coset_indices]
    return new_indices, elements
