"""Naive multi-open oracle + insecure test setup (host-side, Python ints).

Port of the reference's correctness architecture (SURVEY.md §4 tier 3): the
optimized FK20 pipeline is validated against a from-first-principles BDFG-style
multi-open (/root/reference/crates/cryptography/kzg_multi_open/src/naive.rs:28-159)
over an *insecure* deterministic SRS where tau is known — which also lets the
oracle compute quotient commitments as single scalar muls [q(tau)]G1.
"""

from __future__ import annotations

from ..constants import R_SCALAR
from ..ops.poly import lagrange_interpolate_host, vanishing_poly_host
from ..utils import bls_host as bls


def insecure_setup(num_g1: int, num_g2: int, tau: int = 1234567):
    """Deterministic SRS with known tau (test-only; reference analog at
    kzg_multi_open/src/lib.rs:13-61)."""
    g1s, acc = [], 1
    for _ in range(num_g1):
        g1s.append(bls.g1_mul(bls.G1_GEN, acc))
        acc = acc * tau % R_SCALAR
    g2s, acc = [], 1
    for _ in range(num_g2):
        g2s.append(bls.g2_mul(bls.G2_GEN, acc))
        acc = acc * tau % R_SCALAR
    return g1s, g2s, tau


def poly_eval_host(coeffs: list[int], x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % R_SCALAR
    return acc


def poly_divide_exact(num: list[int], den: list[int]) -> list[int]:
    """Exact polynomial division num / den over Fr (den monic-ish, remainder 0)."""
    num = [c % R_SCALAR for c in num]
    dn = len(den) - 1
    while len(num) > 1 and num[-1] == 0:
        num.pop()
    q = [0] * max(len(num) - dn, 0)
    inv_lead = pow(den[-1], R_SCALAR - 2, R_SCALAR)
    for i in range(len(q) - 1, -1, -1):
        coeff = num[i + dn] * inv_lead % R_SCALAR
        q[i] = coeff
        for j, d in enumerate(den):
            num[i + j] = (num[i + j] - coeff * d) % R_SCALAR
    assert all(c == 0 for c in num), "polynomial division had a remainder"
    return q


def compute_multi_opening_naive(poly: list[int], input_points: list[int], tau: int):
    """BDFG multi-point opening: (quotient commitment, output points).

    Mirrors `compute_multi_opening_naive` (naive.rs:28-81) but commits via the
    known tau: [q(tau)]G1.
    """
    ys = [poly_eval_host(poly, x) for x in input_points]
    interp = lagrange_interpolate_host(input_points, ys)
    vanishing = vanishing_poly_host(input_points)
    numerator = list(poly)
    for i, c in enumerate(interp):
        numerator[i] = (numerator[i] - c) % R_SCALAR
    quotient = poly_divide_exact(numerator, vanishing)
    proof = bls.g1_mul(bls.G1_GEN, poly_eval_host(quotient, tau))
    return proof, ys


def commit_host(g1s, coeffs: list[int]):
    acc = None
    for g, c in zip(g1s, coeffs):
        if c:
            acc = bls.g1_add(acc, bls.g1_mul(g, c))
    return acc


def verify_opening_with_pairing(
    g1s, g2s, commitment, proof, input_points, output_points
) -> bool:
    """Full pairing check e(C - [I]_1, -[1]_2) * e(pi, [Z]_2) == 1."""
    interp = lagrange_interpolate_host(input_points, output_points)
    vanishing = vanishing_poly_host(input_points)
    comm_interp = commit_host(g1s, interp)
    comm_vanish_g2 = None
    for g, c in zip(g2s, vanishing):
        if c:
            comm_vanish_g2 = bls.g2_add(comm_vanish_g2, bls.g2_mul(g, c))
    lhs = bls.g1_add(commitment, bls.g1_neg(comm_interp))
    return bls.multi_pairings(
        [(lhs, bls.g2_neg(bls.G2_GEN)), (proof, comm_vanish_g2)]
    )
