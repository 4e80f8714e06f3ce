"""Polynomial utilities over Fr limb arrays.

Replaces the reference's PolyCoeff helpers
(/root/reference/crates/cryptography/polynomial/src/poly_coeff.rs:13-176) with
TPU-shaped equivalents: Horner evaluation and Ruffini division are linear
recurrences, so instead of sequential loops they run as log-depth
`associative_scan`s over (multiplier, offset) pairs — the TPU-friendly form of
`divide_by_linear` (/root/reference/crates/cryptography/kzg_single_open/src/
prover.rs:48-65).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import R_SCALAR
from . import field as F

FR = F.FR


def _compose_affine(spec, m1, a1, m2, a2):
    """Composition of x -> m*x + a maps: (m2, a2) after (m1, a1)."""
    return F.mont_mul(spec, m1, m2), F.add(spec, a2, F.mont_mul(spec, m2, a1))


def poly_eval(coeffs: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Horner evaluation sum_i c_i z^i.

    coeffs: [L, *batch, N]; z: [L, *batch]. Log-depth via scan composition of
    the affine maps acc -> z*acc + c_i (applied from the top coefficient).
    """
    n = coeffs.shape[-1]
    zb = jnp.broadcast_to(z[..., None], z.shape + (n,))
    # process coefficients top-down: reverse along N
    c_rev = coeffs[..., ::-1]
    # move scan axis to front: [N, L, *batch]
    ms = jnp.moveaxis(zb, -1, 0)
    as_ = jnp.moveaxis(c_rev, -1, 0)

    def combine(x, y):
        m1, a1 = x
        m2, a2 = y
        m1 = jnp.moveaxis(m1, 0, 1)
        a1 = jnp.moveaxis(a1, 0, 1)
        m2 = jnp.moveaxis(m2, 0, 1)
        a2 = jnp.moveaxis(a2, 0, 1)
        m, a = _compose_affine(FR, m1, a1, m2, a2)
        return jnp.moveaxis(m, 1, 0), jnp.moveaxis(a, 1, 0)

    m_fin, a_fin = jax.lax.associative_scan(combine, (ms, as_), axis=0)
    # full composition applied to acc=0 gives the evaluation
    return a_fin[-1]


def divide_by_linear(coeffs: jnp.ndarray, z: jnp.ndarray):
    """(quotient, remainder) of f(X) / (X - z) by synthetic division.

    coeffs: [L, *batch, N]; returns quotient [L, *batch, N-1] and remainder
    [L, *batch] with f(X) = q(X)(X - z) + rem (rem = f(z)). Same semantics as
    the reference's `divide_by_linear`, but computed with an inclusive
    associative scan: q_i = c_{i+1} + z*q_{i+1}.
    """
    n = coeffs.shape[-1]
    zb = jnp.broadcast_to(z[..., None], z.shape + (n,))
    c_rev = coeffs[..., ::-1]
    ms = jnp.moveaxis(zb, -1, 0)
    as_ = jnp.moveaxis(c_rev, -1, 0)

    def combine(x, y):
        m1, a1 = x
        m2, a2 = y
        m1 = jnp.moveaxis(m1, 0, 1)
        a1 = jnp.moveaxis(a1, 0, 1)
        m2 = jnp.moveaxis(m2, 0, 1)
        a2 = jnp.moveaxis(a2, 0, 1)
        m, a = _compose_affine(FR, m1, a1, m2, a2)
        return jnp.moveaxis(m, 1, 0), jnp.moveaxis(a, 1, 0)

    _, acc = jax.lax.associative_scan(combine, (ms, as_), axis=0)
    # acc[k] = value after folding top k+1 coefficients = q_{n-2-k} (k < n-1)
    seq = jnp.moveaxis(acc, 0, -1)  # [L, *batch, N]
    quotient = seq[..., n - 2 :: -1] if n > 1 else seq[..., :0]
    remainder = seq[..., n - 1]
    return quotient, remainder


def vanishing_poly_host(roots: list[int]) -> list[int]:
    """Host helper: monic polynomial with the given roots (coefficient ints).

    Mirrors `vanishing_poly` (/root/reference/crates/cryptography/polynomial/
    src/poly_coeff.rs:109-124); used for Reed-Solomon erasure patterns where the
    root set is data-dependent but tiny (<= 64 roots).
    """
    coeffs = [1]
    for r in roots:
        nxt = [0] * (len(coeffs) + 1)
        for i, c in enumerate(coeffs):
            nxt[i] = (nxt[i] - c * r) % R_SCALAR
            nxt[i + 1] = (nxt[i + 1] + c) % R_SCALAR
        coeffs = nxt
    return coeffs


def lagrange_interpolate_host(xs: list[int], ys: list[int]) -> list[int]:
    """Host O(n^2) Lagrange interpolation (test oracle grade), mirrors
    poly_coeff.rs:126-176."""
    n = len(xs)
    coeffs = [0] * n
    for i in range(n):
        # numerator poly prod_{j != i} (X - x_j)
        num = [1]
        denom = 1
        for j in range(n):
            if j == i:
                continue
            nxt = [0] * (len(num) + 1)
            for k, c in enumerate(num):
                nxt[k] = (nxt[k] - c * xs[j]) % R_SCALAR
                nxt[k + 1] = (nxt[k + 1] + c) % R_SCALAR
            num = nxt
            denom = denom * (xs[i] - xs[j]) % R_SCALAR
        scale = ys[i] * pow(denom, R_SCALAR - 2, R_SCALAR) % R_SCALAR
        for k, c in enumerate(num):
            coeffs[k] = (coeffs[k] + c * scale) % R_SCALAR
    return coeffs
