"""Offline search for the `tiny` test-field parameters (KZG_TPU_FIELD=tiny).

Finds a short-Weierstrass curve y^2 = x^3 + 4 over a ~26-bit prime p with a
prime-order subgroup r such that:
  - p = 1 mod 3 (cube roots of unity exist -> GLV endomorphism (x,y)->(bx,y)),
  - r = 1 mod 3 (eigenvalue lambda with lambda^2+lambda+1 = 0 mod r),
  - v2(r-1) >= 12 (NTT domains up to 2^12),
  - p, r both fit 3x15-bit limbs with the same lazy-reduction headroom the
    production field code assumes (CIOS bound p + (8p)^2/2^45 << 2p).

The winning parameters are baked into rust_eth_kzg_tpu/constants.py; this
script is committed so the numbers are reproducible. The tiny field exists so
compile-heavy multi-chip dryruns and CPU CI can run the *same program
structure* (identical jax graphs modulo limb count) in seconds instead of
tens of minutes on a 1-core host — see __graft_entry__.dryrun_multichip.
"""

import random
import sys
from math import isqrt

random.seed(7)


def is_prime(n: int) -> bool:
    if n < 2:
        return False
    for sp in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % sp == 0:
            return n == sp
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def sqrt_mod(a: int, p: int) -> int | None:
    """Tonelli-Shanks."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c, t, r = i, b * b % p, t * b * b % p, r * b % p
    return r


class Curve:
    """y^2 = x^3 + 4 over Fp, affine host ops (None = identity)."""

    def __init__(self, p):
        self.p = p

    def add(self, a, b):
        p = self.p
        if a is None:
            return b
        if b is None:
            return a
        x1, y1 = a
        x2, y2 = b
        if x1 == x2:
            if (y1 + y2) % p == 0:
                return None
            lam = (3 * x1 * x1) * pow(2 * y1, -1, p) % p
        else:
            lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
        x3 = (lam * lam - x1 - x2) % p
        return (x3, (lam * (x1 - x3) - y1) % p)

    def mul(self, pt, k):
        acc = None
        while k:
            if k & 1:
                acc = self.add(acc, pt)
            pt = self.add(pt, pt)
            k >>= 1
        return acc

    def random_point(self):
        p = self.p
        while True:
            x = random.randrange(p)
            y = sqrt_mod((x * x * x + 4) % p, p)
            if y is not None:
                return (x, y)


def point_order_bsgs(cv: Curve, pt):
    """Order of pt via BSGS over the Hasse interval (p small)."""
    p = cv.p
    lo = p + 1 - 2 * isqrt(p) - 1
    hi = p + 1 + 2 * isqrt(p) + 1
    # find some m in [lo, hi] with m*pt = O, then reduce to the exact order
    width = hi - lo
    bs = isqrt(width) + 1
    baby = {}
    q = None  # j*pt
    for j in range(bs):
        key = q  # j * pt
        baby[key if key is None else key[0:2]] = j
        q = cv.add(q, pt)
    giant_step = cv.mul(pt, bs)
    neg_g = None if giant_step is None else (giant_step[0], (-giant_step[1]) % p)
    cur = cv.mul(pt, lo)
    m = None
    for i in range(bs + 2):
        # check lo + i*bs + j == multiple: cur + j*pt == O -> cur == -j*pt
        if cur is None:
            m = lo + i * bs
            break
        negcur = (cur[0], (-cur[1]) % p)
        j = baby.get(negcur)
        if j is not None:
            m = lo + i * bs + j
            break
        cur = cv.add(cur, giant_step)
    if m is None:
        return None
    # exact order divides m: strip prime factors
    n = m
    f = 2
    fs = []
    mm = m
    while f * f <= mm:
        while mm % f == 0:
            fs.append(f)
            mm //= f
        f += 1
    if mm > 1:
        fs.append(mm)
    for f in fs:
        while n % f == 0 and cv.mul(pt, n // f) is None:
            n //= f
    return n


def factor(n):
    fs = {}
    f = 2
    while f * f <= n:
        while n % f == 0:
            fs[f] = fs.get(f, 0) + 1
            n //= f
        f += 1
    if n > 1:
        fs[n] = fs.get(n, 0) + 1
    return fs


def search():
    # p = 1 mod 3, ~2^26
    for p in range((1 << 26) - 1, 1 << 25, -1):
        if p % 3 != 1 or not is_prime(p):
            continue
        cv = Curve(p)
        pt = cv.random_point()
        n = point_order_bsgs(cv, pt)
        if n is None:
            continue
        # group order is a multiple of n within Hasse; take N as the unique
        # multiple of n in the interval (skip ambiguous small-order points)
        lo = p + 1 - 2 * isqrt(p)
        hi = p + 1 + 2 * isqrt(p)
        mults = [m for m in range(((lo + n - 1) // n) * n, hi + 1, n)]
        if len(mults) != 1:
            continue
        big_n = mults[0]
        for r, e in factor(big_n).items():
            if r < (1 << 20) or r.bit_length() > 26:
                continue
            if (r - 1) % (3 * (1 << 12)) != 0:
                continue
            if not is_prime(r):
                continue
            cof = big_n // r
            gen = None
            for _ in range(50):
                g = cv.mul(cv.random_point(), cof)
                if g is not None and cv.mul(g, r) is None:
                    gen = g
                    break
            if gen is None:
                continue
            yield p, r, big_n, cof, gen, cv


def glv_params(p, r, gen, cv):
    # beta: nontrivial cube root of unity mod p; lambda: root of x^2+x+1 mod r
    g = 2
    while pow(g, (p - 1) // 3, p) == 1:
        g += 1
    beta = pow(g, (p - 1) // 3, p)
    # lambda via sqrt(-3) mod r
    s = sqrt_mod((r - 3) % r, r)
    assert s is not None
    lam = (s - 1) * pow(2, -1, r) % r
    # match (beta*x, y) == lambda * (x, y) on the generator; try the 4 pairings
    for b in (beta, beta * beta % p):
        for l in (lam, (r - 1 - lam) % r):
            tx = (b * gen[0] % p, gen[1])
            if cv.mul(gen, l) == tx:
                return b, l
    raise AssertionError("no consistent (beta, lambda) pairing")


def short_basis(r, lam):
    """Two short lattice vectors (x, y) with x + y*lam = 0 mod r (half-GCD)."""
    rows = []
    a, b = r, lam
    ta, tb = 0, 1  # coefficients: a = ... ; invariant b = tb * lam mod r
    while b * b > r:
        q = a // b
        a, b = b, a - q * b
        ta, tb = tb, ta - q * tb
    # now b < sqrt(r): v1 = (b, -tb) satisfies b - tb*lam = a_prev ... verify below
    v1 = (b, -tb)
    # one more step for the second vector
    q = a // b
    a2, tb2 = a - q * b, ta - q * tb
    v2 = (a2, -tb2)
    for (x, y) in (v1, v2):
        assert (x + y * lam) % r == 0, (x, y)
    return v1, v2


def main():
    for p, r, big_n, cof, gen, cv in search():
        two_adicity = 0
        t = r - 1
        while t % 2 == 0:
            t //= 2
            two_adicity += 1
        beta, lam = glv_params(p, r, gen, cv)
        (x1, y1), (x2, y2) = short_basis(r, lam)
        # max |ki| bound ~ max coefficient of the basis
        kbound = max(abs(v) for v in (x1, y1, x2, y2)) * 2
        # multiplicative generator of Fr*
        fr_gen = 2
        while True:
            ok = all(
                pow(fr_gen, (r - 1) // q, r) != 1 for q in factor(r - 1)
            )
            if ok:
                break
            fr_gen += 1
        print(f"p = {p:#x}  ({p.bit_length()} bits, p%3={p%3})")
        print(f"r = {r:#x}  ({r.bit_length()} bits, v2(r-1)={two_adicity})")
        print(f"N = {big_n}, cofactor = {cof}")
        print(f"G1_GEN = ({gen[0]:#x}, {gen[1]:#x})")
        print(f"GLV beta = {beta:#x}, lambda = {lam:#x}")
        print(f"basis v1 = ({x1}, {y1}), v2 = ({x2}, {y2}), |k| bound ~ {kbound}")
        print(f"fr multiplicative generator = {fr_gen}")
        # sanity: endomorphism eigenvalue on a random multiple
        for _ in range(20):
            k = random.randrange(1, r)
            pt = cv.mul(gen, k)
            assert cv.mul(pt, lam) == ((beta * pt[0]) % p, pt[1])
        print("endomorphism check passed")
        return
    print("no curve found", file=sys.stderr)
    sys.exit(1)


if __name__ == "__main__":
    main()
