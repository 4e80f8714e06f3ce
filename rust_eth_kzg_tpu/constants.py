"""Protocol and curve constants for the TPU-native Ethereum KZG library.

Mirrors the reference constants (see /root/reference/crates/serialization/src/constants.rs:9-65)
but adds the TPU-specific limb-decomposition parameters that every device array shape
derives from.

`KZG_TPU_FIELD=tiny` (read once at import) swaps BLS12-381 for a 26-bit toy
curve y^2 = x^3 + 4 with the same structure (prime-order subgroup, GLV
endomorphism, NTT-friendly scalar field) found by scripts/find_tiny_curve.py.
Every kernel and pipeline is generic over these constants; the tiny field
compiles ~100x faster on XLA:CPU (3 limbs instead of 26), which is what the
multi-chip sharding dryrun and fast CI tiers run. Protocol/serialization
constants are BLS-only and unchanged — the tiny field is for internal
consistency tests, never for spec vectors.
"""

import os

FIELD = os.environ.get("KZG_TPU_FIELD", "bls12_381")

# --- EIP-4844 / EIP-7594 protocol constants (consensus-specs fixed) ---
BYTES_PER_FIELD_ELEMENT = 32
FIELD_ELEMENTS_PER_BLOB = 4096
BYTES_PER_BLOB = BYTES_PER_FIELD_ELEMENT * FIELD_ELEMENTS_PER_BLOB  # 131072
FIELD_ELEMENTS_PER_CELL = 64
BYTES_PER_CELL = BYTES_PER_FIELD_ELEMENT * FIELD_ELEMENTS_PER_CELL  # 2048
EXPANSION_FACTOR = 2
FIELD_ELEMENTS_PER_EXT_BLOB = EXPANSION_FACTOR * FIELD_ELEMENTS_PER_BLOB  # 8192
CELLS_PER_EXT_BLOB = FIELD_ELEMENTS_PER_EXT_BLOB // FIELD_ELEMENTS_PER_CELL  # 128
BYTES_PER_COMMITMENT = 48
BYTES_PER_G1_POINT = 48
BYTES_PER_G2_POINT = 96
RECOMMENDED_PRECOMP_WIDTH = 8

# --- curve constants (BLS12-381, or the `tiny` test curve) ---
# Curve equation y^2 = x^3 + 4 over Fp in both cases
B_COEFF = 4
# BLS parameter z (negative); |z| drives the Miller loop (BLS-only: pairings
# and serialization never run over the tiny field)
BLS_X = 0xD201000000010000
BLS_X_IS_NEGATIVE = True

if FIELD == "tiny":
    # 26-bit toy curve (scripts/find_tiny_curve.py): same j=0 structure
    P = 0x3FF8AA3
    R_SCALAR = 0x1A4001  # prime, r - 1 = 2^14 * 3 * 5 * 7
    TWO_ADICITY = 14
    FR_MULTIPLICATIVE_GENERATOR = 17
    G1_GEN_X = 0x205826E
    G1_GEN_Y = 0x2BF8A9
    # GLV endomorphism (x, y) -> (beta x, y) == lambda * (x, y)
    GLV_BETA = 0x457C81
    GLV_LAMBDA = 0x2B7FB
    # short lattice basis for scalar decomposition (x + y*lambda = 0 mod r)
    GLV_BASIS = (280, -1149, 29, 6025)
    GLV_NBITS = 16  # |k_i| <~ 12050 < 2^15; even, for width-2 digit windows
else:
    # Base field modulus p (381 bits)
    P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
    # Scalar field modulus r (255 bits)
    R_SCALAR = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
    TWO_ADICITY = 32
    FR_MULTIPLICATIVE_GENERATOR = 7
    # G1 generator (affine)
    G1_GEN_X = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
    G1_GEN_Y = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1
    # GLV: phi(x, y) = (beta x, y) acts as multiplication by lambda = z^2 - 1
    GLV_BETA = 0x1A0111EA397FE699EC02408663D4DE85AA0D857D89759AD4897D29650FB85F9B409427EB4F49FFFD8BFD00000000AAAC
    GLV_LAMBDA = 0xAC45A4010001A40200000000FFFFFFFF
    # basis rows (lambda, -1), (1, z^2): det = lambda z^2 + 1 = r
    GLV_BASIS = (GLV_LAMBDA, -1, 1, BLS_X**2)
    GLV_NBITS = 130

# Primitive 2^TWO_ADICITY-th root of unity in Fr
ROOT_OF_UNITY = pow(FR_MULTIPLICATIVE_GENERATOR, (R_SCALAR - 1) >> TWO_ADICITY, R_SCALAR)
# G2 generator (affine, Fp2 coordinates as (c0, c1))
G2_GEN_X = (
    0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8,
    0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E,
)
G2_GEN_Y = (
    0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801,
    0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE,
)

# --- Fiat-Shamir domain separators (consensus-specs) ---
FIAT_SHAMIR_PROTOCOL_DOMAIN = b"FSBLOBVERIFY_V1_"
RANDOM_CHALLENGE_KZG_BATCH_DOMAIN = b"RCKZGBATCH___V1_"
RANDOM_CHALLENGE_KZG_CELL_BATCH_DOMAIN = b"RCKZGCBATCH__V1_"

# --- TPU limb decomposition ---
# 15-bit limbs in int32 lanes: products of normalized limbs fit in 2^30 (signed-safe),
# and the CIOS accumulator never exceeds ~2^22 per lane between carry propagations.
LIMB_BITS = 15
LIMB_MASK = (1 << LIMB_BITS) - 1
if FIELD == "tiny":
    # one spare limb of headroom keeps the CIOS bound p + (8p)^2/2^45 << 2p
    FR_LIMBS = 3
    FP_LIMBS = 3
    SCALAR_BITS = 24
else:
    # Fr: values kept in [0, 2r) (lazy Montgomery), 2r < 2^256 <= 2^(15*18)
    FR_LIMBS = 18
    # Fp: values kept in [0, 2p), 2p < 2^382 <= 2^(15*26)
    FP_LIMBS = 26
    # canonical scalars are < 2^255; one headroom bit for Booth windows
    SCALAR_BITS = 256
