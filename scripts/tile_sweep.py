"""Sweep the Pallas kernel tile size (KZG_TPU_TILE) for the fused group ops.

Round-5 verdict #10: push mont_mul / g1_add kernels from 0.41/0.47 of SOL
upward. Each tile size runs in a subprocess (the constant is read at module
import). Prints ns/lane for g1_add and mont_mul_fp at 128k lanes per tile.
"""

import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

BODY = r"""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, "/root/repo")
from rust_eth_kzg_tpu.ops import curve as C
from rust_eth_kzg_tpu.ops import field as F
from rust_eth_kzg_tpu.ops import pallas_kernels as PK
from rust_eth_kzg_tpu.utils.timing import sync, timeit

n = 1 << 17
rng = np.random.default_rng(3)
lim = lambda: jnp.asarray(
    rng.integers(0, 1 << 15, size=(F.FP.nlimbs, n)).astype(np.int32)
)
x, y, z = lim(), lim(), lim()
p = C.G1(x, y, z)

@jax.jit
def _chain_add(p):
    q = p
    for _ in range(8):
        q = PK.g1_add(q, p)
    return q

def chain_add():
    return _chain_add(p)

sync(chain_add())
dt = timeit(chain_add, iters=3) / 8
print(f"g1_add: {dt/n*1e9:.1f} ns/lane", flush=True)

@jax.jit
def _chain_mul(x, y):
    a = x
    for _ in range(16):
        a = PK.mont_mul(F.FP, a, y)
    return a

def chain_mul():
    return _chain_mul(x, y)

sync(chain_mul())
dt = timeit(chain_mul, iters=3) / 16
print(f"mont_mul_fp: {dt/n*1e9:.2f} ns/lane", flush=True)
"""


def main():
    tiles = [int(t) for t in os.environ.get("TILES", "256,512,768,1024").split(",")]
    for t in tiles:
        env = dict(os.environ, KZG_TPU_TILE=str(t), KZG_TPU_PALLAS="1")
        print(f"=== tile {t} ===", flush=True)
        proc = subprocess.run(
            [sys.executable, "-c", BODY], env=env, capture_output=True,
            text=True, timeout=1200, cwd=ROOT,
        )
        out = "\n".join(
            ln for ln in (proc.stdout + proc.stderr).splitlines()
            if "ns/lane" in ln or "Error" in ln
        )
        print(out or proc.stderr[-500:], flush=True)


if __name__ == "__main__":
    main()
