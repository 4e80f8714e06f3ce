"""Raw VPU op-rate microbenchmarks: int32 vs f32 multiply, and gather."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

N = 1 << 22  # 4M lanes

def t(fn, *a, iters=20):
    o = fn(*a); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(iters):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.time() - t0) / iters

x32 = jnp.arange(N, dtype=jnp.int32) | 1
y32 = x32[::-1]
xf = x32.astype(jnp.float32)
yf = y32.astype(jnp.float32)

@jax.jit
def mul_i32_chain(x, y):
    acc = x
    for _ in range(64):
        acc = acc * y + x   # int mul + add
    return acc

@jax.jit
def mul_f32_chain(x, y):
    acc = x
    for _ in range(64):
        acc = acc * y + x   # fused multiply-add
    return acc

@jax.jit
def shift_mask_chain(x, y):
    acc = x
    for _ in range(64):
        acc = ((acc >> 15) & 32767) + y
    return acc

dt = t(mul_i32_chain, x32, y32)
print(f"int32 mul+add: {64*N/dt/1e12:.3f} T op/s")
dt = t(mul_f32_chain, xf, yf)
print(f"f32 fma:       {64*N/dt/1e12:.3f} T op/s")
dt = t(shift_mask_chain, x32, y32)
print(f"shift+mask+add:{64*N/dt/1e12:.3f} T op/s")

# gather pattern like the MSM window fetch: table [P=8192, D=128] int32,
# per-lane index into D
table = jnp.arange(8192*128, dtype=jnp.int32).reshape(8192, 128)
idx = (x32[: 8192 * 33 // 1] % 128).reshape(33, 8192)  # 33 windows x 8192 pts

@jax.jit
def gather(table, idx):
    return jnp.take_along_axis(table[None], idx[..., None], axis=-1)[..., 0]

dt = t(gather, table, idx)
print(f"gather: {33*8192/dt/1e9:.2f} G lookups/s ({dt*1e6:.0f} us)")
