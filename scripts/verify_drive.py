import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import yaml, time
from pathlib import Path
from rust_eth_kzg_tpu.api import DASContext

t0 = time.time()
ctx = DASContext(use_precomp=4)
print(f"init {time.time()-t0:.1f}s; backend={jax.default_backend()}", flush=True)

case = Path("/root/reference/test_vectors/compute_cells_and_kzg_proofs/kzg-mainnet")
d = yaml.safe_load(open(sorted(case.glob("*/data.yaml"))[-1]))
blob = bytes.fromhex(d["input"]["blob"][2:])
t0 = time.time()
commitment = ctx.blob_to_kzg_commitment(blob)
cells, proofs = ctx.compute_cells_and_kzg_proofs(blob)
print(f"prove {time.time()-t0:.1f}s", flush=True)
want_cells, want_proofs = d["output"]
assert [c.hex() for c in cells] == [w[2:] for w in want_cells], "cells mismatch"
assert [p.hex() for p in proofs] == [w[2:] for w in want_proofs], "proofs mismatch"
print("cells+proofs match consensus fixture", flush=True)

t0 = time.time()
ctx.verify_cell_kzg_proof_batch([commitment]*4, [0,1,2,3], list(cells[:4]), list(proofs[:4]))
print(f"verify ok {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
ctx.verify_cell_kzg_proof_batch(
    [commitment] * 128, list(range(128)), list(cells), list(proofs)
)
print(f"verify-128 ok {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
rcells, rproofs = ctx.recover_cells_and_kzg_proofs(
    list(range(64)), list(cells[:64])
)
assert list(rcells) == list(cells) and list(rproofs) == list(proofs), (
    "recovered cells/proofs do not match the originals"
)
print(f"recover ok {time.time()-t0:.1f}s", flush=True)

from rust_eth_kzg_tpu.errors import Error
for desc, fn in [
    ("short blob", lambda: ctx.blob_to_kzg_commitment(b"\0"*100)),
    ("bad scalar", lambda: ctx.compute_kzg_proof(blob, b"\xff"*32)),
    ("unsorted indices", lambda: ctx.recover_cells_and_kzg_proofs([1,0], list(cells[:2]))),
    ("bad proof point", lambda: ctx.verify_cell_kzg_proof_batch([commitment],[0],[cells[0]],[b"\x01"*48])),
]:
    try:
        fn()
        print(f"FAIL: {desc} did not raise", flush=True)
    except Error as e:
        print(f"ok: {desc} -> {type(e).__name__}", flush=True)
print("VERIFY DRIVE PASSED", flush=True)
