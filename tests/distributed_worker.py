"""Worker for the REAL 2-process jax.distributed test (run by
tests/test_distributed.py::test_two_process_distributed_grams).

Each process: brings up jax.distributed against a localhost coordinator,
builds the global marker-sharded packed markers (loading ONLY its own
addressable byte ranges via load_packed_global), verifies its local Gram
shards against a dense recomputation, and runs one jitted computation over
the GLOBAL sharded array (a cross-process reduction through XLA's CPU
collectives). Results land in a per-process JSON for the parent to assert.

Usage: python distributed_worker.py <port> <process_id> <store_path> <out_json>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

port, pid_s, store_path, out_json = sys.argv[1:5]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    ).strip()
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from jwas_tpu.parallel.distributed import (  # noqa: E402
    build_packed_markers_multihost,
    initialize_multihost,
)

res = {"process_id": int(pid_s)}

ok = initialize_multihost(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=int(pid_s),
)
res["initialized"] = bool(ok)
res["process_count"] = jax.process_count()
res["n_devices_global"] = len(jax.devices())
res["n_devices_local"] = len(jax.local_devices())

from jax.sharding import Mesh  # noqa: E402

mesh = Mesh(np.array(jax.devices()), ("marker",))
B = 8
pm, n, p = build_packed_markers_multihost(store_path, mesh, block_size=B)

# dense reference for the LOCAL shards only (each process re-derives truth
# for the rows it owns; the .j2b memmap read in load_packed_global is the
# code under test)
from jwas_tpu.io.packed import Packed2BitStore  # noqa: E402

store = Packed2BitStore.load(store_path)
dense = store.decode(np.arange(store.n_markers))   # (n, p) centered f32
p_pad = pm.xpx.shape[0]
Xp = np.zeros((n, p_pad), np.float32)
Xp[:, :p] = dense

max_gram_err = 0.0
max_xpx_err = 0.0
n_shards_checked = 0
for sh in pm.grams.addressable_shards:
    sl = sh.index[2]                    # grams sharded P(None, None, marker)
    b0 = sl.start or 0
    b1 = sl.stop
    got = np.asarray(sh.data)           # (B, B, local_blocks)
    for i, blk in enumerate(range(b0, b1)):
        Xb = Xp[:, blk * B : (blk + 1) * B]
        exp = (Xb.T @ Xb).T             # j-major == transpose (symmetric)
        max_gram_err = max(max_gram_err, float(np.abs(got[:, :, i] - exp).max()))
    n_shards_checked += 1
for sh in pm.xpx.addressable_shards:
    sl = sh.index[0]
    j0 = sl.start or 0
    j1 = sl.stop
    exp = np.einsum("np,np->p", Xp[:, j0:j1], Xp[:, j0:j1])
    exp = np.where(np.arange(j0, j1) < p, np.maximum(exp, 1e-10), 1.0)
    max_xpx_err = max(max_xpx_err, float(np.abs(np.asarray(sh.data) - exp).max()))

res["n_shards_checked"] = n_shards_checked
res["max_gram_err"] = max_gram_err
res["max_xpx_err"] = max_xpx_err

# a jitted reduction over the GLOBAL sharded xpx: crosses the process
# boundary through XLA's CPU collectives; every process gets the same total
try:
    tot = jax.jit(lambda v, x: jnp.sum(jnp.where(v > 0, x, 0.0)))(
        pm.valid, pm.xpx
    )
    res["xpx_total"] = float(tot)
except Exception as e:  # pragma: no cover - backend-dependent
    res["xpx_total_error"] = f"{type(e).__name__}: {e}"

with open(out_json, "w") as f:
    json.dump(res, f)
