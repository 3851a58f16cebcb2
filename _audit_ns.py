import os
import jax, jax.numpy as jnp, numpy as np
import bench
from jwas_tpu.ops.grouped import (grouped_stats, _tile_rhs_planes,
    _tile_matvec_planes, _pad_w, _sub_chunk_planes, _stage)
from jwas_tpu.ops.packed import decode_tile

n, p, block, gbk = 25000, 1048576, 128, 128
bench._sync(jnp.ones((1,)))
gm, y, host, tbv = bench._build_northstar(jax, jnp, n, p, block, gbk, jnp.float32)
ngroups, G, bpm = gm.store.shape
print("store", gm.store.shape, "host:", host)

# pull group 0 to device, decode a slice densely, and audit
g = 0
rows = jax.device_put(np.asarray(gm.store[g]))          # (G, bpm) via host
mns = gm.means[g*G:(g+1)*G]
# dense decode of the first 2 blocks (256 markers)
k = 256
Xd = decode_tile(rows[:k], mns[:k], None, jnp.float32, n_obs=n)   # (n, 256)
Xd = np.asarray(Xd)
# 1) gram tile check: block 0 gram = X0'X0
G0 = Xd[:, :block].T @ Xd[:, :block]
g_tile = np.asarray(gm.grams[:, :, 0])       # j-major [j, r, blk]: gram[j, r] =? X'X[j, r]
err_g = np.abs(g_tile - G0).max() / np.abs(G0).max()
print("gram block0 rel err:", err_g)
# 2) xpx check
err_x = np.abs(np.asarray(gm.xpx[:k]) - (Xd**2).sum(0)).max() / (Xd**2).sum(0).max()
print("xpx rel err:", err_x)
# 3) plane rhs vs dense
w = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (n,)))
sc = _sub_chunk_planes(G, block, bpm)
w_pad = _pad_w(jnp.asarray(w), bpm, None)
rhs_pl = np.asarray(_tile_rhs_planes(rows, mns, w_pad, sc, False))[:k]
rhs_d = Xd.T @ w
print("plane rhs rel err:", np.abs(rhs_pl - rhs_d).max() / np.abs(rhs_d).max())
# 4) plane matvec vs dense
v = np.zeros(G, np.float32); v[:k] = np.asarray(jax.random.normal(jax.random.PRNGKey(6), (k,)))
mv_pl = np.asarray(_tile_matvec_planes(rows, mns, jnp.asarray(v), n, None, sc, False))
mv_d = Xd @ v[:k]
print("plane matvec rel err:", np.abs(mv_pl - mv_d).max() / np.abs(mv_d).max())
