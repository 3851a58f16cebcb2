import os
import jax, jax.numpy as jnp, numpy as np
import bench
from jwas_tpu.ops.grouped import sweep_blocks_abc_grouped

n, p, block, gbk = 25000, 1048576, 128, 128
bench._sync(jnp.ones((1,)))
gm, y, host, tbv = bench._build_northstar(jax, jnp, n, p, block, gbk, jnp.float32)
p_pad = gm.xpx.shape[0]
dtype = jnp.float32
genvar = 0.001 * p * 0.42
vare = jnp.asarray(genvar, dtype)           # true residual var (h2=0.5)
varg = jnp.asarray(0.5, dtype)
pi0 = jnp.where(gm.valid > 0, 0.999, 1.0).astype(dtype)
alpha = jnp.zeros((p_pad,), dtype); beta = alpha
delta = jnp.where(gm.valid > 0, 1, 0).astype(jnp.int32)
ycorr = y
key = jax.random.PRNGKey(0)
import sys
nreps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
se = int(sys.argv[2]) if len(sys.argv) > 2 else 1
alpha, beta, delta, ycorr = sweep_blocks_abc_grouped(
    gm, alpha, beta, delta, ycorr, None, vare, varg, pi0,
    key, nreps=nreps, sync_every=se,
    host_store=host, use_pallas=True, has_missing=False, prefetch=True)
a = np.asarray(alpha)
print(f"one call nreps={nreps} sync={se}: max|a|={np.abs(a).max():.4g} "
      f"n_incl={(a!=0).sum()} |ycorr|={float(jnp.linalg.norm(ycorr)):.4g}")
