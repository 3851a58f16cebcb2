import os, time
os.environ.setdefault("BENCH_GROUP_BLOCKS", "512")
import jax, jax.numpy as jnp, numpy as np
import bench
from jwas_tpu.engine.mcmc import STData, STEngineCfg, _init_accum, make_run_window
from jwas_tpu.engine.state import ChainState

n, p, block = int(os.environ.get("DBG_N", 50_000)), int(os.environ.get("DBG_P", 2_097_152)), 128
gbk = int(os.environ["BENCH_GROUP_BLOCKS"])
bench._sync(jnp.ones((1,)))
gm, y, host, tbv = bench._build_northstar(jax, jnp, n, p, block, gbk, jnp.float32)
if os.environ.get("DBG_F32_GRAMS", "0") == "1":
    from jwas_tpu.ops.grouped import grouped_stats
    grams2, xpx2 = grouped_stats(gm.store, gm.means, gm.valid, None, None,
                                 block, n, host_store=host, exact_bf16=False)
    gm = gm._replace(grams=grams2, xpx=xpx2)
    print("# f32 grams swapped in")
print("tbv finite:", bool(np.isfinite(np.asarray(tbv)).all()),
      "y finite:", bool(np.isfinite(np.asarray(y)).all()),
      "grams finite:", bool(np.isfinite(np.asarray(gm.grams)).all()),
      "xpx finite:", bool(np.isfinite(np.asarray(gm.xpx)).all()))
p_pad = gm.xpx.shape[0]
K = 1
W = jnp.ones((n, K), jnp.float32)
genvar = 0.001 * p * 0.42
va = float(2.0 * genvar)
cfg = STEngineCfg(method="BayesC", n_obs=n, n_markers=p, n_loc=K,
    estimate_pi=True, estimate_marker_variance=True, estimate_scale=False,
    estimate_residual_variance=True, use_blocks=True, nreps=int(os.environ.get("DBG_NREPS", 128)), sync_every=int(os.environ.get("DBG_SYNC", 32)),
    re_groups=(), df_residual=4.0, df_marker=4.0, has_weights=False,
    use_pallas=os.environ.get("DBG_PALLAS","1")=="1", is_packed=True, grouped=True, host_offload=host,
    has_missing_codes=False, prefetch=True, scale_R=va*0.5)
data = STData(W=W, WtRinvW=(W.T @ W), rinv=jnp.ones((n,), jnp.float32), y=y,
    X=jnp.zeros((n, 0), jnp.float32), xpx=gm.xpx, grams=gm.grams,
    valid=gm.valid, Vinv=(), vc_scale=(),
    out_geno=jnp.zeros((0, p), jnp.float32), out_W=jnp.zeros((0, K), jnp.float32),
    packed=gm.store, packed_means=gm.means, row_perm=gm.row_perm)
pi0 = jnp.where(gm.valid > 0, float(os.environ.get("DBG_PI", 0.999)), 1.0).astype(jnp.float32)
state = ChainState(key=jax.random.PRNGKey(42), sol=jnp.zeros((K,), jnp.float32),
    alpha=jnp.zeros((p_pad,), jnp.float32), beta=jnp.zeros((p_pad,), jnp.float32),
    delta=jnp.where(gm.valid > 0, 1, 0).astype(jnp.int32),
    gamma_l=jnp.ones((p_pad,), jnp.float32), ycorr=y,
    vare=jnp.asarray(va*0.5, jnp.float32), varg=jnp.asarray(0.5, jnp.float32),
    pi=pi0, scale_g=jnp.asarray(0.25, jnp.float32), vc=())
run = make_run_window(cfg)
accum = _init_accum(cfg, data, state)
for i in range(4):
    state, accum, _ = run(state, data, accum, 1, accumulate=True)
    a = np.asarray(state.alpha)
    print(f"outer {i}: vare={float(state.vare):.4g} varg={float(state.varg):.4g} "
          f"max|a|={np.abs(a).max():.4g} nan_a={np.isnan(a).sum()} "
          f"ycorr_nan={np.isnan(np.asarray(state.ycorr)).sum()} "
          f"alpha_m_nan={np.isnan(np.asarray(accum.alpha_m)).sum()}")
