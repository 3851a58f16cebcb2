"""Benchmark: single-trait BayesC marker-effect updates/sec on one chip.

Headline metric matching BASELINE.md: EFFECTIVE marker-effect updates per
second for the blocked (fast_blocks) BayesC sampler, using the reference's
own block-mode accounting (each outer iteration performs nreps=block_size
inner sweeps; chain length is rescaled accordingly, JWAS.jl:293-316).

vs_baseline compares against the reference's BEST published configuration:
blocked BayesC at N=50k, P=2M, L=2000 effective sweeps in 3,449 s on a
64-CPU node (docs/src/manual/benchmark.md:58-62) = 1.16M effective
updates/s. The single-core non-block rate (~15.6k updates/s,
benchmark.md:81-90) is reported on the comment line for context.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# JWAS fast_blocks on a 64-CPU node: 2e6 markers * 2000 effective sweeps / 3449 s
BASELINE_UPDATES_PER_SEC = 2_000_000 * 2_000 / 3_449.0  # ~1.16e6
SINGLE_CORE_NONBLOCK = 15_600.0


def _sync(x) -> float:
    """Force completion of all queued device work.

    On the tunneled TPU platform `jax.block_until_ready` returns immediately
    (buffers report ready before execution finishes), so the only reliable
    barrier is a host fetch of a scalar, which drains the execution queue.
    """
    import jax.numpy as jnp

    return float(jnp.asarray(x).reshape(-1)[0])


def main():
    import jax
    import jax.numpy as jnp

    # The FIRST device->host fetch in a process pays a one-time ~2-4 min
    # channel-setup cost over the tunnel; pay it now so timed fetches are ~30ms.
    _sync(jnp.ones((1,)))

    from jwas_tpu.engine.mcmc import STEngineCfg, make_run_window, _init_accum, STData
    from jwas_tpu.engine.state import ChainState
    from jwas_tpu.ops import markers as mk

    # Size to fit one chip's HBM (v5e 16GB): n=12k x p=98304 (384 blocks of 256, no pad copy) f32 X = 4.7 GB.
    n = int(os.environ.get("BENCH_N", 12_000))
    p = int(os.environ.get("BENCH_P", 98_304))
    block = int(os.environ.get("BENCH_BLOCK", 256))
    nreps = int(os.environ.get("BENCH_NREPS", block))
    n_outer = int(os.environ.get("BENCH_OUTER", 4))
    dtype = jnp.float32

    key = jax.random.PRNGKey(0)
    kf, ke = jax.random.split(key, 2)
    freqs = jax.random.uniform(kf, (p,), minval=0.1, maxval=0.9)

    @jax.jit
    def gen_chunk(k, f):
        k1, k2 = jax.random.split(k)
        cn = f.shape[0]
        raw = (
            (jax.random.uniform(k1, (n, cn)) < f).astype(dtype)
            + (jax.random.uniform(k2, (n, cn)) < f).astype(dtype)
        )
        return raw - 2.0 * f[None, :]  # center with the theoretical mean

    chunk = 16_384
    cols = []
    for c0 in range(0, p, chunk):
        c1 = min(c0 + chunk, p)
        cols.append(gen_chunk(jax.random.fold_in(key, c0), freqs[c0:c1]))
    X = jnp.concatenate(cols, axis=1)
    del cols
    beta_true = jax.random.normal(ke, (p,)) * jnp.where(
        jax.random.uniform(ke, (p,)) < 0.01, 1.0, 0.0
    )
    y = X @ beta_true + jax.random.normal(ke, (n,)) * 1.0
    y = y - jnp.mean(y)
    # Use analytic var(y) to avoid an extra device fetch during setup.
    # var(y) ~= p*0.01*E[beta^2]*E[2pq] + 1; only throughput matters here.
    vary_analytic = 0.01 * p * 0.42 + 1.0

    md = mk.build_marker_blocks(X, block_size=block)
    p_pad = md.X.shape[1]
    K = 1
    W = jnp.ones((n, K), dtype)

    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    sync_every = int(os.environ.get("BENCH_SYNC", min(8, nreps)))
    cfg = STEngineCfg(
        method="BayesC", n_obs=n, n_markers=p, n_loc=K,
        estimate_pi=True, estimate_marker_variance=True, estimate_scale=False,
        estimate_residual_variance=True, use_blocks=True, nreps=nreps,
        sync_every=sync_every,
        re_groups=(), df_residual=4.0, df_marker=4.0, has_weights=False,
        use_pallas=use_pallas and (p // block) % 128 == 0,
        scale_R=vary_analytic * 0.5,
    )
    data = STData(
        W=W, WtRinvW=(W.T @ W), rinv=jnp.ones((n,), dtype), y=y,
        X=md.X, xpx=md.xpx, grams=md.grams, valid=md.valid,
        Vinv=(), vc_scale=(),
        out_geno=jnp.zeros((0, p), dtype), out_W=jnp.zeros((0, K), dtype),
    )
    pi0 = jnp.where(md.valid > 0, 0.95, 1.0).astype(dtype)
    state = ChainState(
        key=jax.random.PRNGKey(42), sol=jnp.zeros((K,), dtype),
        alpha=jnp.zeros((p_pad,), dtype), beta=jnp.zeros((p_pad,), dtype),
        delta=jnp.where(md.valid > 0, 1, 0).astype(jnp.int32),
        gamma_l=jnp.ones((p_pad,), dtype),
        ycorr=y - W @ jnp.zeros((K,), dtype),
        vare=jnp.asarray(vary_analytic * 0.5, dtype),
        varg=jnp.asarray(0.01, dtype),
        pi=pi0,
        scale_g=jnp.asarray(0.005, dtype),
        vc=(),
    )

    run_window = make_run_window(cfg)
    accum = _init_accum(cfg, data, state)

    # warm-up / compile with the same static n_iters as the timed call
    state, accum, _ = run_window(state, data, accum, n_outer, accumulate=True)
    _sync(state.vare)

    t0 = time.perf_counter()
    state, accum, out = run_window(state, data, accum, n_outer, accumulate=True)
    _sync(state.vare)
    dt = time.perf_counter() - t0

    effective_updates = p * nreps * n_outer
    rate = effective_updates / dt
    print(
        json.dumps(
            {
                "metric": "marker_updates_per_sec",
                "value": round(rate, 1),
                "unit": "updates/s",
                "vs_baseline": round(rate / BASELINE_UPDATES_PER_SEC, 2),
            }
        )
    )
    print(
        f"# n={n} p={p} block={block} nreps={nreps} sync={sync_every} "
        f"outer={n_outer} wall={dt:.2f}s sweeps/s={nreps*n_outer/dt:.2f} "
        f"vs_single_core_nonblock={rate/SINGLE_CORE_NONBLOCK:.0f}x "
        f"pallas={use_pallas} device={jax.devices()[0]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
