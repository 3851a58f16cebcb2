"""Kernel-efficiency evidence: XLA scan vs per-step-DMA Pallas vs
resident-Gram Pallas on the fast-blocks inner rounds.

Round 3 measured the per-step-DMA kernel at ~20% of its own bandwidth
bound; round 4 built the resident-Gram variants on the thesis that the
per-step DMA/semaphore overhead dominates (ops/pallas_sweep.py:30-37).
This script measures all three implementations of the SAME inner-round
computation at the shapes the engine actually dispatches:

- (b=32,  nblocks=128)  — one group of the packed-device mode (p=1M)
- (b=128, nblocks=128)  — one group of the north-star mode (N=50k, P=2M)
- (b=32,  nblocks=4096) — a wide flat call (per-grid-cell pipelining)

Per inner rep every block must read its full (b, b) Gram tile once, so the
bandwidth bound is bytes = 4 * nreps * b^2 * nblocks and speed-of-light
time = bytes / HBM_BW (v5e: 819 GB/s). The resident kernel eliminates the
per-step row DMA by holding the whole lane-group tile in VMEM — its traffic
drops to ONE tile read per call, so at large nreps it can exceed the
per-step bound (reported against the same per-step-traffic yardstick).

Run:  python benchmarks/kernel_efficiency.py     (real TPU)
Committed results: benchmarks/results/kernel_efficiency_r05.md
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_BW = 819e9   # v5e


def bench_case(jax, jnp, b, nblocks, nreps, iters=20):
    import jwas_tpu.ops.pallas_sweep as ps
    from jwas_tpu.ops import markers as mk

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    dtype = jnp.float32
    grams = jax.random.normal(ks[0], (b, b, nblocks), dtype) * 0.1
    grams = grams + jnp.eye(b, dtype=dtype)[:, :, None] * 3.0
    xpx = jnp.abs(jax.random.normal(ks[1], (b, nblocks), dtype)) + 3.0
    var_eff = jnp.full((b, nblocks), 0.01, dtype)
    log_pi = jnp.full((b, nblocks), jnp.log(0.95), dtype)
    log_pi_c = jnp.full((b, nblocks), jnp.log(0.05), dtype)
    alpha = jnp.zeros((b, nblocks), dtype)
    beta = jnp.zeros((b, nblocks), dtype)
    delta = jnp.ones((b, nblocks), jnp.int32)
    rhs0 = jax.random.normal(ks[2], (b, nblocks), dtype)
    us = jax.random.uniform(ks[3], (nreps * b, nblocks), dtype)
    zs = jax.random.normal(ks[4], (nreps * b, nblocks), dtype)
    inv_vare = 0.5

    def run_xla():
        def step(c, inp):
            a_g, be_g, d_g, rhs_g = c
            j, u, z = inp
            a_j = a_g[j]
            a_new, b_new, d_new = mk._abc_update(
                rhs_g[j], a_j, xpx[j], inv_vare, var_eff[j],
                log_pi[j], log_pi_c[j], u, z,
            )
            rhs_g = rhs_g + (a_j - a_new)[None, :] * grams[j]
            return (a_g.at[j].set(a_new), be_g.at[j].set(b_new),
                    d_g.at[j].set(d_new), rhs_g)

        return mk._blocked_round(
            None, step, (alpha, beta, delta.astype(dtype), rhs0), (us, zs),
            nreps, b,
        )

    def run_pallas():
        return ps.abc_inner_rounds_pallas(
            grams, xpx, var_eff, log_pi, log_pi_c,
            alpha, beta, delta, rhs0, us, zs, inv_vare, nreps=nreps,
        )

    results = {}
    orig_pick = ps._pick_resident_lanes
    for name, fn, force_dma in (
        ("xla_scan", run_xla, False),
        ("pallas_dma", run_pallas, True),
        ("pallas_resident", run_pallas, False),
    ):
        if force_dma:
            ps._pick_resident_lanes = lambda *a, **k: 0
        else:
            ps._pick_resident_lanes = orig_pick
        if name == "pallas_resident" and orig_pick(nblocks, b) == 0:
            results[name] = None
            continue
        try:
            f = jax.jit(fn)
            out = f()
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f()
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            results[name] = dt
        except Exception as e:  # noqa: BLE001
            print(f"# {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            results[name] = None
        finally:
            ps._pick_resident_lanes = orig_pick

    bytes_per_call = 4.0 * nreps * b * b * nblocks
    bound_s = bytes_per_call / HBM_BW
    row = {"b": b, "nblocks": nblocks, "nreps": nreps,
           "bound_us": round(bound_s * 1e6, 1)}
    for name, dt in results.items():
        if dt is None:
            row[name] = None
            continue
        row[name] = {
            "us": round(dt * 1e6, 1),
            "pct_of_bound": round(100.0 * bound_s / dt, 1),
            "updates_per_s": round(b * nblocks * nreps / dt / 1e6, 1),
        }
    return row


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    rows = []
    for b, nblocks, nreps in ((32, 128, 32), (128, 128, 128),
                              (32, 4096, 32)):
        r = bench_case(jax, jnp, b, nblocks, nreps)
        rows.append(r)
        print(json.dumps(r), flush=True)
    print("\n| shape (b x nblocks, nreps) | bound | XLA scan | Pallas "
          "per-step DMA | Pallas resident |")
    print("|---|---|---|---|---|")
    for r in rows:
        def cell(k):
            v = r.get(k)
            if not v:
                return "-"
            return (f"{v['us']}us ({v['pct_of_bound']}% of bound, "
                    f"{v['updates_per_s']}M upd/s)")
        print(f"| {r['b']}x{r['nblocks']}, {r['nreps']} | {r['bound_us']}us "
              f"| {cell('xla_scan')} | {cell('pallas_dma')} | "
              f"{cell('pallas_resident')} |")
