"""Console progress + profiling hooks for the MCMC drivers.

Equivalent of the reference's `printout_frequency` posterior printouts and
progress meter (reference: src/1.JWAS/src/MCMC/MCMC_BayesianAlphabet.jl:184,
417-420), plus an opt-in `jax.profiler` trace — the tracing/profiling aux
subsystem SURVEY.md §5 calls for.
"""

from __future__ import annotations

import contextlib
import os
import time

import numpy as np


class ProgressPrinter:
    """Posterior printouts every `every` iterations + wall-clock per window."""

    def __init__(self, every: int, chain_length: int, n_traits: int = 1):
        self.every = int(every or 0)
        self.chain_length = chain_length
        self.n_traits = n_traits
        self.last_epoch = 0
        self.t_start = time.perf_counter()
        self.t_last = self.t_start

    def update(self, iters_done: int, *, vare, varg=None, pi=None) -> None:
        if self.every <= 0:
            return
        epoch = iters_done // self.every
        if epoch <= self.last_epoch and iters_done < self.chain_length:
            return
        self.last_epoch = epoch
        now = time.perf_counter()
        window_s = now - self.t_last
        self.t_last = now
        parts = [f"iteration {iters_done}/{self.chain_length}"]
        v = np.asarray(vare)
        if v.ndim == 2:
            parts.append("residual covariance diag: "
                         + np.array2string(np.diagonal(v), precision=3))
        else:
            parts.append(f"residual variance: {float(v):.6g}")
        if varg is not None:
            g = np.asarray(varg)
            if g.ndim >= 2:
                parts.append("marker variance diag: "
                             + np.array2string(
                                 np.diagonal(g) if g.ndim == 2 else g.mean(axis=0).diagonal(),
                                 precision=4))
            elif g.ndim == 1:
                parts.append(f"marker variance (mean): {float(g.mean()):.6g}")
            else:
                parts.append(f"marker variance: {float(g):.6g}")
        if pi is not None:
            p = np.asarray(pi)
            if p.ndim == 1 and 0 < p.shape[0] <= 8:
                parts.append("pi: " + np.array2string(p, precision=3))
            elif p.ndim >= 1 and p.size:
                parts.append(f"pi (mean): {float(p.mean()):.3f}")
        parts.append(f"[{window_s:.2f}s window, "
                     f"{now - self.t_start:.1f}s total]")
        print("  ".join(parts), flush=True)


@contextlib.contextmanager
def maybe_profile(opts):
    """Opt-in jax.profiler trace of the sampling loop (opts.profile=True);
    the trace lands under <output_folder>/profile for xprof/tensorboard."""
    if not getattr(opts, "profile", False):
        yield None
        return
    import jax

    folder = os.path.join(opts.output_folder or "results", "profile")
    os.makedirs(folder, exist_ok=True)
    jax.profiler.start_trace(folder)
    try:
        yield folder
    finally:
        jax.profiler.stop_trace()
        print(f"jax profiler trace written to {folder}", flush=True)
