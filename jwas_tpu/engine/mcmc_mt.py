"""Multi-trait MCMC engine (under construction this round)."""

from __future__ import annotations


def run_mcmc_mt(model, df, opts, dtype):
    raise NotImplementedError(
        "multi-trait MCMC is being built; single-trait models are fully supported"
    )
