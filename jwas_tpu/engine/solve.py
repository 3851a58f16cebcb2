"""Non-MCMC solution of the mixed-model equations.

Equivalent of the reference `solve` (src/1.JWAS/src/iterative_solver/solver.jl:7-54):
builds the MME for the (marker-free) model and solves it with Jacobi,
Gauss-Seidel, or a multi-pass Gibbs sampler.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from jwas_tpu.engine.setup import MCMCOptions, prepare_workspace
from jwas_tpu.models.model import Model
from jwas_tpu.ops.location import gauss_seidel, gibbs_solver, jacobi


def solve(
    model: Model,
    df: pd.DataFrame,
    *,
    solver: str = "default",
    printout_frequency: int = 100,
    tolerance: float = 1e-6,
    maxiter: int = 5000,
    heterogeneous_residuals: bool = False,
    double_precision: bool = False,
):
    """Solve the MME without estimating variance components.

    Returns a DataFrame [name, estimate] for iterative solvers, or the tuple
    (names, X, LHS, RHS) for solver="default".
    """
    opts = MCMCOptions(
        heterogeneous_residuals=heterogeneous_residuals,
        double_precision=double_precision,
        outputEBV=False,
        output_heritability=False,
        output_folder="",
    )
    ws = prepare_workspace(model, df, opts)
    W = ws.W
    rinv = ws.rinv if ws.rinv is not None else np.ones(ws.n_obs * ws.n_traits)
    if ws.n_traits == 1:
        LHS = (W * rinv[:, None]).T @ W
        RHS = W.T @ (rinv * ws.y)
    else:
        # W' (Ri x I_n) W assembled per trait-block pair — NEVER materializes
        # the (n t, n t) kron, so the MME scales to the reference's sparse
        # solver sizes (solver.jl:7-54): LHS[k,l] = sum_{s,u} Ri[s,u]
        # (W_s' W_u)[k,l] with W_s = the trait-s row block of W.
        import scipy.sparse as sp

        t_, n_ = ws.n_traits, ws.n_obs
        Ri = np.linalg.inv(ws.vare0)
        Wb = [sp.csr_matrix(W[s * n_ : (s + 1) * n_]) for s in range(t_)]
        yb = ws.y.reshape(t_, n_)
        K = W.shape[1]
        LHS = np.zeros((K, K))
        RHS = np.zeros(K)
        for s in range(t_):
            for u in range(t_):
                if Ri[s, u] == 0.0:
                    continue
                LHS += Ri[s, u] * np.asarray((Wb[s].T @ Wb[u]).todense())
                RHS += Ri[s, u] * (Wb[s].T @ yb[u])

    # random-effect parts (addVinv): lambda version for single trait
    for grp in ws.re_groups:
        Gi = np.linalg.inv(grp.G0)
        q = grp.n_levels
        for i, si in enumerate(grp.starts):
            for j, sj in enumerate(grp.starts):
                lam = Gi[i, j] * (float(ws.vare0) if ws.n_traits == 1 else 1.0)
                block = grp.Vinv if grp.Vinv is not None else np.eye(q)
                LHS[si : si + q, sj : sj + q] += block * lam

    names = model.term_names()
    if solver == "default":
        print("To solve the equations, please choose a solver: "
              "'Jacobi', 'Gauss-Seidel', or 'Gibbs'.")
        return names, W, LHS, RHS
    if solver == "Jacobi":
        x = jacobi(LHS, RHS, tolerance=tolerance, maxiter=maxiter)
    elif solver == "Gauss-Seidel":
        x = gauss_seidel(LHS, RHS, tolerance=tolerance, maxiter=maxiter)
    elif solver == "Gibbs":
        vare = float(ws.vare0) if ws.n_traits == 1 else None
        x = np.asarray(gibbs_solver(LHS, RHS, vare=vare, niter=maxiter))
    else:
        raise ValueError("solver must be 'default', 'Jacobi', 'Gauss-Seidel', or 'Gibbs'")
    return pd.DataFrame({"Name": names, "Estimate": np.asarray(x)})
