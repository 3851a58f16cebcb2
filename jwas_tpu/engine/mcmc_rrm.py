"""Random-regression-model (RRM) MCMC engine for longitudinal traits.

From-scratch JAX re-design of the reference RRM driver (reference:
src/1.JWAS/src/RRM/MCMC_BayesianAlphabet_RRM.jl):

- long-format data (ID, time, y) mapped onto a dense (ntimes, nind) grid with
  unobserved cells pinned at zero (matrix_yfull_to_yobs, RRM.jl:12-20);
- per-iteration sequence: location Gibbs on the observation vector ->
  scatter to the grid -> joint per-marker update of the nCoeff Legendre
  regression coefficients over 2^c inclusion labels -> gather back ->
  pi Dirichlet over labels -> scalar residual variance -> inverse-Wishart
  c x c marker-coefficient covariance;
- EBVs: per-coefficient (X alpha_c) and the full breeding-value trajectory
  U = Phi (alpha X')' per individual and time point.

Usage: runMCMC(model, df, RRM=Phi) with Phi from
jwas_tpu.ops.rrm.generate_full_phi(df["time"], ncoeff).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from jwas_tpu.engine.state import REGroupCfg
from jwas_tpu.models.design import build_design
from jwas_tpu.ops.dists import sample_inv_wishart, sample_variance
from jwas_tpu.ops.location import gibbs_pass_lambda
from jwas_tpu.ops.rrm import build_m_phiphi, sweep_rrm_abc, _labels


class RRMData(NamedTuple):
    W: jnp.ndarray           # (n_obs, K) location design
    WtW: jnp.ndarray         # (K, K)
    y: jnp.ndarray           # (n_obs,)
    X: jnp.ndarray           # (nind, p) centered genotypes
    phi: jnp.ndarray         # (ntimes, c)
    mphiphi: jnp.ndarray     # (p, c, c)
    obs_mask: jnp.ndarray    # (ntimes, nind)
    time_idx: jnp.ndarray    # (n_obs,) int32
    ind_idx: jnp.ndarray     # (n_obs,) int32
    Vinv: Tuple[jnp.ndarray, ...] = ()       # per RE group (q, q); (0,0) = I
    vc_scale: Tuple[jnp.ndarray, ...] = ()   # per RE group (k, k)


@dataclass(frozen=True)
class RRMCfg:
    method: str
    n_obs: int
    n_markers: int
    ncoeff: int
    estimate_pi: bool
    estimate_marker_variance: bool
    estimate_residual_variance: bool
    df_residual: float
    df_marker: float
    scale_R: float
    re_groups: Tuple[REGroupCfg, ...] = ()   # iid/V/pedigree random effects
                                             # (MCMC_BayesianAlphabet_RRM.jl:41,159)


class RRMState(NamedTuple):
    key: jnp.ndarray
    sol: jnp.ndarray         # (K,)
    alpha: jnp.ndarray       # (c, p)
    beta: jnp.ndarray        # (c, p)
    delta: jnp.ndarray       # (c, p)
    ycorr: jnp.ndarray       # (n_obs,)
    vare: jnp.ndarray
    varg: jnp.ndarray        # (c, c)
    pi: jnp.ndarray          # (2^c,)
    marker_scale: jnp.ndarray  # (c, c) prior scale
    vc: Tuple[jnp.ndarray, ...] = ()   # per RE group (k, k) covariance G0


def make_rrm_step(cfg: RRMCfg):
    c = cfg.ncoeff
    L = 2**c

    def step(state: RRMState, data: RRMData) -> RRMState:
        keys = jax.random.split(state.key, 6 + len(cfg.re_groups))
        key, k_loc, k_mark, k_pi, k_res, k_var = keys[:6]
        k_vc = keys[6:]
        dtype = state.ycorr.dtype

        # 1. location parameters (lambda-MME Gibbs with Vinv x Gi random-
        # effect blocks; MCMC_BayesianAlphabet_RRM.jl:106-116 + addVinv)
        from jwas_tpu.engine.mcmc import assemble_lhs_lambda

        LHS = assemble_lhs_lambda(cfg.re_groups, data.WtW, data.Vinv,
                                  state.vc, state.vare)
        ycorr = state.ycorr + data.W @ state.sol
        rhs = data.W.T @ ycorr
        sol = gibbs_pass_lambda(LHS, state.sol, rhs, state.vare, k_loc)
        ycorr = ycorr - data.W @ sol

        # 2. markers on the (ntimes, nind) grid (:123-144)
        Wgrid = jnp.zeros(data.obs_mask.shape, dtype).at[
            data.time_idx, data.ind_idx
        ].set(ycorr)
        Ginv = jnp.linalg.inv(state.varg)
        log_pi = jnp.log(jnp.clip(state.pi, 1e-30, 1.0))
        alpha, beta, delta, Wgrid = sweep_rrm_abc(
            data.X, data.phi, data.mphiphi, data.obs_mask,
            state.alpha, state.beta, state.delta, Wgrid,
            state.vare, Ginv, log_pi, k_mark,
            estimate_delta=cfg.method in ("BayesC", "BayesB"),
        )
        ycorr = Wgrid[data.time_idx, data.ind_idx]

        # 2b. pi over the 2^c labels (samplePi dict variant, Pi.jl:20-42)
        pi = state.pi
        if cfg.estimate_pi:
            idx = jnp.sum(
                delta.astype(jnp.int32)
                * (2 ** jnp.arange(c, dtype=jnp.int32))[:, None],
                axis=0,
            )
            counts = jnp.zeros((L,), jnp.float32).at[idx].add(1.0)
            pi = jax.random.dirichlet(k_pi, counts + 1.0).astype(dtype)

        # 2.1 random-effect covariance components (sampleVCs + addVinv,
        # MCMC_BayesianAlphabet_RRM.jl:159-161)
        vc = list(state.vc)
        for g_, grp in enumerate(cfg.re_groups):
            q = grp.n_levels
            sols = jnp.stack(
                [jax.lax.dynamic_slice(sol, (s_,), (q,)) for s_ in grp.starts]
            )
            S = sols @ (data.Vinv[g_] @ sols.T) if grp.has_vinv else sols @ sols.T
            S = 0.5 * (S + S.T)
            vc[g_] = sample_inv_wishart(
                k_vc[g_], grp.df + q, data.vc_scale[g_] + S
            ).astype(dtype)
        vc = tuple(vc)

        # 3. residual variance (:165-166)
        vare = state.vare
        if cfg.estimate_residual_variance:
            vare = sample_variance(
                k_res, ycorr, cfg.n_obs, cfg.df_residual, cfg.scale_R
            ).astype(dtype)

        # 4. marker-coefficient covariance (IW over c x c; :171-178)
        varg = state.varg
        if cfg.estimate_marker_variance:
            dat = beta if cfg.method in ("BayesC", "BayesB") else alpha
            SSE = dat @ dat.T
            varg = sample_inv_wishart(
                k_var, cfg.df_marker + cfg.n_markers, state.marker_scale + SSE
            ).astype(dtype)

        return RRMState(
            key=key, sol=sol, alpha=alpha, beta=beta, delta=delta, ycorr=ycorr,
            vare=vare, varg=varg, pi=pi, marker_scale=state.marker_scale,
            vc=vc,
        )

    return step


class RRMAccum(NamedTuple):
    n: jnp.ndarray
    sol_m: jnp.ndarray
    sol_m2: jnp.ndarray
    alpha_m: jnp.ndarray
    alpha_m2: jnp.ndarray
    delta_m: jnp.ndarray
    vare_m: jnp.ndarray
    vare_m2: jnp.ndarray
    varg_m: jnp.ndarray
    varg_m2: jnp.ndarray
    pi_m: jnp.ndarray
    pi_m2: jnp.ndarray
    u_m: jnp.ndarray          # (ntimes, nind) BV trajectory
    u_m2: jnp.ndarray
    vc_m: Tuple[jnp.ndarray, ...] = ()
    vc_m2: Tuple[jnp.ndarray, ...] = ()


def _welford(m, x, n):
    return m + (x - m) / n


def make_rrm_run_window(cfg: RRMCfg):
    step = make_rrm_step(cfg)

    @partial(jax.jit, static_argnames=("n_iters", "accumulate"))
    def run_window(state, data: RRMData, accum: RRMAccum, n_iters: int,
                   accumulate: bool = True):
        def body(s, _):
            return step(s, data), None

        state, _ = jax.lax.scan(body, state, None, length=n_iters)
        if accumulate:
            u = data.phi @ (state.alpha @ data.X.T)        # (ntimes, nind)
            n = accum.n + 1.0
            accum = RRMAccum(
                n=n,
                sol_m=_welford(accum.sol_m, state.sol, n),
                sol_m2=_welford(accum.sol_m2, state.sol**2, n),
                alpha_m=_welford(accum.alpha_m, state.alpha, n),
                alpha_m2=_welford(accum.alpha_m2, state.alpha**2, n),
                delta_m=_welford(accum.delta_m, state.delta, n),
                vare_m=_welford(accum.vare_m, state.vare, n),
                vare_m2=_welford(accum.vare_m2, state.vare**2, n),
                varg_m=_welford(accum.varg_m, state.varg, n),
                varg_m2=_welford(accum.varg_m2, state.varg**2, n),
                pi_m=_welford(accum.pi_m, state.pi, n),
                pi_m2=_welford(accum.pi_m2, state.pi**2, n),
                u_m=_welford(accum.u_m, u, n),
                u_m2=_welford(accum.u_m2, u**2, n),
                vc_m=tuple(_welford(m, v, n)
                           for m, v in zip(accum.vc_m, state.vc)),
                vc_m2=tuple(_welford(m, v**2, n)
                            for m, v in zip(accum.vc_m2, state.vc)),
            )
        return state, accum

    return run_window


def run_mcmc_rrm(model, df: pd.DataFrame, opts, dtype):
    """RRM driver (MCMC_BayesianAlphabet_RRM, MCMC_BayesianAlphabet_RRM.jl:5-261)."""
    phi_np = np.asarray(opts.RRM, dtype=np.float64)
    if phi_np.ndim != 2:
        raise ValueError("RRM must be the (ntimes, ncoeff) Phi matrix")
    ntimes, ncoeff = phi_np.shape
    if model.n_models != 1:
        raise ValueError("RRM supports a single trait (long format)")
    if "time" not in df.columns:
        raise ValueError("RRM requires a 'time' column in the phenotype data")

    df = df.copy()
    id_col = df.columns[0]
    df[id_col] = [str(x).strip() for x in df[id_col]]
    lhs = model.lhs_vec[0]
    yv = pd.to_numeric(df[lhs], errors="coerce").to_numpy(dtype=np.float64)
    keep = np.isfinite(yv)
    df = df[keep].reset_index(drop=True)
    yv = yv[keep]
    n_obs = len(df)

    times = np.sort(pd.unique(pd.to_numeric(df["time"])))
    if len(times) != ntimes:
        raise ValueError(
            f"Phi has {ntimes} rows but the data has {len(times)} unique times"
        )
    time_of = {t: i for i, t in enumerate(times)}
    time_idx = np.array([time_of[t] for t in pd.to_numeric(df["time"])], np.int32)
    ids = list(pd.unique(df[id_col]))
    ind_of = {s: i for i, s in enumerate(ids)}
    ind_idx = np.array([ind_of[s] for s in df[id_col]], np.int32)
    nind = len(ids)
    cell = time_idx.astype(np.int64) * nind + ind_idx
    if len(np.unique(cell)) != n_obs:
        raise ValueError("duplicate (ID, time) observations in the data")
    obs_mask = np.zeros((ntimes, nind))
    obs_mask[time_idx, ind_idx] = 1.0

    # location design over the long observations
    W = np.asarray(build_design(model, df).todense())

    # --- random effects (iid / V / pedigree-A), fitted in the lambda-MME
    # exactly like the main driver (MCMC_BayesianAlphabet_RRM.jl:41,106,159).
    # Default priors: var(y)/2 split when undeclared (h2=0.5 convention). ---
    re_cfgs, Vinvs, vc_scales, vc0 = [], [], [], []
    for re in model.random_effects:
        terms = [model.term_dict[t_] for t_ in re.term_array]
        q = terms[0].n_levels
        k = len(re.term_array)
        if re.G.val is None:
            base = float(np.var(yv, ddof=1)) / 2.0
            re.G.val = np.eye(k) * base
            re.G.scale = np.asarray(re.G.val) * (re.G.df - k - 1.0)
        G0 = np.atleast_2d(np.asarray(re.G.val, dtype=np.float64))
        scale0 = np.atleast_2d(np.asarray(re.G.scale, dtype=np.float64))
        re_cfgs.append(REGroupCfg(
            starts=tuple(t_.start_pos for t_ in terms), n_levels=q,
            df=float(re.G.df), has_vinv=re.Vinv is not None,
            random_type=re.random_type,
        ))
        Vinvs.append(
            np.asarray(re.Vinv.todense()) if re.Vinv is not None
            else np.zeros((0, 0))
        )
        vc_scales.append(scale0)
        vc0.append(G0)

    # genotypes aligned to one row per individual
    if not model.M:
        raise ValueError("RRM currently requires genotypes")
    g0 = model.M[0]
    from jwas_tpu.engine.setup import normalize_method

    normalize_method(g0, model)
    if g0.method not in ("BayesC", "BayesB", "RR-BLUP", "BayesL"):
        raise ValueError(f"method {g0.method!r} is not supported with RRM")
    geno = g0.aligned_to(ids)
    geno.method = g0.method
    p = geno.n_markers

    # priors: residual from phenotypic variance; marker c x c from the
    # genetic variance over the included-pattern mass (genetic2marker analog)
    vare0 = model.R.val
    if vare0 is None:
        vare0 = float(np.var(yv, ddof=1)) / 2.0
        model.R.val = vare0
        model.R.scale = vare0 * (model.R.df - 2.0) / model.R.df
    scale_R = float(model.R.scale)

    pi0 = np.zeros(2**ncoeff)
    if isinstance(g0.pi, dict):
        for pat, prob in g0.pi.items():
            pat = tuple(float(x) for x in pat)
            if len(pat) != ncoeff:
                raise ValueError("RRM Pi patterns must have ncoeff entries")
            pi0[sum(int(pat[k]) * 2**k for k in range(ncoeff))] = float(prob)
    else:
        pi0[-1] = 1.0

    gval = g0.G.val
    if gval is None:
        gv = g0.genetic_variance.val
        if gv is None:
            gv = np.eye(ncoeff) * float(np.var(yv, ddof=1)) / 2.0
        gv = np.atleast_2d(np.asarray(gv, dtype=np.float64))
        if gv.shape == (1, 1):
            gv = np.eye(ncoeff) * float(gv[0, 0])
        labels = _labels(ncoeff)
        denom = np.zeros((ncoeff, ncoeff))
        for li, lab in enumerate(labels):
            denom += pi0[li] * np.outer(lab, lab)
        denom = denom * geno.sum2pq
        denom[denom == 0] = 1.0
        gval = gv / denom
    gval = np.atleast_2d(np.asarray(gval, dtype=np.float64))
    if gval.shape == (1, 1):
        gval = np.eye(ncoeff) * float(gval[0, 0])
    df_marker = float(g0.G.df) + ncoeff
    marker_scale = gval * (df_marker - ncoeff - 1.0)

    X = np.asarray(geno.genotypes, dtype=np.float64)
    mphiphi = build_m_phiphi(X, phi_np, obs_mask)

    cfg = RRMCfg(
        method=geno.method,
        n_obs=n_obs,
        n_markers=p,
        ncoeff=ncoeff,
        estimate_pi=bool(g0.estimate_pi) and geno.method in ("BayesC", "BayesB"),
        estimate_marker_variance=bool(g0.G.estimate_variance),
        estimate_residual_variance=bool(model.R.estimate_variance),
        df_residual=float(model.R.df),
        df_marker=df_marker,
        scale_R=scale_R,
        re_groups=tuple(re_cfgs),
    )
    data = RRMData(
        W=jnp.asarray(W, dtype),
        WtW=jnp.asarray(W.T @ W, dtype),
        y=jnp.asarray(yv, dtype),
        X=jnp.asarray(X, dtype),
        phi=jnp.asarray(phi_np, dtype),
        mphiphi=jnp.asarray(mphiphi, dtype),
        obs_mask=jnp.asarray(obs_mask, dtype),
        time_idx=jnp.asarray(time_idx),
        ind_idx=jnp.asarray(ind_idx),
        Vinv=tuple(jnp.asarray(v, dtype) for v in Vinvs),
        vc_scale=tuple(jnp.asarray(v, dtype) for v in vc_scales),
    )
    seed = opts.seed if opts.seed is not None else 0
    state = RRMState(
        key=jax.random.PRNGKey(seed),
        sol=jnp.zeros((W.shape[1],), dtype),
        alpha=jnp.zeros((ncoeff, p), dtype),
        beta=jnp.zeros((ncoeff, p), dtype),
        delta=jnp.ones((ncoeff, p), dtype),
        ycorr=jnp.asarray(yv, dtype),
        vare=jnp.asarray(float(vare0), dtype),
        varg=jnp.asarray(gval, dtype),
        pi=jnp.asarray(pi0, dtype),
        marker_scale=jnp.asarray(marker_scale, dtype),
        vc=tuple(jnp.asarray(v, dtype) for v in vc0),
    )

    n_outer = max(1, opts.chain_length)
    burnin = opts.burnin
    osf = opts.output_samples_frequency
    if osf <= 0:
        osf = max(1, opts.chain_length // 1000)
    n_saved = max(1, (n_outer - burnin) // osf)

    run_window = make_rrm_run_window(cfg)
    z = jnp.zeros
    accum = RRMAccum(
        n=z((), dtype),
        sol_m=z(state.sol.shape, dtype), sol_m2=z(state.sol.shape, dtype),
        alpha_m=z(state.alpha.shape, dtype), alpha_m2=z(state.alpha.shape, dtype),
        delta_m=z(state.alpha.shape, dtype),
        vare_m=z((), dtype), vare_m2=z((), dtype),
        varg_m=z(state.varg.shape, dtype), varg_m2=z(state.varg.shape, dtype),
        pi_m=z(state.pi.shape, dtype), pi_m2=z(state.pi.shape, dtype),
        u_m=z((ntimes, nind), dtype), u_m2=z((ntimes, nind), dtype),
        vc_m=tuple(z(v.shape, dtype) for v in state.vc),
        vc_m2=tuple(z(v.shape, dtype) for v in state.vc),
    )
    # unified output subsystem: the same sample-file set / progress /
    # checkpointing the ST and MT drivers have (the reference RRM driver
    # writes the full sample-file set, MCMC_BayesianAlphabet_RRM.jl:99,201)
    import os as _os
    from types import SimpleNamespace

    from jwas_tpu.engine.progress import ProgressPrinter, maybe_profile
    from jwas_tpu.engine.samples_io import RRMSampleStream
    from jwas_tpu.utils import checkpoint as ckpt

    ck_folder = opts.checkpoint_folder or _os.path.join(
        opts.output_folder or "results", "checkpoint"
    )
    ck_every_w = 0
    if opts.checkpoint_frequency and int(opts.checkpoint_frequency) > 0:
        ck_every_w = max(1, int(opts.checkpoint_frequency) // osf)
    w0 = 0
    resumed = False
    if opts.resume:
        path = ckpt.latest_checkpoint(ck_folder)
        if path is not None:
            (state, accum), _smp, meta = ckpt.load_checkpoint(
                path, (state, accum)
            )
            w0 = int(meta["w_next"])
            resumed = True

    ws_like = SimpleNamespace(model=model, geno=geno,
                              re_groups=model.random_effects)
    stream = RRMSampleStream(ws_like, cfg, opts, append=resumed)
    progress = ProgressPrinter(opts.printout_frequency, opts.chain_length)

    with maybe_profile(opts):
        if burnin > 0 and not resumed:
            state, accum = run_window(state, data, accum, burnin,
                                      accumulate=False)
        for w in range(w0, n_saved):
            state, accum = run_window(state, data, accum, osf, accumulate=True)
            state_h = jax.device_get(state)
            stream.write_sample(state_h)
            progress.update(burnin + (w + 1) * osf, vare=state_h.vare,
                            varg=state_h.varg, pi=state_h.pi)
            if ck_every_w and (w + 1) % ck_every_w == 0:
                ckpt.save_checkpoint(
                    ck_folder, burnin + (w + 1) * osf, (state, accum), {},
                    {"w_next": w + 1}, keep=opts.checkpoint_keep,
                )
    stream.close()

    return _rrm_results(model, geno, cfg, accum, ids, times, opts,
                        re_groups=model.random_effects)


def _sd(m, m2):
    return np.sqrt(np.abs(np.asarray(m2) - np.asarray(m) ** 2))


def _rrm_results(model, geno, cfg, accum, ids, times, opts, re_groups=()):
    import os

    results = {}
    names = model.term_names()
    sol_m = np.asarray(accum.sol_m)
    sol_sd = _sd(accum.sol_m, accum.sol_m2)
    rows = []
    for name, est, sd in zip(names, sol_m, sol_sd):
        trait, effect, level = name.split(":", 2)
        rows.append((trait, effect, level, float(est), float(sd)))
    results["location parameters"] = pd.DataFrame(
        rows, columns=["Trait", "Effect", "Level", "Estimate", "SD"]
    )
    results["residual variance"] = pd.DataFrame(
        {
            "Covariance": [model.lhs_vec[0] + "_" + model.lhs_vec[0]],
            "Estimate": [float(accum.vare_m)],
            "SD": [float(_sd(accum.vare_m, accum.vare_m2))],
        }
    )
    c = cfg.ncoeff
    coeff_names = [str(i + 1) for i in range(c)]
    alpha_m = np.asarray(accum.alpha_m)
    alpha_sd = _sd(accum.alpha_m, accum.alpha_m2)
    delta_m = np.asarray(accum.delta_m)
    p = cfg.n_markers
    results[f"marker effects {geno.name}"] = pd.DataFrame(
        {
            "Trait": np.repeat(coeff_names, p),
            "Marker_ID": np.tile(geno.marker_ids, c),
            "Estimate": alpha_m.reshape(-1),
            "SD": alpha_sd.reshape(-1),
            "Model_Frequency": delta_m.reshape(-1),
        }
    )
    labels = [
        "[" + ", ".join(str(float((s >> k) & 1)) for k in range(c)) + "]"
        for s in range(2**c)
    ]
    varg_m = np.asarray(accum.varg_m)
    varg_sd = _sd(accum.varg_m, accum.varg_m2)
    results[f"marker effects variances {geno.name}"] = pd.DataFrame(
        {
            "Covariance": [f"{a}_{b}" for a in coeff_names for b in coeff_names],
            "Estimate": varg_m.reshape(-1),
            "SD": varg_sd.reshape(-1),
        }
    )
    if cfg.estimate_pi:
        results[f"pi_{geno.name}"] = pd.DataFrame(
            {
                "pi": labels,
                "Estimate": np.asarray(accum.pi_m),
                "SD": _sd(accum.pi_m, accum.pi_m2),
            }
        )
    # random-effect covariance components
    for re, vc_m, vc_m2 in zip(re_groups, accum.vc_m, accum.vc_m2):
        vc_m = np.atleast_2d(np.asarray(vc_m))
        vc_sd = np.atleast_2d(_sd(vc_m, np.asarray(vc_m2)))
        k = vc_m.shape[0]
        lbl = [f"{re.term_array[i]}_{re.term_array[j]}"
               for i in range(k) for j in range(k)]
        df_vc = pd.DataFrame({"Covariance": lbl,
                              "Estimate": vc_m.reshape(-1),
                              "SD": vc_sd.reshape(-1)})
        if re.random_type == "A":
            results["polygenic effects covariance matrix"] = df_vc
        else:
            results[f"random effect variances {re.term_array[0]}"] = df_vc

    # BV trajectory per individual x time (u_i(t) = Phi_t sum_j m_ij alpha_j)
    u_m = np.asarray(accum.u_m)
    u_sd = _sd(accum.u_m, accum.u_m2)
    results["EBV_trajectory"] = pd.DataFrame(
        {
            "ID": np.tile(ids, len(times)),
            "time": np.repeat(times, len(ids)),
            "EBV": u_m.reshape(-1),
            "PEV": (u_sd**2).reshape(-1),
        }
    )
    if opts.output_folder:
        os.makedirs(opts.output_folder, exist_ok=True)
        for key, df_out in results.items():
            safe = key.replace(" ", "_").replace("*", ".")
            df_out.to_csv(os.path.join(opts.output_folder, safe + ".txt"), index=False)
    return results
