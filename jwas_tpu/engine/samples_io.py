"""Per-parameter MCMC sample files in the reference text format.

Equivalent of the reference sample-file subsystem (reference:
src/1.JWAS/src/output.jl:320-437 `output_MCMC_samples_setup` and :443-526
`output_MCMC_samples`): one comma-separated text file per tracked parameter
named `MCMC_samples_<var>.txt` under the output folder (":" replaced by "."),
with a header row where the reference writes one (level names, marker IDs,
trait-pair labels, output IDs) and one row per saved sample.

Files written (when applicable):
  residual_variance, polygenic_effects_variance,
  marker_effects_<geno>_<trait>, marker_effects_variances_<geno>, pi_<geno>,
  <trait>.<term>   (location parameters requested via outputMCMCsamples),
  <terms-joined>_variances (per random-effect group),
  EBV_<trait>, genetic_variance, heritability,
  liabilities_<trait>, threshold_<trait> (latent traits).

GWAS's genetic-correlation mode consumes pairs of the marker-effect files
(analysis/gwas.py), matching the reference workflow GWAS(...) <- runMCMC files.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

# marker-effect sample files grow as p * n_saved; above this marker count the
# file is skipped unless the user explicitly asks (output_marker_samples=True)
MARKER_FILE_MAX_P = 200_000


def resolve_write_markers(p: int, output_marker_samples) -> bool:
    """Decide (and announce) whether per-marker sample files are written."""
    if bool(output_marker_samples) or p <= MARKER_FILE_MAX_P:
        return True
    print(
        f"NOTE: marker-effect sample files are skipped at p={p:,} markers "
        f"(> {MARKER_FILE_MAX_P:,}; the files grow as p x saved samples). "
        f"Pass output_marker_samples=True to runMCMC to force writing."
    )
    return False


class MCMCSampleWriter:
    """Append-oriented writer for the per-parameter sample files."""

    def __init__(self, folder: str, prefix: str = "MCMC_samples",
                 append: bool = False):
        self.folder = folder
        self.prefix = prefix
        self.append = append        # resume: keep existing rows, skip headers
        self._files: Dict[str, object] = {}
        os.makedirs(folder, exist_ok=True)

    def path(self, var: str) -> str:
        safe = var.replace(":", ".")
        return os.path.join(self.folder, f"{self.prefix}_{safe}.txt")

    def register(self, var: str, header: Optional[Sequence[str]] = None):
        if var in self._files:
            return
        path = self.path(var)
        if self.append and os.path.isfile(path):
            f = open(path, "a")
        else:
            f = open(path, "w")
            if header is not None:
                f.write(",".join(str(h) for h in header) + "\n")
        self._files[var] = f

    def write(self, var: str, values):
        arr = np.asarray(values).reshape(-1)
        self._files[var].write(
            ",".join(repr(float(v)) for v in arr) + "\n"
        )

    def write_rows(self, var: str, matrix):
        """Write a 2-D array as one text row per matrix row, mirroring the
        reference's writedlm of a matrix (output.jl:471-475: the multi-trait
        G.val / BayesB hcat-of-blocks land as ntraits rows per sample)."""
        mat = np.atleast_2d(np.asarray(matrix))
        f = self._files[var]
        for row in mat:
            f.write(",".join(repr(float(v)) for v in row) + "\n")

    def close(self):
        for f in self._files.values():
            f.close()
        self._files = {}


def _trait_pair_header(traits: List[str]) -> List[str]:
    return [f"{a}_{b}" for a in traits for b in traits]


class STSampleStream:
    """Single-trait driver hook: setup + per-saved-sample writes."""

    def __init__(self, ws, cfg, opts, append: bool = False):
        model = ws.model
        self.enabled = bool(opts.output_folder)
        if not self.enabled:
            self.writer = None
            return
        self.ws = ws
        self.cfg = cfg
        self.opts = opts
        trait = model.lhs_vec[0]
        w = MCMCSampleWriter(opts.output_folder, append=append)
        w.register("residual_variance", _trait_pair_header([trait]))

        self.loc_slices = []
        for trm_str in model.output_samples_terms:
            trm = model.term_dict.get(trm_str)
            if trm is None:
                continue
            w.register(trm_str, [f"{trm_str}:{s}" for s in trm.names])
            self.loc_slices.append((trm_str, trm.start_pos, trm.n_levels))

        self.re_vars = []
        for grp in ws.re_groups:
            var = "_".join(grp.term_array) + "_variances"
            w.register(var, _trait_pair_header(grp.term_array))
            self.re_vars.append(var)
        self.has_ped = any(g.random_type == "A" for g in ws.re_groups)
        if self.has_ped:
            ped_terms = [t for g in ws.re_groups if g.random_type == "A"
                         for t in g.term_array]
            w.register("polygenic_effects_variance", _trait_pair_header(ped_terms))

        self.write_markers = False
        g = ws.geno
        if g is not None and cfg.method != "none":
            p = cfg.n_markers
            self.write_markers = resolve_write_markers(
                p, opts.output_marker_samples
            )
            if self.write_markers:
                mids = (g.marker_ids if g.method != "GBLUP"
                        else [str(i + 1) for i in range(p)])
                w.register(f"marker_effects_{g.name}_{trait}", mids)
            w.register(f"marker_effects_variances_{g.name}")
            w.register(f"pi_{g.name}")

        self.ebv = bool(opts.outputEBV) and bool(ws.output_ids)
        if self.ebv:
            w.register(f"EBV_{trait}", list(ws.output_ids))
            if opts.output_heritability and not opts.single_step_analysis:
                w.register("genetic_variance", _trait_pair_header([trait]))
                w.register("heritability", [trait])

        self.latent = cfg.trait_types and cfg.trait_types[0] in (
            "categorical", "categorical(binary)", "censored"
        )
        if self.latent:
            w.register(f"liabilities_{trait}")
            if cfg.trait_types[0] in ("categorical", "categorical(binary)"):
                w.register(f"threshold_{trait}")
        self.trait = trait
        self.writer = w

    def write_sample(self, state, out):
        if not self.enabled:
            return
        w = self.writer
        g = self.ws.geno
        cfg = self.cfg
        sol = np.asarray(state.sol)
        w.write("residual_variance", state.vare)
        for trm_str, start, nlev in self.loc_slices:
            w.write(trm_str, sol[start : start + nlev])
        ped_vcs = []
        for grp, var, vc in zip(self.ws.re_groups, self.re_vars, state.vc):
            w.write(var, vc)
            if grp.random_type == "A":
                ped_vcs.append(np.asarray(vc).reshape(-1))
        if self.has_ped:
            w.write("polygenic_effects_variance", np.concatenate(ped_vcs))
        if g is not None and cfg.method != "none":
            p = cfg.n_markers
            if self.write_markers:
                w.write(f"marker_effects_{g.name}_{self.trait}",
                        np.asarray(state.alpha)[:p])
            # BayesA/B: the FULL per-marker variance vector, matching the
            # reference writer's row shape (output.jl:471-475); gated by the
            # same size guard as the marker-effect file (the mean is the
            # documented fallback above MARKER_FILE_MAX_P markers)
            varg = np.asarray(state.varg)
            if varg.ndim and not self.write_markers:
                varg = varg[:p].mean()
            elif varg.ndim:
                varg = varg[:p]
            w.write(f"marker_effects_variances_{g.name}", varg)
            pi = np.asarray(state.pi)
            if pi.ndim == 2:                 # annotated BayesR per-marker priors
                pi = pi[:p].mean(axis=0)
            elif cfg.anno_steps == 1:        # annotated BayesC per-marker pi
                pi = np.asarray([pi[:p].mean()])
            elif cfg.method in ("BayesC", "BayesB") and pi.ndim == 1:
                pi = pi[:1] if pi.shape[0] else pi
            w.write(f"pi_{g.name}", pi)
        if self.ebv:
            w.write(f"EBV_{self.trait}", out.ebv)
            if self.opts.output_heritability and not self.opts.single_step_analysis:
                w.write("genetic_variance", out.genvar)
                w.write("heritability", out.h2)
        if self.latent:
            w.write(f"liabilities_{self.trait}", state.liab)
            if cfg.trait_types[0] in ("categorical", "categorical(binary)"):
                w.write(f"threshold_{self.trait}", state.thresholds)

    def close(self):
        if self.enabled and self.writer is not None:
            self.writer.close()


def multichain_streams(stream_cls, ws, cfg, opts, n_chains: int,
                       append: bool = False):
    """Per-chain sample-file streams under chain_<k>/ subfolders (inputs to
    analysis.diagnostics.PSRF_per_parameter). Enabled by
    runMCMC(..., output_chain_samples=True); chain-0 additionally streams to
    the top-level folder for single-chain-compatible workflows."""
    import dataclasses

    if not opts.output_folder or not bool(
        getattr(opts, "output_chain_samples", False)
    ):
        return []
    return [
        stream_cls(
            ws, cfg,
            dataclasses.replace(
                opts,
                output_folder=os.path.join(opts.output_folder, f"chain_{k + 1}"),
            ),
            append=append,
        )
        for k in range(n_chains)
    ]


class RRMSampleStream:
    """Random-regression driver hook: the full per-parameter sample-file set
    the reference RRM driver writes (MCMC_BayesianAlphabet_RRM.jl:99,201 via
    output_MCMC_samples_setup/output_MCMC_samples). The RRM 'traits' are the
    Legendre coefficients; marker-effect files are written per coefficient."""

    def __init__(self, ws_like, cfg, opts, append: bool = False):
        # ws_like: (model, geno, re_groups, output_ids) — the RRM driver has
        # no full Workspace; it passes a lightweight namespace
        model, geno, re_groups = (ws_like.model, ws_like.geno,
                                  ws_like.re_groups)
        self.enabled = bool(opts.output_folder)
        if not self.enabled:
            self.writer = None
            return
        self.cfg = cfg
        self.opts = opts
        self.geno = geno
        self.re_groups = re_groups
        trait = model.lhs_vec[0]
        self.trait = trait
        c = cfg.ncoeff
        w = MCMCSampleWriter(opts.output_folder, append=append)
        w.register("residual_variance", _trait_pair_header([trait]))

        self.loc_slices = []
        for trm_str in model.output_samples_terms:
            trm = model.term_dict.get(trm_str)
            if trm is None:
                continue
            w.register(trm_str, [f"{trm_str}:{s}" for s in trm.names])
            self.loc_slices.append((trm_str, trm.start_pos, trm.n_levels))

        self.re_vars = []
        for grp in re_groups:
            var = "_".join(grp.term_array) + "_variances"
            w.register(var, _trait_pair_header(list(grp.term_array)))
            self.re_vars.append(var)

        p = cfg.n_markers
        self.write_markers = resolve_write_markers(
            p, opts.output_marker_samples
        )
        coeffs = [f"coeff{i + 1}" for i in range(c)]
        if self.write_markers:
            for cname in coeffs:
                w.register(f"marker_effects_{geno.name}_{cname}",
                           geno.marker_ids)
        w.register(f"marker_effects_variances_{geno.name}",
                   _trait_pair_header(coeffs))
        w.register(f"pi_{geno.name}")
        self.writer = w

    def write_sample(self, state):
        if not self.enabled:
            return
        w = self.writer
        cfg = self.cfg
        p = cfg.n_markers
        sol = np.asarray(state.sol)
        w.write("residual_variance", state.vare)
        for trm_str, start, nlev in self.loc_slices:
            w.write(trm_str, sol[start : start + nlev])
        for grp, var, vc in zip(self.re_groups, self.re_vars, state.vc):
            w.write(var, vc)
        if self.write_markers:
            alpha = np.asarray(state.alpha)      # (c, p)
            for i in range(cfg.ncoeff):
                w.write(f"marker_effects_{self.geno.name}_coeff{i + 1}",
                        alpha[i, :p])
        w.write(f"marker_effects_variances_{self.geno.name}", state.varg)
        w.write(f"pi_{self.geno.name}", state.pi)

    def close(self):
        if self.enabled and self.writer is not None:
            self.writer.close()


class MTSampleStream:
    """Multi-trait driver hook (same file schema, trait-expanded)."""

    def __init__(self, ws, cfg, opts, append: bool = False):
        model = ws.model
        self.enabled = bool(opts.output_folder)
        if not self.enabled:
            self.writer = None
            return
        self.ws = ws
        self.cfg = cfg
        self.opts = opts
        traits = list(model.lhs_vec)
        self.traits = traits
        w = MCMCSampleWriter(opts.output_folder, append=append)
        w.register("residual_variance", _trait_pair_header(traits))

        self.loc_slices = []
        for trm_str in model.output_samples_terms:
            trm = model.term_dict.get(trm_str)
            if trm is None:
                continue
            w.register(trm_str, [f"{trm_str}:{s}" for s in trm.names])
            self.loc_slices.append((trm_str, trm.start_pos, trm.n_levels))

        self.re_vars = []
        for grp in ws.re_groups:
            var = "_".join(grp.term_array) + "_variances"
            w.register(var, _trait_pair_header(grp.term_array))
            self.re_vars.append(var)
        self.has_ped = any(g.random_type == "A" for g in ws.re_groups)
        if self.has_ped:
            ped_terms = [t for g in ws.re_groups if g.random_type == "A"
                         for t in g.term_array]
            w.register("polygenic_effects_variance", _trait_pair_header(ped_terms))

        self.write_markers = False
        g = ws.geno
        if g is not None and cfg.method != "none":
            p = cfg.n_markers
            self.write_markers = resolve_write_markers(
                p, opts.output_marker_samples
            )
            if self.write_markers:
                mids = (g.marker_ids if g.method != "GBLUP"
                        else [str(i + 1) for i in range(p)])
                for trait in traits:
                    w.register(f"marker_effects_{g.name}_{trait}", mids)
            w.register(f"marker_effects_variances_{g.name}")
            w.register(f"pi_{g.name}")

        self.ebv = bool(opts.outputEBV) and bool(ws.output_ids)
        if self.ebv:
            for trait in traits:
                w.register(f"EBV_{trait}", list(ws.output_ids))
            if opts.output_heritability and not opts.single_step_analysis:
                w.register("genetic_variance", _trait_pair_header(traits))
                w.register("heritability", traits)

        self.latent = tuple(getattr(cfg, "latent_traits", ()))
        for ti in self.latent:
            w.register(f"liabilities_{traits[ti]}")
            if cfg.trait_types[ti] in ("categorical", "categorical(binary)"):
                w.register(f"threshold_{traits[ti]}")
        self.writer = w

    def write_sample(self, state, out):
        if not self.enabled:
            return
        w = self.writer
        g = self.ws.geno
        cfg = self.cfg
        sol = np.asarray(state.sol)
        w.write("residual_variance", state.R)
        for trm_str, start, nlev in self.loc_slices:
            w.write(trm_str, sol[start : start + nlev])
        ped_vcs = []
        for grp, var, vc in zip(self.ws.re_groups, self.re_vars, state.vc):
            w.write(var, vc)
            if grp.random_type == "A":
                ped_vcs.append(np.asarray(vc).reshape(-1))
        if self.has_ped:
            w.write("polygenic_effects_variance", np.concatenate(ped_vcs))
        if g is not None and cfg.method != "none":
            p = cfg.n_markers
            alpha = np.asarray(state.alpha)
            if self.write_markers:
                for ti, trait in enumerate(self.traits):
                    w.write(f"marker_effects_{g.name}_{trait}", alpha[ti, :p])
            varg = np.asarray(state.varg)
            if varg.ndim == 3:               # per-locus BayesB covariances
                if self.write_markers:
                    # hcat of the p (t,t) blocks -> t rows of p*t values,
                    # the reference BayesB writer's shape (output.jl:471-473)
                    t = varg.shape[1]
                    varg = varg[:p].transpose(1, 0, 2).reshape(t, p * t)
                else:                        # size-guard fallback: mean block
                    varg = varg[:p].mean(axis=0)
            w.write_rows(f"marker_effects_variances_{g.name}", varg)
            w.write(f"pi_{g.name}", state.pi)
        if self.ebv:
            ebv = np.asarray(out.ebv)
            for ti, trait in enumerate(self.traits):
                w.write(f"EBV_{trait}", ebv[ti])
            if self.opts.output_heritability and not self.opts.single_step_analysis:
                w.write("genetic_variance", out.genvar)
                w.write("heritability", out.h2)
        for ti in self.latent:
            trait = self.traits[ti]
            w.write(f"liabilities_{trait}", np.asarray(state.liab)[ti])
            if cfg.trait_types[ti] in ("categorical", "categorical(binary)"):
                w.write(f"threshold_{trait}", np.asarray(state.thresholds)[ti])

    def close(self):
        if self.enabled and self.writer is not None:
            self.writer.close()
