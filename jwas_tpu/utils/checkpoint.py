"""Checkpoint / resume for MCMC chains.

The reference has no checkpointing (SURVEY.md §5: its only related features
are `starting_value` and the MCMC sample files, JWAS.jl:131-134). Here the
whole chain state is an explicit pytree (engine/state.py), so a checkpoint is
just the flattened leaves of (state, accum, mutable-prior fields) plus the
host-side sample lists — written atomically as a single ``.npz`` per
checkpoint. Resuming replays the identical RNG stream (the key lives inside
the state), so an interrupted-and-resumed chain is bitwise identical to an
uninterrupted one.

Checkpoints are written by ``runMCMC(..., checkpoint_frequency=K)`` every K
MCMC iterations (rounded to thinning-window boundaries) into
``<output_folder>/checkpoint/ckpt_<iters>.npz``; ``runMCMC(..., resume=True)``
picks up the latest one. Old files are pruned to ``checkpoint_keep``.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

_FMT_VERSION = 1


def save_checkpoint(
    folder: str,
    iters_done: int,
    carry,
    samples: Dict[str, List[np.ndarray]],
    meta: Dict[str, Any],
    keep: int = 3,
) -> str:
    """Atomically write one checkpoint; prune old ones beyond `keep`.

    carry: any pytree (chain state, accumulators, prior scales, ...).
    samples: per-window host sample lists; each list must be stackable.
    meta: small JSON-serializable driver bookkeeping (w_next, prior_epoch, ...).
    """
    os.makedirs(folder, exist_ok=True)
    leaves = jax.tree_util.tree_leaves(carry)
    payload = {f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(leaves)}
    skeys = []
    for k, v in samples.items():
        skeys.append(k)
        if len(v):
            payload[f"samples_{k}"] = np.stack([np.asarray(x) for x in v])
    all_meta = dict(meta)
    all_meta.update(
        {"version": _FMT_VERSION, "iters": int(iters_done),
         "n_leaves": len(leaves), "sample_keys": skeys}
    )
    payload["__meta__"] = np.frombuffer(
        json.dumps(all_meta).encode(), dtype=np.uint8
    )
    path = os.path.join(folder, f"ckpt_{int(iters_done):012d}.npz")
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)

    if keep and keep > 0:
        old = sorted(glob.glob(os.path.join(folder, "ckpt_*.npz")))
        for stale in old[:-keep]:
            try:
                os.remove(stale)
            except OSError:
                pass
    return path


def latest_checkpoint(folder: str) -> Optional[str]:
    """Highest-iteration checkpoint file in `folder`, or None."""
    paths = []
    for p in glob.glob(os.path.join(folder, "ckpt_*.npz")):
        m = re.search(r"ckpt_(\d+)\.npz$", p)
        if m:
            paths.append((int(m.group(1)), p))
    return max(paths)[1] if paths else None


def load_checkpoint(
    path: str, carry_template
) -> Tuple[Any, Dict[str, List[np.ndarray]], Dict[str, Any]]:
    """Load (carry, samples, meta) from `path`.

    carry_template: a freshly-built pytree with the exact structure the carry
    had when saved (same model/options => same structure); its leaves supply
    dtypes/treedef, the stored leaves supply values.
    """
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta.get("version") != _FMT_VERSION:
            raise ValueError(f"unsupported checkpoint version in {path}")
        tmpl_leaves, treedef = jax.tree_util.tree_flatten(carry_template)
        if meta["n_leaves"] != len(tmpl_leaves):
            raise ValueError(
                f"checkpoint {path} has {meta['n_leaves']} leaves but the "
                f"model/options produce {len(tmpl_leaves)}; resume must use "
                "the same model and runMCMC options as the original run"
            )
        leaves = []
        for i, tmpl in enumerate(tmpl_leaves):
            arr = z[f"leaf_{i:05d}"]
            if hasattr(tmpl, "shape") and tuple(arr.shape) != tuple(
                np.shape(tmpl)
            ):
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != expected "
                    f"{np.shape(tmpl)} ({path})"
                )
            leaves.append(arr)
        carry = jax.tree_util.tree_unflatten(treedef, leaves)
        samples: Dict[str, List[np.ndarray]] = {}
        for k in meta["sample_keys"]:
            key = f"samples_{k}"
            samples[k] = list(z[key]) if key in z.files else []
    return carry, samples, meta
