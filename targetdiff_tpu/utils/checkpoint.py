"""Checkpointing with true resume, keeping the reference's
config-embedded-in-checkpoint contract (reference:
scripts/train_diffusion.py:221-228 saves {config, model, optimizer, scheduler,
iteration}; consumers rebuild the model from ckpt['config'],
scripts/sample_diffusion.py:136-141). Unlike the reference (save-only), these
checkpoints restore optimizer + scheduler state for mid-run resume.

Storage is a plain npz-of-leaves + json treedef — dependency-light, portable
across hosts, and friendly to partial loads (params only for sampling).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..config import Config, dump_config


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(
    path: str,
    config,
    params,
    opt_state: Any = None,
    scheduler_state: Optional[dict] = None,
    iteration: int = 0,
    extra: Optional[dict] = None,
) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    treedef = jax.tree_util.tree_structure(params)
    blob = {f"params/{k}": v for k, v in _flatten(params).items()}
    if opt_state is not None:
        blob.update({f"opt/{k}": v for k, v in _flatten(opt_state).items()})
    meta = {
        "config": dump_config(config) if not isinstance(config, str) else config,
        "iteration": int(iteration),
        "scheduler": scheduler_state or {},
        "extra": extra or {},
        "params_treedef": str(treedef),
    }
    np.savez_compressed(path + ".tmp.npz", __meta__=json.dumps(meta), **blob)
    os.replace(path + ".tmp.npz", path)


def load_checkpoint(path: str, params_template=None, opt_template=None) -> Dict[str, Any]:
    """Returns dict with config (Config), iteration, scheduler, params
    (unflattened against template if given, else flat dict), opt_state."""
    import yaml

    if not os.path.exists(path):
        hint = ""
        if os.path.basename(path) == "diffusion_ckpt.npz":
            hint = (" — the smoke-test checkpoint is generated on demand: "
                    "run `python tools/make_smoke_ckpt.py`")
        raise FileNotFoundError(f"checkpoint not found: {path}{hint}")
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        flat_params = {k[len("params/"):]: z[k] for k in z.files if k.startswith("params/")}
        flat_opt = {k[len("opt/"):]: z[k] for k in z.files if k.startswith("opt/")}

    out = {
        "config": Config(yaml.safe_load(meta["config"])),
        "iteration": meta["iteration"],
        "scheduler": meta["scheduler"],
        "extra": meta["extra"],
    }
    out["params"] = _unflatten(flat_params, params_template) if params_template is not None else flat_params
    if opt_template is not None and flat_opt:
        out["opt_state"] = _unflatten(flat_opt, opt_template)
    else:
        out["opt_state"] = flat_opt or None
    return out


def _unflatten(flat: Dict[str, np.ndarray], template):
    leaves_with_path = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)
    leaves = []
    for path, tmpl_leaf in leaves_with_path:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf: {key}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(np.shape(tmpl_leaf)):
            raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {np.shape(tmpl_leaf)}")
        leaves.append(arr.astype(np.asarray(tmpl_leaf).dtype) if hasattr(tmpl_leaf, "dtype") else arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)
