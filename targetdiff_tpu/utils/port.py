"""Port reference (PyTorch) TargetDiff checkpoints into this framework.

The reference distributes `pretrained_diffusion.pt` — a torch pickle holding
{'config', 'model': state_dict, ...} (reference: scripts/train_diffusion.py:
221-228). This module maps that state_dict onto our flax parameter pytree so
users of the reference can switch frameworks with their trained weights.

Name correspondence (reference module tree -> our flax tree):
  protein_atom_emb.{weight,bias}            -> protein_atom_emb.{kernel^T,bias}
  ligand_atom_emb.{weight,bias}             -> ligand_atom_emb.{kernel^T,bias}
  refine_net.edge_pred_layer.net.{0,1,3}.*  -> refine_net.edge_pred_layer.{lin_0,norm_0,lin_1}.*
  refine_net.base_block.{l}.x2h_layers.0.{hk,hv,hq}_func.net.{0,1,3}.*
      -> refine_net.block_{l}.x2h_0.{hk,hv,hq}_func.{lin_0,norm_0,lin_1}.*
  refine_net.base_block.{l}.h2x_layers.0.{xk,xv,xq}_func....  -> ... h2x_0 ...
  v_inference.{0,2}.{weight,bias}           -> v_inference_{0,2}.{kernel^T,bias}

torch Linear stores weight as [out, in]; flax kernels are [in, out] => transpose.
The reference's unused `init_h_emb_layer` (models/uni_transformer.py:245,
constructed but never called in forward) and the diffusion schedule buffers
(recomputed here from the config) are skipped.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _to_numpy(t):
    try:
        import torch

        if isinstance(t, torch.Tensor):
            return t.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


_SKIP = re.compile(
    r"^(betas|alphas_cumprod|alphas_cumprod_prev|sqrt_|posterior_|log_alphas|"
    r"log_one_minus|Lt_history|Lt_count|refine_net\.init_h_emb_layer)"
)


def torch_state_dict_to_flax(state_dict: Dict, num_layers: int) -> Dict:
    """Returns a nested dict matching ScorePosNet.init's {'params': ...}."""
    out: Dict = {}

    def put(path, value):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def linear(prefix_t, path_f):
        w = _to_numpy(state_dict[prefix_t + ".weight"])
        put(path_f + ["kernel"], np.ascontiguousarray(w.T))
        if prefix_t + ".bias" in state_dict:
            put(path_f + ["bias"], _to_numpy(state_dict[prefix_t + ".bias"]))

    def mlp(prefix_t, path_f):
        """reference MLP: net.0 Linear, net.1 LayerNorm, net.3 Linear
        (models/common.py:60-77 with num_layer=2, norm=True)."""
        linear(prefix_t + ".net.0", path_f + ["lin_0"])
        put(path_f + ["norm_0", "scale"], _to_numpy(state_dict[prefix_t + ".net.1.weight"]))
        put(path_f + ["norm_0", "bias"], _to_numpy(state_dict[prefix_t + ".net.1.bias"]))
        linear(prefix_t + ".net.3", path_f + ["lin_1"])

    linear("protein_atom_emb", ["protein_atom_emb"])
    linear("ligand_atom_emb", ["ligand_atom_emb"])
    linear("v_inference.0", ["v_inference_0"])
    linear("v_inference.2", ["v_inference_2"])
    if any(k.startswith("refine_net.edge_pred_layer") for k in state_dict):
        mlp("refine_net.edge_pred_layer", ["refine_net", "edge_pred_layer"])

    for l in range(num_layers):
        base_t = f"refine_net.base_block.{l}"
        base_f = ["refine_net", f"block_{l}"]
        for mlp_name in ("hk", "hv", "hq"):
            mlp(f"{base_t}.x2h_layers.0.{mlp_name}_func",
                base_f + ["x2h_0", f"{mlp_name}_func"])
        for mlp_name in ("xk", "xv", "xq"):
            mlp(f"{base_t}.h2x_layers.0.{mlp_name}_func",
                base_f + ["h2x_0", f"{mlp_name}_func"])
        # per-layer ew nets exist for ew_net_type in ('r','m')
        for sub, ours in (("x2h_layers.0", "x2h_0"), ("h2x_layers.0", "h2x_0")):
            key = f"{base_t}.{sub}.ew_net.0.weight"
            if key in state_dict:
                linear(f"{base_t}.{sub}.ew_net.0", base_f + [ours, "ew_net"])
        # x2h out_fc (node_output MLP) when x2h_out_fc=True
        if f"{base_t}.x2h_layers.0.node_output.net.0.weight" in state_dict:
            mlp(f"{base_t}.x2h_layers.0.node_output", base_f + ["x2h_0", "node_output"])

    return {"params": out}


def verify_against_template(ported: Dict, template: Dict) -> list:
    """Shape-check ported params against a freshly-initialized template;
    returns a list of problems (empty = clean)."""
    import jax

    problems = []
    t_leaves = dict(_flatten(template))
    p_leaves = dict(_flatten(ported))
    for k, v in t_leaves.items():
        if k not in p_leaves:
            problems.append(f"missing: {k}")
        elif tuple(np.shape(p_leaves[k])) != tuple(np.shape(v)):
            problems.append(
                f"shape mismatch {k}: ported {np.shape(p_leaves[k])} vs {np.shape(v)}"
            )
    for k in p_leaves:
        if k not in t_leaves:
            problems.append(f"unexpected: {k}")
    return problems


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield "/".join(prefix), tree


def port_checkpoint(torch_ckpt_path: str, model, example_batch, key=None):
    """Load a reference .pt checkpoint and return flax params for `model`
    (a DiffusionModel). Requires torch (cpu) to unpickle."""
    import jax
    import torch

    raw = torch.load(torch_ckpt_path, map_location="cpu", weights_only=False)
    state_dict = raw["model"] if "model" in raw else raw
    state_dict = {k: v for k, v in state_dict.items() if not _SKIP.match(k)}
    ported = torch_state_dict_to_flax(state_dict, model.config.num_layers)

    key = key if key is not None else jax.random.PRNGKey(0)
    template = model.init(key, example_batch)
    problems = verify_against_template(ported, template)
    if problems:
        raise ValueError("checkpoint port mismatch:\n" + "\n".join(problems[:20]))
    # cast to template dtypes
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda p, t: jnp.asarray(p, dtype=t.dtype), ported, template
    )
