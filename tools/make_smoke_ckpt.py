"""Regenerate the smoke-test checkpoint `pretrained_models/diffusion_ckpt.npz`.

The checkpoint is a RANDOM-INIT of the flagship config (the released
TargetDiff architecture, reference configs/training.yml:9-42) saved with the
config embedded, so the sampling/likelihood CLIs and demos run end-to-end
without the (unreleased-in-this-image) reference weights. It is NOT a
trained model — see tools/quality_gate.py for trained-model evidence.

The blob is generated on demand instead of being committed (ADVICE r3).

Usage: python tools/make_smoke_ckpt.py [out.npz]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make(path: str, seed: int = 0) -> str:
    import jax

    from __graft_entry__ import _flagship
    from targetdiff_tpu.config import load_config
    from targetdiff_tpu.utils.checkpoint import save_checkpoint

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = load_config(os.path.join(root, "configs", "training.yml"))
    model, batch = _flagship(num_timesteps=1000, max_protein=64, max_ligand=32, batch=2)
    params = model.init(jax.random.PRNGKey(seed), batch)
    save_checkpoint(path, config, params, iteration=0)
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pretrained_models", "diffusion_ckpt.npz",
    )
    print("wrote", make(out))
