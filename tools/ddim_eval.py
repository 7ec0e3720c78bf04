"""DDIM-vs-DDPM speed/quality duel on a model trained in-framework.

Trains the flagship architecture on the synthetic chemically-sane corpus
(same recipe as tools/quality_gate.py), then samples the SAME trained
weights four ways and evaluates each with the metrics pipeline:

  ddpm-1000          the reference-exact ancestral sampler (baseline)
  ddpm-100           the reference's only "faster" option: schedule
                     TRUNCATION (molopt_score_model.py:649)
  ddim-100 (eta 0)   strided over the full schedule, 10x fewer NFE
  ddim-50  (eta 0)   20x fewer NFE
  dpm2-50 / dpm2-25  Heun / DPM-Solver-2 second-order correction of the
                     ddim jump (2 NFE per step -> ~100 / ~50 NFE), the
                     standard fix for first-order DDIM's low-NFE
                     stability loss (VERDICT r4 #3)

Prints a table + writes ddim_eval.json. The claim under test: strided
DDIM at 100 steps holds quality near ddpm-1000 while the reference's
truncation at the same budget collapses (it never denoises the
high-noise regime).

Usage: python tools/ddim_eval.py [train_steps] [n_mols] [out.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quality_gate import (  # noqa: E402
    build_model, evaluate, make_pool, sample, train, train_profile,
)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    n_mols = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    out_path = sys.argv[3] if len(sys.argv) > 3 else "ddim_eval.json"

    model = build_model()
    pool = make_pool()
    prof = train_profile(pool)
    print(f"training {steps} steps...")
    _, trained, _ = train(model, pool, steps)

    configs = [
        ("ddpm-1000", dict(num_steps=1000, sampler="ddpm")),
        ("ddpm-100-trunc", dict(num_steps=100, sampler="ddpm")),
        ("ddim-100", dict(num_steps=100, sampler="ddim", eta=0.0)),
        ("ddim-50", dict(num_steps=50, sampler="ddim", eta=0.0)),
        ("ddim-100-quad", dict(num_steps=100, sampler="ddim", eta=0.0,
                               ddim_spacing="quadratic")),
        ("ddim-50-quad", dict(num_steps=50, sampler="ddim", eta=0.0,
                              ddim_spacing="quadratic")),
        ("ddim-100-quad-eta1", dict(num_steps=100, sampler="ddim", eta=1.0,
                                    ddim_spacing="quadratic")),
        # second-order rows: NFE ~ 2 x num_steps (Heun correction)
        ("dpm2-50", dict(num_steps=50, sampler="dpm2", eta=0.0)),
        ("dpm2-50-quad", dict(num_steps=50, sampler="dpm2", eta=0.0,
                              ddim_spacing="quadratic")),
        ("dpm2-25", dict(num_steps=25, sampler="dpm2", eta=0.0)),
    ]
    report = {}
    for name, kw in configs:
        print(f"sampling {name}...")
        t0 = time.time()
        mols = sample(model, trained, pool, n_mols, **kw)
        dt = time.time() - t0
        ev = evaluate(mols, prof)
        ev["sample_seconds"] = round(dt, 2)
        ev["mols_per_sec"] = round(n_mols / dt, 3)
        report[name] = ev
        print(f"  {name}: {dt:.1f}s  mol_stable={ev['mol_stable']:.3f} "
              f"atom_stable={ev['atom_stable']:.3f} recon={ev['recon_success']:.3f} "
              f"jsd={ev['pair_jsd_vs_train']:.3f}")

    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: {m: v[m] for m in
                          ("mol_stable", "atom_stable", "recon_success",
                           "pair_jsd_vs_train", "sample_seconds")}
                      for k, v in report.items()}, indent=1))


if __name__ == "__main__":
    main()
