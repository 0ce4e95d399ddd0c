#!/usr/bin/env python3
"""Empirical VPU roofline for the fused training step (VERDICT r3 item 1).

Runs the two machine-rate microbenchmarks of pspde/utils/roofline.py
(VMEM-resident Pallas loops: sustained f32 FMA flops/s and
erfinv-normals/s — the exact bits->normal map of the fused training
kernel), then the jaxpr-derived per-path-step work count of the d=100
HJB fused train step, and prints the implied path-steps/s ceiling next
to the spec MXU peak for context.  bench.py reuses these pieces to
report `vpu_roofline_pct` for the winning mode.

Usage: python3 experiments/proto_vpu_roofline.py
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pspde.utils import enable_compilation_cache
from pspde.utils.roofline import (fused_train_vpu_roofline,
                                  prng_normals_rate, vpu_fma_rate)


def main():
    enable_compilation_cache()
    from pspde.problems import LLGC
    from pspde.solvers import HJBSolver

    from pspde.utils.roofline import fused_ablation_rates

    p = LLGC(d=100, T=1.0)
    s = HJBSolver("roofline", p, lr=1e-3, L=1, K=256, delta_t=1.0 / 32,
                  time_approx="inner", loss_method="log-variance",
                  detach_forward=True, learn_Y_0=True, verbose=False,
                  early_stopping_time=None)
    abl = fused_ablation_rates(p, s)
    print(json.dumps({"ablation_path_steps_per_sec":
                      {k: (float(f"{v:.5g}") if isinstance(v, float)
                           else v) for k, v in abl.items()}}),
          flush=True)
    if abl.get("noise"):
        print(json.dumps({"train_ceiling_noise_replay":
                          float(f"{abl['noise'] / 2.0:.5g}")}), flush=True)

    out = fused_train_vpu_roofline(p, s)
    out["v5e_bf16_mxu_peak_flops"] = 197e12
    print(json.dumps({k: (v if isinstance(v, dict)
                          else float(f"{v:.5g}"))
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
