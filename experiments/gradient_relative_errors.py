"""Relative errors of per-step loss gradients.

Reproduces "Relative errors of gradients.ipynb": DoubleWell(eta=3,
kappa=5), per-step ('outer') ansatz, per-iteration gradient mean/variance
via the batched jacrev diagnostic (replacing the notebook's Solver_grad
subclass with M gradient repeats)."""

import jax
import numpy as np
from common import parse_args

from pspde.eval import gradient_variances
from pspde.problems import DoubleWell
from pspde.solvers import HJBSolver


def main():
    args = parse_args(default_L=200)
    dw = DoubleWell(d=1, T=1.0, eta=3.0, kappa=5.0)
    dw.compute_reference_solution()
    for loss in ["moment", "log-variance"]:
        s = HJBSolver(loss, dw, L=args.L, lr=1e-3, seed=args.seed,
                      delta_t=0.02, K=500, time_approx="outer",
                      loss_method=loss, detach_forward=True,
                      compute_gradient_variance=max(args.L // 10, 1),
                      print_every=max(args.L // 10, 1),
                      early_stopping_time=None)
        s.train()
        print(f"  {loss}: mean relative gradient error over training: "
              f"{np.mean(s.grads_rel_error_log):.3f}")


if __name__ == "__main__":
    main()
