"""Fokker-Planck eigenvalue problem on the torus, d=5.

Reproduces "Eigenvalue - Fokker-Planck.ipynb": learnable lambda
(true value 0), periodic value+gradient boundary matching, center
pinning; alpha=[50, 1], N=20, K=500, delta_t=1e-3, L=100k.  Reference:
lambda within ~5e-3 of 0, eigenfunction L2 ~1.5e-5, 0.56 s/iter.
"""

import numpy as np
from common import parse_args

from pspde.problems import FokkerPlanckEigen
from pspde.solvers import EigenSolver


def main():
    args = parse_args(default_L=100000)
    p = FokkerPlanckEigen(d=5)
    s = EigenSolver(p, "fp-eigen", seed=args.seed, delta_t=1e-3, N=20,
                    lr=1e-3, lr_lambda=0.01, lambda_init=0.5, L=args.L,
                    K=500, K_boundary=50, alpha=(50.0, 1.0),
                    normalization="center",
                    print_every=max(args.L // 20, 1))
    s.train()
    lam = np.mean(s.lambda_log[-200:])
    print(f"lambda = {lam:.4e} (true {p.lambda_true}), "
          f"eigenfunction L2 = {s.V_L2_log[-1]:.3e}")


if __name__ == "__main__":
    main()
