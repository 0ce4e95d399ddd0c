"""Nonlinear Schroedinger eigenvalue problem, d=5 or d=10.

Reproduces "Eigenvalue - nonlinear Schroedinger equation, d = 5/10.ipynb":
cubic nonlinearity, L2-normalization penalty (E[V^2]-1)^2 + hat barrier,
DenseNet_2-style tanh-concat net with relu output, lambda_init=-2.
Reference: lambda -> -3.02..-3.08 (true -3), L2 ~2e-6, 0.46 s/iter
(d=10 cell 7).
"""

import numpy as np
from common import parse_args

from pspde.ansatz import DenseNetTanh
from pspde.problems import SchrodingerEigen
from pspde.solvers import EigenSolver


def main():
    args = parse_args(default_L=200000,
                      extra={"--d": dict(type=int, default=5)})
    p = SchrodingerEigen(d=args.d)
    net = DenseNetTanh(d_out=1, arch=(15, 15, 15, 15), output_relu=True)
    s = EigenSolver(p, "schroedinger-eigen", seed=args.seed, delta_t=1e-3,
                    N=20, lr=1e-3, lambda_init=-2.0, L=args.L, K=500,
                    K_boundary=50, alpha=(50.0, 1.0),
                    normalization="l2_penalty", value_net=net,
                    print_every=max(args.L // 20, 1))
    s.train()
    lam = np.mean(s.lambda_log[-200:])
    print(f"lambda = {lam:.4f} (true {p.lambda_true}), rel err "
          f"{abs(lam - p.lambda_true) / abs(p.lambda_true):.2%}, "
          f"eigenfunction L2 = {s.V_L2_log[-1]:.3e}")


if __name__ == "__main__":
    main()
