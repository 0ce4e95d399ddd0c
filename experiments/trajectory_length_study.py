"""Diffusion-loss accuracy vs trajectory length.

Reproduces "Nonlinear toy problem - trajectory length.ipynb":
EllipticSolver diffusion loss on ExponentialOnBallNonlinearSin with
N in {1, 2, 5, 10, 20, 50, 100} at delta_t in {1e-3, 5e-4}.
"""

from common import parse_args

from pspde.problems import ExponentialOnBallNonlinearSin
from pspde.solvers import EllipticSolver


def main():
    args = parse_args(default_L=20000,
                      extra={"--d": dict(type=int, default=10)})
    p = ExponentialOnBallNonlinearSin(d=args.d, alpha=1.0)
    results = {}
    spc = 1 if args.smoke else 100
    for delta_t in [1e-3, 5e-4]:
        for N in [1, 2, 5, 10, 20, 50, 100]:
            s = EllipticSolver(p, f"N={N} dt={delta_t:g}", seed=args.seed,
                               delta_t=delta_t, N=N, lr=1e-3, L=args.L,
                               K=200, K_boundary=50,
                               loss_method="diffusion", K_test_log=10000,
                               steps_per_call=spc, verbose=False)
            s.train()
            results[(delta_t, N)] = s.V_test_L2[-1]
            print(f"  dt={delta_t:g} N={N}: test L2 {s.V_test_L2[-1]:.3e}")
    print(results)


if __name__ == "__main__":
    main()
