"""Nonlinear parabolic problem with Neumann boundary data, d=20.

Reproduces "Nonlinear toy problem - parabolic with Neumann.ipynb":
GeneralSolver on ExponentialOnSphereNonlinearParabolic(d=20) with
Neumann spatial boundary loss, alpha2 in {0.1, 1, 10, 100}.
"""

from common import parse_args, save

from pspde.problems import ExponentialOnSphereNonlinearParabolic
from pspde.solvers import GeneralSolver


def main():
    args = parse_args(default_L=100000)
    p = ExponentialOnSphereNonlinearParabolic(d=20, T=1.0, alpha=1.0)
    p.boundary_type = "Neumann"
    models = []
    spc = 1 if args.smoke else 100
    for a2 in [0.1, 1.0, 10.0, 100.0]:
        s = GeneralSolver(p, f"diffusion a2={a2:g}", seed=args.seed,
                          delta_t=1e-3, N=20, lr=1e-3, L=args.L, K=200,
                          K_boundary=50, alpha=(1.0, 1.0, a2),
                          loss_method="diffusion", K_test_log=10000,
                          steps_per_call=spc,
                          print_every=max(args.L // 20, 1))
        s.train()
        models.append(s)
        print(f"  a2={a2:g}: test L2 {s.V_test_L2[-1]:.3e}")
    save(models, "parabolic_neumann_d20", args)


if __name__ == "__main__":
    main()
