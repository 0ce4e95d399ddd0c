"""Nonlinear elliptic toy problem with Dirichlet data, d=50.

Reproduces "Nonlinear toy problem - elliptic with Dirichlet.ipynb":
ExponentialOnBallNonlinearSin(d=50), PINN alpha-sweep + uniform_square
sampling ablation vs diffusion loss vs BSDE (N up to 200,000 with remat).
Reference: diffusion v-L2 ~3e-8..1e-7 at 0.26-0.41 s/iter (L=220k).
"""

from common import parse_args, save

from pspde.problems import ExponentialOnBallNonlinearSin
from pspde.solvers import EllipticSolver


def main():
    args = parse_args(default_L=220000,
                      extra={"--bsde-n": dict(type=int, default=200000)})
    d = 50
    p = ExponentialOnBallNonlinearSin(d=d, alpha=1.0)
    models = []
    s = EllipticSolver(p, "diffusion", seed=args.seed, delta_t=1e-3, N=20,
                       lr=1e-3, L=args.L, K=200, K_boundary=50,
                       loss_method="diffusion", K_test_log=10000,
                       print_every=max(args.L // 20, 1))
    s.train()
    models.append(s)
    for a0 in [0.1, 1.0, 10.0]:
        for uniform_square in [False, True]:
            s = EllipticSolver(
                p, f"PINN a0={a0:g} us={uniform_square}", seed=args.seed,
                delta_t=1e-3, N=20, lr=1e-3, L=args.L // 4, K=200,
                K_boundary=50, alpha=(a0, 1.0), loss_method="PINN",
                uniform_square=uniform_square, K_test_log=10000,
                print_every=max(args.L // 20, 1))
            s.train()
            models.append(s)
    n_bsde = 2000 if args.smoke else args.bsde_n
    s = EllipticSolver(p, f"BSDE N={n_bsde}", seed=args.seed, delta_t=1e-3,
                       N=n_bsde, lr=1e-3, L=max(args.L // 100, 5), K=200,
                       K_boundary=50, loss_method="BSDE", K_test_log=10000,
                       print_every=1, remat=True)
    s.train()
    models.append(s)
    for m in models:
        print(f"  {m.name}: test L2 {m.V_test_L2[-1]:.3e}")
    save(models, "elliptic_dirichlet_d50", args)


if __name__ == "__main__":
    main()
