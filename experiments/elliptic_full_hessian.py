"""Nonlinear elliptic with non-diagonal sigma (full Hessian), d=20.

Reproduces "Nonlinear toy problem - elliptic with full Hessian.ipynb":
ExponentialOnBallNonlinearSinHessian(d=20) with B = sqrt(2/d) ones(d,d);
PINN with full_hessian=True vs diffusion loss.
"""

from common import parse_args, save

from pspde.problems import ExponentialOnBallNonlinearSinHessian
from pspde.solvers import EllipticSolver


def main():
    args = parse_args(default_L=100000)
    p = ExponentialOnBallNonlinearSinHessian(d=20, alpha=1.0)
    models = []
    spc = 1 if args.smoke else 100
    for name, kw in [
        ("diffusion", dict(loss_method="diffusion")),
        ("PINN full-hessian", dict(loss_method="PINN", full_hessian=True)),
    ]:
        s = EllipticSolver(p, name, seed=args.seed, delta_t=1e-3, N=20,
                           lr=1e-3, L=args.L, K=200, K_boundary=50,
                           K_test_log=10000, steps_per_call=spc,
                           print_every=max(args.L // 20, 1), **kw)
        s.train()
        models.append(s)
        print(f"  {name}: test L2 {s.V_test_L2[-1]:.3e}")
    save(models, "elliptic_full_hessian_d20", args)


if __name__ == "__main__":
    main()
