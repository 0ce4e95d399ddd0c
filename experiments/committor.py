"""Committor function between two spheres, d=10.

Reproduces "Committor function.ipynb": diffusion loss (N=50, alpha0 in
{1, 10, 100}) vs PINN vs BSDE (N=5000), DenseNetTanh2 ansatz
arch=[d+10, d, d, d].  Reference: diffusion test L2 ~ 1.5e-7 at ~0.11
s/iter; BSDE ~1e-5 at 14-29 s/iter (cells 10, 16).
"""

from common import parse_args, save

from pspde.ansatz import DenseNetTanh2
from pspde.problems import Committor
from pspde.solvers import EllipticSolver


def main():
    args = parse_args(default_L=30000)
    d = 10
    p = Committor(d=d)
    net = DenseNetTanh2(d_out=1, arch=(d + 10, d, d, d))
    models = []
    for a0 in [1.0, 10.0, 100.0]:
        s = EllipticSolver(p, f"diffusion a0={a0:g}", seed=args.seed,
                           delta_t=0.001, N=50, lr=1e-3, L=args.L, K=200,
                           K_boundary=50, alpha=(a0, 1.0),
                           loss_method="diffusion", value_net=net,
                           K_test_log=10000,
                           print_every=max(args.L // 20, 1))
        s.train()
        print(f"  a0={a0:g}: test L2 {s.V_test_L2[-1]:.3e}")
        models.append(s)
    s = EllipticSolver(p, "PINN", seed=args.seed, delta_t=0.001, N=50,
                       lr=1e-3, L=args.L, K=200, K_boundary=50,
                       loss_method="PINN", value_net=net, K_test_log=10000,
                       print_every=max(args.L // 20, 1))
    s.train()
    models.append(s)
    n_bsde = 500 if args.smoke else 5000
    s = EllipticSolver(p, "BSDE", seed=args.seed, delta_t=0.001, N=n_bsde,
                       lr=1e-3, L=max(args.L // 30, 10), K=200,
                       K_boundary=50, loss_method="BSDE", value_net=net,
                       K_test_log=10000, print_every=10)
    s.train()
    models.append(s)
    for m in models:
        print(f"  {m.name}: test L2 {m.V_test_L2[-1]:.3e}")
    save(models, "Committor_d10", args)


if __name__ == "__main__":
    main()
