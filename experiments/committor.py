"""Committor function between two spheres, d=10.

Reproduces "Committor function.ipynb" with the notebook's exact configs:

  * diffusion (cell 3): alpha0 sweep {1, 10, 100}, DEFAULT DenseNet
    (arch [30,30], the solver default — the notebook overrides no net on
    this leg), N=50, K=200, delta_t=1e-3, L=30k, loss_with_stopped=False
    (headline comparison model: alpha0=10, cell 18);
  * PINN (cell 9): alpha0 sweep {1e-3, 1e-2, 1e-1}, default net;
  * BSDE (cell 15): N=5000, alpha=[0.01, 1], DenseNet_tanh_2
    arch=[d+10, d, d, d], L=30k — reference final v L2 1.03e-5 at
    14-29 s/iter (cell 16).

Reference's headline "test L2 ~1.5e-7" (BASELINE.md) is the
delta_t-scaled in-path V_L2 at PINN iteration 0 (cell 10's only saved
log line); the fresh-sample test MSE on K_test_log=10000 points is the
apples-to-apples accuracy metric printed here.
"""

from common import parse_args, save

from pspde.ansatz import DenseNetTanh2
from pspde.problems import Committor
from pspde.solvers import EllipticSolver


def main():
    args = parse_args(default_L=30000,
                      extra={"--leg": dict(type=str, default="all"),
                             "--bsde-l": dict(type=int, default=30000),
                             "--steps-per-call": dict(type=int, default=100)})
    d = 10
    p = Committor(d=d)
    spc = 1 if args.smoke else args.steps_per_call
    common = dict(seed=args.seed, delta_t=0.001, lr=1e-3, K=200,
                  K_boundary=50, K_test_log=10000,
                  loss_with_stopped=False, steps_per_call=spc)
    models = []
    if args.leg in ("all", "diffusion"):
        for a0 in [1.0, 10.0, 100.0]:
            s = EllipticSolver(p, f"diffusion a0={a0:g}", N=50, L=args.L,
                               alpha=(a0, 1.0), loss_method="diffusion",
                               print_every=max(args.L // 20, 1), **common)
            s.train()
            models.append(s)
    if args.leg in ("all", "pinn"):
        for a0 in [1e-3, 1e-2, 1e-1]:
            s = EllipticSolver(p, f"PINN a0={a0:g}", N=50, L=args.L,
                               alpha=(a0, 1.0), loss_method="PINN",
                               print_every=max(args.L // 20, 1), **common)
            s.train()
            models.append(s)
    if args.leg in ("all", "bsde"):
        n_bsde = 500 if args.smoke else 5000
        L_bsde = max(args.L // 300, 10) if args.smoke else args.bsde_l
        s = EllipticSolver(p, f"BSDE N={n_bsde}", N=n_bsde, L=L_bsde,
                           alpha=(0.01, 1.0), loss_method="BSDE",
                           value_net=DenseNetTanh2(d_out=1,
                                                   arch=(d + 10, d, d, d)),
                           print_every=max(L_bsde // 20, 1), **common)
        s.train()
        models.append(s)
    for m in models:
        print(f"  {m.name}: fresh-sample test MSE {m.V_test_L2[-1]:.3e} "
              f"(best {min(m.V_test_L2):.3e}), in-path v_L2 "
              f"{m.V_L2_log[-1]:.3e}, {sum(m.times):.0f}s")
    save(models, f"Committor_d10_{args.leg}", args)


if __name__ == "__main__":
    main()
