"""Nonlinear elliptic toy problem with Dirichlet data, d=50.

Reproduces "Nonlinear toy problem - elliptic with Dirichlet.ipynb":
ExponentialOnBallNonlinearSin(d=50), PINN alpha-sweep + uniform_square
sampling ablation vs diffusion loss vs BSDE (N up to 200,000 with remat).
Reference: diffusion v-L2 ~3e-8..1e-7 at 0.26-0.41 s/iter (L=220k).

``--leg`` selects a subset (all / diffusion / pinn / bsde) so the long
parity runs can be executed one at a time on the chip.

BSDE note: the reference caps trajectories at N=200,000 steps but its
eager loop BREAKS as soon as every path has exited the unit ball
(solver.py:735-736) — at d=50, delta_t=1e-3 that happens within a few
hundred steps, so the cap is never reached.  A fixed-length scan cannot
break early; ``--bsde-n`` sets the compiled cap (default 4096, far beyond
the exit-time tail), and ``not_all_stopped_count`` records any cap hits
(0 expected), making the run semantically identical to the reference's
N=200,000 configuration.  Pass --bsde-n 200000 to compile the full
reference cap (same results, ~50x the wasted steps).
"""

from common import parse_args, save

from pspde.problems import ExponentialOnBallNonlinearSin
from pspde.solvers import EllipticSolver


def main():
    args = parse_args(default_L=220000,
                      extra={"--bsde-n": dict(type=int, default=4096),
                             "--leg": dict(type=str, default="all"),
                             "--steps-per-call": dict(type=int, default=200)})
    d = 50
    p = ExponentialOnBallNonlinearSin(d=d, alpha=1.0)
    models = []
    spc = 1 if args.smoke else args.steps_per_call
    if args.leg in ("all", "diffusion"):
        s = EllipticSolver(p, "diffusion", seed=args.seed, delta_t=1e-3,
                           N=20, lr=1e-3, L=args.L, K=200, K_boundary=50,
                           loss_method="diffusion", K_test_log=10000,
                           steps_per_call=spc,
                           print_every=max(args.L // 50, 1))
        s.train()
        models.append(s)
    if args.leg in ("all", "pinn"):
        for a0 in [0.1, 1.0, 10.0]:
            for uniform_square in [False, True]:
                s = EllipticSolver(
                    p, f"PINN a0={a0:g} us={uniform_square}", seed=args.seed,
                    delta_t=1e-3, N=20, lr=1e-3, L=args.L // 4, K=200,
                    K_boundary=50, alpha=(a0, 1.0), loss_method="PINN",
                    uniform_square=uniform_square, K_test_log=10000,
                    steps_per_call=spc,
                    print_every=max(args.L // 20, 1))
                s.train()
                models.append(s)
    if args.leg in ("all", "bsde"):
        n_bsde = 2000 if args.smoke else args.bsde_n
        s = EllipticSolver(p, f"BSDE N={n_bsde}", seed=args.seed,
                           delta_t=1e-3, N=n_bsde, lr=1e-3,
                           L=max(args.L // 100, 5), K=200, K_boundary=50,
                           loss_method="BSDE", K_test_log=10000,
                           print_every=max(args.L // 2000, 1), remat=True)
        s.train()
        models.append(s)
        print(f"  BSDE cap hits (not all stopped): "
              f"{s.not_all_stopped_count}/{len(s.loss_log)}")
    for m in models:
        print(f"  {m.name}: test L2 {m.V_test_L2[-1]:.3e} "
              f"(best {min(m.V_test_L2):.3e}), in-path v_L2 "
              f"{m.V_L2_log[-1]:.3e}, {sum(m.times):.0f}s")
    save(models, f"elliptic_dirichlet_d50_{args.leg}", args)


if __name__ == "__main__":
    main()
