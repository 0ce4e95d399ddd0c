"""Nonlinear parabolic problem with Neumann boundary data, d=20.

Reproduces "Nonlinear toy problem - parabolic with Neumann.ipynb":
GeneralSolver on ExponentialOnSphereNonlinearParabolic(d=20) with
Neumann spatial boundary loss, alpha2 in {0.1, 1, 10, 100}.
"""

from common import parse_args, save

from pspde.problems import ExponentialOnSphereNonlinearParabolic
from pspde.solvers import GeneralSolver


def main():
    args = parse_args(default_L=100000,
                      extra={"--anneal": dict(action="store_true")})
    p = ExponentialOnSphereNonlinearParabolic(d=20, T=1.0, alpha=1.0)
    p.boundary_type = "Neumann"
    models = []
    spc = 1 if args.smoke else 100
    lr = 1e-3
    if args.anneal:
        # round 3 (committor / elliptic-d50 finding): the fresh-sample
        # metric at these budgets is optimization-noise-limited at fixed
        # lr; a cosine anneal removes the Adam jitter floor
        import optax
        lr = optax.cosine_decay_schedule(1e-3, args.L, alpha=1e-2)
    for a2 in [0.1, 1.0, 10.0, 100.0]:
        s = GeneralSolver(p, f"diffusion a2={a2:g}", seed=args.seed,
                          delta_t=1e-3, N=20, lr=lr, L=args.L, K=200,
                          K_boundary=50, alpha=(1.0, 1.0, a2),
                          loss_method="diffusion", K_test_log=10000,
                          steps_per_call=spc,
                          print_every=max(args.L // 20, 1))
        s.train()
        models.append(s)
        print(f"  a2={a2:g}: test L2 {s.V_test_L2[-1]:.3e} "
              f"rel_abs {s.V_test_rel_abs[-1]:.3e} "
              f"(best {min(s.V_test_rel_abs):.3e})")
    save(models, "parabolic_neumann_d20"
         + ("_annealed" if args.anneal else ""), args)


if __name__ == "__main__":
    main()
