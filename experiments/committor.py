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
    if args.leg == "long":
        # VERDICT r3 item 3: can the notebook's exact DEFAULT relu^2
        # DenseNet close the diffusion-leg fresh-MSE gap with a longer
        # budget + lr annealing (the notebook's own config, 10x budget)?
        import optax
        L = 300000 if args.L == 30000 else args.L
        for a0 in [10.0, 100.0]:
            cc = dict(common)
            cc["lr"] = optax.cosine_decay_schedule(1e-3, L, alpha=1e-2)
            s = EllipticSolver(p, f"diffusion-long a0={a0:g}", N=50, L=L,
                               alpha=(a0, 1.0), loss_method="diffusion",
                               print_every=max(L // 20, 1), **cc)
            s.train()
            models.append(s)
    if args.leg == "picard":
        # Train the exact notebook diffusion leg (headline a0=10, default
        # net), then refine it with the stopped-domain Picard corrector
        # (pspde.eval.picard_refine_elliptic; h=0 for the committor, so
        # one stage reaches the MC/regression floor).
        import jax
        import jax.numpy as jnp
        from pspde.eval import picard_refine_elliptic
        from pspde.rollout.sampling import sample_domain
        s = EllipticSolver(p, "diffusion a0=10 + picard", N=50, L=args.L,
                           alpha=(10.0, 1.0), loss_method="diffusion",
                           print_every=max(args.L // 20, 1), **common)
        s.train()
        models.append(s)
        Xt = sample_domain(jax.random.PRNGKey(99), p.geometry, 100000, d)
        vr = p.v_ref(Xt)
        mse0 = float(jnp.mean((s.V_net.apply(s.params, Xt)[:, 0]
                               - vr) ** 2))
        for stages in (1, 2):
            refined, hist = picard_refine_elliptic(
                p, s.V_net, s.params, n_stages=stages, M=8192,
                K_inner=1024, N_cap=8192, delta_t=1e-3, reg_steps=5000,
                key=jax.random.PRNGKey(args.seed))
            mse = float(jnp.mean((s.V_net.apply(refined, Xt)[:, 0]
                                  - vr) ** 2))
            print(f"  picard {stages}-stage: fresh MSE {mse0:.3e} -> "
                  f"{mse:.3e}  (history {hist})")
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
