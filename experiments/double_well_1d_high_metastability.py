"""1-d double well, high metastability (eta=3, kappa=5).

Reproduces "Double well - 1d - high metastability.ipynb": four losses
head-to-head at K=10^4, delta_t=0.005, lr=0.05, plus the K=10^7-path IS
validation of the learned control (reference output: naive RE 62.9 vs
IS RE 1.94; barrier crossings 8.73M/10M vs 2021/10M).
"""

import jax
import jax.numpy as jnp
from common import parse_args, report, save

from pspde.eval import importance_sampling
from pspde.problems import DoubleWell
from pspde.solvers import HJBSolver

LOSSES = [
    ("moment", dict(loss_method="moment", detach_forward=True,
                    learn_Y_0=True)),
    ("log-variance", dict(loss_method="log-variance", detach_forward=True)),
    ("relative entropy", dict(loss_method="relative_entropy",
                              detach_forward=False)),
    ("cross-entropy", dict(loss_method="cross_entropy",
                           detach_forward=True)),
]


def main():
    args = parse_args(default_L=1000,
                      extra={"--long": dict(action="store_true")})
    dw = DoubleWell(d=1, T=1.0, eta=3.0, kappa=5.0)
    dw.compute_reference_solution()
    models = []
    if args.long:
        # round 3: can the LEARNED control close on the optimal (FD)
        # control's IS quality (reference cell 3: RE 1.94, 87.3%
        # crossings)?  5x budget + cosine lr anneal on the log-variance
        # leg, then the full 10M-path IS validation with the LEARNED
        # control (the head-to-head table's IS runs use the FD control).
        import optax
        L = max(args.L, 5000)
        s = HJBSolver("log-variance-annealed", dw, L=L,
                      lr=optax.cosine_decay_schedule(0.05, L, alpha=0.02),
                      seed=args.seed, delta_t=0.005, K=10_000,
                      time_approx="inner", adaptive_forward_process=True,
                      detach_forward=True, loss_method="log-variance",
                      metastability_logs=(jnp.ones(1), 0.5),
                      print_every=max(L // 10, 1),
                      early_stopping_time=None, steps_per_call=20)
        s.train()
        print(f"  annealed: u_L2 {s.u_L2_loss[0]:.2f} -> "
              f"{s.u_L2_loss[-1]:.3f}, metastable fraction "
              f"{s.particles_close_to_target[-1]:.3f}")
        K_is = 100_000 if args.smoke else 10_000_000
        print(f"=== IS with the LEARNED annealed control, K={K_is} ===")
        importance_sampling(dw, s, K_is, control="approx",
                            simulate_naive=True, verbose=True,
                            cross_statistics=0.0,
                            key=jax.random.PRNGKey(7))
        save([s], "DoubleWell_high_metastability_annealed", args)
        return
    for name, kw in LOSSES:
        s = HJBSolver(name, dw, L=args.L, lr=0.05, seed=args.seed,
                      delta_t=0.005, K=10_000,
                      IS_variance_K=0 if args.smoke else 200_000,
                      IS_variance_iter=5, time_approx="inner",
                      adaptive_forward_process=True,
                      metastability_logs=(jnp.ones(1), 0.5),
                      print_every=max(args.L // 10, 1),
                      early_stopping_time=None, **kw)
        s.train()
        models.append(s)
        print(f"  {name}: metastable fraction "
              f"{s.particles_close_to_target[-1]:.3f}")
    report(models)

    K_is = 100_000 if args.smoke else 10_000_000
    print(f"=== IS validation with the optimal (FD) control, K={K_is} ===")
    importance_sampling(dw, models[1], K_is, control="true",
                        simulate_naive=True, verbose=True,
                        cross_statistics=0.0, key=jax.random.PRNGKey(7))
    save(models, "DoubleWell_high_metastability", args)


if __name__ == "__main__":
    main()
