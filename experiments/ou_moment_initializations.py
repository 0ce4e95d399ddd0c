"""Moment-loss sensitivity to the y_0 initialization.

Reproduces "Ornstein-Uhlenbeck - linear costs - moment initializations
.ipynb": LLGC d=20, moment loss with Y_0 initialized at 0 / 10 / the
exact value v(x_0, 0).
"""

import jax
import jax.numpy as jnp
from common import parse_args, report, save

from pspde.ansatz import ScalarParam
from pspde.problems import LLGC
from pspde.solvers import HJBSolver


def main():
    args = parse_args(default_L=1000)
    problem = LLGC(d=20, T=1.0, seed=args.seed)
    v0 = float(problem.v_ref(jnp.zeros((1, 20)), 0.0)[0])
    models = []
    for name, init in [("y0 = 0", 0.0), ("y0 = 10", 10.0),
                       ("y0 exact", v0)]:
        s = HJBSolver(name, problem, L=args.L, lr=1e-3, seed=args.seed,
                      delta_t=0.01, K=500, time_approx="inner",
                      loss_method="moment", learn_Y_0=True,
                      detach_forward=True,
                      print_every=max(args.L // 10, 1),
                      early_stopping_time=None)
        # override the y_0 ansatz initialization (notebook cell 1)
        s.y0_net = ScalarParam(initial=init)
        s.params["y0"] = s.y0_net.init(jax.random.PRNGKey(args.seed),
                                       jnp.zeros((1, 1)))
        s.opt_state = s.tx.init(s.params)
        s.train()
        models.append(s)
        print(f"  {name}: Y_0 -> {s.Y_0_log[-1]:.4f} (exact {v0:.4f})")
    report(models)
    save(models, "LLGC_d20_moment_inits", args)


if __name__ == "__main__":
    main()
