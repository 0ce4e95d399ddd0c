"""Ornstein-Uhlenbeck with linear terminal costs — loss-zoo head-to-head.

Reproduces "Ornstein-Uhlenbeck - linear costs.ipynb": LLGC at d = 1, 2, 40
trained with moment / variance / log-variance / relative-entropy /
cross-entropy losses (K=200-500, delta_t=0.01, time_approx='inner',
adaptive forward process, IS diagnostics with K=20000).
"""

from common import parse_args, report, save

from pspde.problems import LLGC
from pspde.solvers import HJBSolver

LOSSES = [
    ("moment", dict(loss_method="moment", detach_forward=True,
                    learn_Y_0=True)),
    ("variance", dict(loss_method="variance", detach_forward=True)),
    ("log-variance", dict(loss_method="log-variance", detach_forward=True)),
    ("relative entropy", dict(loss_method="relative_entropy",
                              detach_forward=False)),
    ("cross-entropy", dict(loss_method="cross_entropy",
                           detach_forward=True)),
]


def run(d, L, K, lr, seed, IS_K=20000):
    problem = LLGC(d=d, T=1.0, off_diag=0.1 if d > 1 else 0.0, seed=seed)
    models = []
    for name, kw in LOSSES:
        s = HJBSolver(name, problem, L=L, lr=lr, seed=seed, delta_t=0.01,
                      K=K, IS_variance_K=IS_K, IS_variance_iter=10,
                      print_every=max(L // 10, 1), time_approx="inner",
                      adaptive_forward_process=True,
                      early_stopping_time=None, **kw)
        s.train()
        models.append(s)
    return models


def main():
    args = parse_args(default_L=500)
    for d, K, lr in [(1, 200, 1e-2), (2, 200, 1e-2), (40, 500, 1e-3)]:
        L = args.L if d < 40 else args.L * 4
        print(f"=== LLGC d={d} ===")
        models = run(d, L, K, lr, args.seed,
                     IS_K=2000 if args.smoke else 20000)
        report(models)
        save(models, f"LLGC_d{d}", args)


if __name__ == "__main__":
    main()
