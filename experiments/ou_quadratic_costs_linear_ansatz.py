"""LQGC with an LQ-structured linear control ansatz.

Reproduces "Ornstein-Uhlenbeck - quadratic costs - linear ansatz.ipynb":
LQGC d=10, T=0.5, per-step Linear ansatz u = Q^{-1} B^T F_n x
(time_approx='outer'), plus the random-start (random_X_0) study.
"""

from common import parse_args, report, save

from pspde.ansatz import LinearLQ
from pspde.problems import LQGC
from pspde.solvers import HJBSolver


def main():
    args = parse_args(default_L=2000)
    problem = LQGC(d=10, T=0.5, delta_t=0.05, seed=args.seed)
    models = []
    for name, random_x0 in [("linear ansatz", False),
                            ("linear ansatz random X_0", True)]:
        s = HJBSolver(name, problem, L=args.L, lr=1e-2, seed=args.seed,
                      delta_t=0.05, K=512, time_approx="outer",
                      loss_method="log-variance", detach_forward=True,
                      control_net=LinearLQ(B=problem.B, Q=problem.Q),
                      random_X_0=random_x0, learn_Y_0=False,
                      print_every=max(args.L // 10, 1),
                      early_stopping_time=None)
        s.train()
        models.append(s)
    report(models)
    save(models, "LQGC_d10_linear", args)


if __name__ == "__main__":
    main()
