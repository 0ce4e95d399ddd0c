"""Multidimensional double well with mixed metastabilities.

Reproduces "Multidim. double well - mixed metastabilities.ipynb":
DoubleWell_multidim(d=10, d_1=3, d_2=7, eta=3, kappa=5), K=500, per-dim
FD reference solutions.
"""

from common import parse_args, report, save

from pspde.problems import DoubleWell_multidim
from pspde.solvers import HJBSolver


def main():
    args = parse_args(default_L=20000)
    p = DoubleWell_multidim(d=10, d_1=3, d_2=7, T=1.0, eta=3.0, kappa=5.0)
    p.compute_reference_solution()  # builds both per-dim FD tables
    models = []
    for name, kw in [("log-variance", dict(loss_method="log-variance",
                                           detach_forward=True)),
                     ("relative entropy",
                      dict(loss_method="relative_entropy",
                           detach_forward=False))]:
        s = HJBSolver(name, p, L=args.L, lr=5e-3, seed=args.seed,
                      delta_t=0.005, K=500, time_approx="inner",
                      adaptive_forward_process=True,
                      print_every=max(args.L // 10, 1),
                      early_stopping_time=None, **kw)
        s.train()
        models.append(s)
    report(models)
    save(models, "DoubleWell_multidim_mixed", args)


if __name__ == "__main__":
    main()
