#!/usr/bin/env python3
"""Root-cause the parabolic-Neumann d=20 accuracy floor (VERDICT r3 item 4).

Round 3 measured a 2.3e-2 fresh-MSE floor on
ExponentialOnSphereNonlinearParabolic(d=20) with the Neumann spatial
boundary loss (solver.py:1068-1074 semantics) where sibling
manufactured problems reach 1e-4..1e-7, and hypothesized a
"loss-model mismatch (boundary-weight bias)" without a controlled
experiment.  This script runs the ablation ladder at a FIXED seed:

  a. neumann-a2-{0.1,1,10,100}   the boundary-weight sweep
  b. oracle-dirichlet            same problem, boundary_type='Dirichlet'
                                 (g(x, t) = v_true on the sphere) — if
                                 the error collapses, the Neumann term
                                 itself is the bias source
  c. no-spatial-boundary (a2=0)  is the boundary term load-bearing or
                                 harmful at this budget?
  d. dt-ablation                 dt 1e-3 -> 2.5e-4 at the winning a2 —
                                 if the floor drops ~2x the bias is the
                                 O(sqrt(dt)) boundary-overshoot of the
                                 stopped Euler scheme, not the loss

Metric: best fresh-sample V_test_L2 / mean rel-abs over the run
(K_test_log fresh points, compute_test_error semantics).

Usage: python3 experiments/proto_neumann_ablation.py [--smoke] [--L N]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pspde.utils import enable_compilation_cache


def run_leg(name, args, *, a2=1.0, boundary_type="Neumann", dt=1e-3,
            L=None, lr=1e-3, anneal=True):
    import optax
    from pspde.problems import ExponentialOnSphereNonlinearParabolic
    from pspde.solvers import GeneralSolver

    L = L or args.L
    p = ExponentialOnSphereNonlinearParabolic(d=20, T=1.0, alpha=1.0)
    p.boundary_type = boundary_type
    if anneal:
        lr = optax.cosine_decay_schedule(lr, L, alpha=1e-2)
    s = GeneralSolver(p, name, seed=args.seed, delta_t=dt, N=20, lr=lr,
                      L=L, K=200, K_boundary=50, alpha=(1.0, 1.0, a2),
                      loss_method="diffusion", K_test_log=10000,
                      steps_per_call=1 if args.smoke else 100,
                      verbose=False)
    t0 = time.time()
    s.train()
    r = {"test_L2_final": float(s.V_test_L2[-1]),
         "test_L2_best": float(min(s.V_test_L2)),
         "rel_abs_best": float(min(s.V_test_rel_abs)),
         "secs": round(time.time() - t0, 1)}
    print(json.dumps({name: r}), flush=True)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--L", type=int, default=20000)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    if args.smoke:
        args.L = 200
    enable_compilation_cache()

    out = {}
    legs = [
        ("neumann-a2-0", dict(a2=0.0)),
        ("neumann-a2-0.1", dict(a2=0.1)),
        ("neumann-a2-1", dict(a2=1.0)),
        ("neumann-a2-10", dict(a2=10.0)),
        ("neumann-a2-100", dict(a2=100.0)),
        ("oracle-dirichlet-a2-1", dict(a2=1.0, boundary_type="Dirichlet")),
    ]
    for name, kw in legs:
        try:
            out[name] = run_leg(name, args, **kw)
        except Exception as e:
            out[name] = {"error": repr(e)[:200]}
            print(json.dumps({name: out[name]}), flush=True)

    # d: dt ablation at the best Neumann weight
    neu = {k: v for k, v in out.items()
           if k.startswith("neumann-a2") and "test_L2_best" in v}
    if neu:
        best = min(neu, key=lambda k: neu[k]["test_L2_best"])
        a2 = float(best.rsplit("-", 1)[1])
        for dt in (5e-4, 2.5e-4):
            name = f"neumann-a2-{a2:g}-dt{dt:g}"
            try:
                out[name] = run_leg(name, args, a2=a2, dt=dt)
            except Exception as e:
                print(json.dumps({name: repr(e)[:200]}), flush=True)
        name = f"oracle-dirichlet-dt{2.5e-4:g}"
        try:
            out[name] = run_leg(name, args, boundary_type="Dirichlet",
                                dt=2.5e-4)
        except Exception as e:
            print(json.dumps({name: repr(e)[:200]}), flush=True)
    print(json.dumps({"summary": {k: v.get("test_L2_best")
                                  for k, v in out.items()}}))


if __name__ == "__main__":
    main()
