"""Allen-Cahn d=100: diffusion vs PINN vs BSDE.

Reproduces "Allen-Cahn.ipynb": GeneralSolver on AllenCahn(d=100, T=0.3)
with the diffusion loss (N=25, delta_t=1e-3, L=60k), PINN (L=60k) and
BSDE (N=300, L=80k).  The reference value v(0, x=0) = 0.052802
(literature; notebook cell 13).  Reference runtimes: 194 / 325 / 4280
minutes on a CUDA GPU (cells 14-16).
"""

import time

import jax.numpy as jnp
from common import parse_args, save

from pspde.ansatz import DenseNet
from pspde.problems import AllenCahn
from pspde.solvers import GeneralSolver

V0_REF = AllenCahn.V0_LITERATURE


def v_at_origin(s):
    return float(s._v_fn(s.params)(jnp.zeros((1, s.d)), jnp.zeros((1,)))[0])


def main():
    args = parse_args(default_L=60000)
    d = 100
    p = AllenCahn(d=d, T=0.3)
    # notebook cell 1: sampling ball radius 7, cube-direction x uniform
    # radius (uniform_square), net arch [110, 110, 50]
    from pspde.problems.base import Geometry
    p.geometry = Geometry(kind="unbounded", boundary_distance=7.0)
    net = DenseNet(d_out=1, arch=(110, 110, 50))
    configs = [
        ("diffusion", dict(loss_method="diffusion", N=25, delta_t=1e-3,
                           L=args.L)),
        ("PINN", dict(loss_method="PINN", N=25, delta_t=1e-3, L=args.L)),
        ("BSDE", dict(loss_method="BSDE", N=300, delta_t=1e-3,
                      L=args.L * 4 // 3)),
    ]
    models = []
    for name, kw in configs:
        t0 = time.time()
        s = GeneralSolver(p, name, seed=args.seed, lr=1e-3, K=200,
                          K_boundary=50, value_net=net,
                          uniform_square=True,
                          print_every=max(kw["L"] // 20, 1), **kw)
        s.train()
        mins = (time.time() - t0) / 60
        v0 = v_at_origin(s)
        print(f"  {name}: v(0,0) = {v0:.6f} (ref {V0_REF}), "
              f"rel err {abs(v0 - V0_REF) / V0_REF:.2%}, {mins:.1f} min")
        models.append(s)
    save(models, "AllenCahn_d100", args)


if __name__ == "__main__":
    main()
