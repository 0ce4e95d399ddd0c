"""Relative statistical errors of loss estimators vs dimension.

Reproduces "Compare relative errors of losses.ipynb": single-pass
(K=5*10^7) estimator statistics on sign-flipped LLGC for d = 1..15,
showing cross-entropy relative error ~ c^d growth vs the
dimension-independent log-variance estimator (reference: ~2.4 * 1.30^d
vs flat ~1.45; BASELINE.md last row).
"""

import jax
import jax.numpy as jnp
from common import parse_args

from pspde.ansatz import DenseNet
from pspde.eval import loss_estimator_statistics, relative_error
from pspde.problems import LLGC


def main():
    args = parse_args(default_L=1,
                      extra={"--K": dict(type=int, default=50_000_000)})
    K = 500_000 if args.smoke else args.K
    key = jax.random.PRNGKey(args.seed)
    print(f"K = {K}")
    for d in range(1, 16, 2):
        p = LLGC(d=d, T=1.0, off_diag=0.1, h_sign=+1.0, seed=args.seed + d)
        net = DenseNet(d_out=d)
        params = {"z": net.init(key, jnp.zeros((1, d + 1)))}

        def control_fn(prm, X, n, t):
            tX = jnp.concatenate(
                [jnp.full((X.shape[0], 1), 0.0) + t, X], axis=1)
            return net.apply(prm["z"], tX), None

        stats = loss_estimator_statistics(p, control_fn, params, K=K,
                                          delta_t=0.005, key=key,
                                          n_chunks=max(1, K * d
                                                       // 100_000_000))
        print(f"d={d:2d}: RE[cross-entropy] = "
              f"{relative_error(stats, 'CE_detach'):9.3f}   "
              f"RE[log-variance] = {relative_error(stats, 'var'):7.3f}")


if __name__ == "__main__":
    main()
