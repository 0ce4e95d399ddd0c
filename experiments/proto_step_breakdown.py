#!/usr/bin/env python3
"""Prototype 2: where does the HJB train-step time actually go?

Round-3 finding: the transposed (K-in-lanes) layout gains only ~4% —
the MXU lane-padding theory does not explain the wall.  At
(d, K) = (100, 131072) each step touches ~15-20 arrays of 13.1M
elements on the VPU, and jax.random.normal (threefry + erfinv) is a
multi-op elementwise pipeline generated TWICE per step under remat.

Measures, per variant, path-steps/s on the transposed scan:
  * rng = threefry (status quo) / rbg (XLA RngBitGenerator HLO) /
    hoisted (noise pregenerated outside the scan, streamed from HBM)
  * remat on/off (off stores the X carries: ~1.7 GB at K=128k, N=32)
  * u_l2 tracking on/off
  * rng_only: a scan that ONLY generates the per-step noise
  * fwd_only: rollout without grad/update
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

D, DT = 100, 1.0 / 32
N = 32
ARCH = (30, 30)


def init_params(key):
    dims = [D + 1] + list(ARCH) + [D]
    keys = jax.random.split(key, 2 * (len(dims) - 1))
    layers = []
    for i in range(len(dims) - 1):
        W = 0.01 * jax.random.normal(keys[2 * i], (dims[i], dims[i + 1]))
        b = 0.01 * jax.random.normal(keys[2 * i + 1], (dims[i + 1],))
        layers.append((W, b))
    return {"z": layers, "y0": jnp.zeros((1,), jnp.float32)}


def apply_T(layers, xT):
    h = xT
    n = len(layers)
    for i, (W, b) in enumerate(layers):
        h = lax.dot_general(W, h, (((0,), (0,)), ((), ()))) + b[:, None]
        if i < n - 1:
            h = jnp.tanh(h)
    return h


def u_ref_table():
    ts = np.arange(N) * DT
    tab = np.stack([-np.exp(-(1.0 - t)) * np.ones(D) for t in ts])
    return jnp.asarray(tab, jnp.float32)


def make_step(K, rng="threefry", remat=True, track_u_l2=True,
              fwd_only=False):
    tx = optax.adam(1e-3)
    u_tab = u_ref_table()
    f32 = jnp.float32
    dt = f32(DT)
    sq_dt = jnp.sqrt(dt)

    def noise(key, n):
        if rng == "rbg":
            return jax.random.normal(jax.random.fold_in(key, n), (D, K),
                                     dtype=f32)
        return jax.random.normal(jax.random.fold_in(key, n), (D, K),
                                 dtype=f32)

    def rollout(params, key, xis=None):
        XT0 = jnp.zeros((D, K), f32)
        Y0 = jnp.broadcast_to(params["y0"], (K,)).astype(f32)

        def step(carry, inp):
            XT, Y, u_l2 = carry
            if xis is None:
                n = inp
                xi = noise(key, n)
            else:
                n, xi = inp
            t = n.astype(f32) * dt
            tX = jnp.concatenate(
                [jnp.full((1, K), 0.0, XT.dtype) + t, XT], axis=0)
            ZT = apply_T(params["z"], tX)
            c = lax.stop_gradient(-ZT)
            XT_new = lax.stop_gradient(XT + (-XT + c) * dt + xi * sq_dt)
            Zc = jnp.sum(ZT * c, axis=0)
            Zxi = jnp.sum(ZT * xi, axis=0)
            h_val = -0.5 * jnp.sum(ZT * ZT, axis=0)
            Y_new = Y + (-h_val + Zc) * dt + Zxi * sq_dt
            if track_u_l2:
                err = -lax.stop_gradient(ZT) - u_tab[n][:, None]
                u_l2 = u_l2 + jnp.sum(err * err, axis=0) * dt
            return (XT_new, Y_new, u_l2), None

        if remat:
            step = jax.checkpoint(step, prevent_cse=False)
        inps = (jnp.arange(N) if xis is None
                else (jnp.arange(N), xis))
        (XT, Y, u_l2), _ = lax.scan(
            step, (XT0, Y0, jnp.zeros((K,), f32)), inps)
        return XT, Y, u_l2

    def loss_fn(params, key, xis=None):
        XT, Y, u_l2 = rollout(params, key, xis)
        gX = jnp.sum(XT, axis=0)
        r = Y - gX
        return jnp.mean((r - jnp.mean(r)) ** 2), jnp.mean(u_l2)

    hoisted = rng == "hoisted"

    def step_core(params, opt_state, key):
        xis = None
        if hoisted:
            xis = jax.random.normal(key, (N, D, K), dtype=f32)
        if fwd_only:
            loss, u_l2 = loss_fn(params, key, xis)
            return params, opt_state, {"loss": loss, "u_l2": u_l2}
        (loss, u_l2), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, key, xis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "u_l2": u_l2}

    return step_core, tx


def make_rng_only(K, rng="threefry"):
    tx = optax.adam(1e-3)

    def step_core(params, opt_state, key):
        def body(acc, n):
            xi = jax.random.normal(jax.random.fold_in(key, n), (D, K))
            return acc + jnp.sum(xi), None
        acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(N))
        return params, opt_state, {"loss": acc, "u_l2": acc}

    return step_core, tx


def measure(step_core, tx, steps_per_call=20, n_chunks=3, K=131072,
            impl=None):
    from pspde.solvers._chunk import make_chunked_step
    params = init_params(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    chunk = make_chunked_step(step_core, steps_per_call)
    key = jax.random.PRNGKey(1)
    if impl is not None:
        key = jax.random.key(1, impl=impl)
    params, opt_state, key, aux = chunk(params, opt_state, key)
    jax.block_until_ready(aux["loss"])
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        params, opt_state, key, aux = chunk(params, opt_state, key)
    jax.block_until_ready(aux["loss"])
    dt_iter = (time.perf_counter() - t0) / (n_chunks * steps_per_call)
    return {"Mpsps": round(K * N / dt_iter / 1e6, 2),
            "iter_ms": round(1e3 * dt_iter, 3)}


def main():
    K = 131072
    out = {}
    variants = [
        ("full_threefry_remat", dict(rng="threefry", remat=True), None),
        ("full_threefry_noremat", dict(rng="threefry", remat=False), None),
        ("full_rbg_remat", dict(rng="rbg", remat=True), "rbg"),
        ("full_rbg_noremat", dict(rng="rbg", remat=False), "rbg"),
        ("full_unsafe_rbg_noremat", dict(rng="rbg", remat=False),
         "unsafe_rbg"),
        ("full_hoisted_noremat", dict(rng="hoisted", remat=False), None),
        ("full_threefry_remat_noul2",
         dict(rng="threefry", remat=True, track_u_l2=False), None),
        ("fwd_only_threefry", dict(rng="threefry", remat=False,
                                   fwd_only=True), None),
        ("fwd_only_rbg", dict(rng="rbg", remat=False, fwd_only=True),
         "rbg"),
    ]
    for name, kw, impl in variants:
        try:
            sc, tx = make_step(K, **kw)
            r = measure(sc, tx, K=K, impl=impl)
            out[name] = r
            print(json.dumps({name: r}), flush=True)
        except Exception as e:
            out[name] = f"ERR {e!r}"
            print(f"# {name} failed: {e!r}", flush=True)

    for name, impl in [("rng_only_threefry", None), ("rng_only_rbg", "rbg"),
                       ("rng_only_unsafe_rbg", "unsafe_rbg")]:
        try:
            sc, tx = make_rng_only(K)
            r = measure(sc, tx, K=K, impl=impl)
            out[name] = r
            print(json.dumps({name: r}), flush=True)
        except Exception as e:
            print(f"# {name} failed: {e!r}", flush=True)

    print("SUMMARY " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
