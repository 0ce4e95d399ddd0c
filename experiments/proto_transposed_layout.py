#!/usr/bin/env python3
"""Prototype: transposed (K-in-lanes) HJB training step vs current layout.

Round-2 bottleneck analysis (RESULTS.md): the hot matmuls are
(K, 131) @ (131, 30) whose 30-wide outputs lane-pad to 128, wasting >75%
of MXU lanes.  This prototype measures the same train step (LLGC d=100,
log-variance, detach_forward, learn_Y_0, TanhMLP control) with the path
state carried TRANSPOSED as (d, K): every net matmul becomes
W^T (30, 131) @ X^T (131, K) via dot_general (no materialized
transposes), so the huge K axis fills the lane dimension densely.

Self-terminating; prints one JSON line per variant (unbuffered run:
python3 -u).  Runs on the real TPU chip.
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


def init_params(key, dtype=jnp.float32):
    """TanhMLP params (N(0,0.01) weights+bias) + scalar y0, as a pytree."""
    dims = [D + 1] + list(ARCH) + [D]
    keys = jax.random.split(key, 2 * (len(dims) - 1))
    layers = []
    for i in range(len(dims) - 1):
        W = 0.01 * jax.random.normal(keys[2 * i], (dims[i], dims[i + 1]),
                                     jnp.float32)
        b = 0.01 * jax.random.normal(keys[2 * i + 1], (dims[i + 1],),
                                     jnp.float32)
        layers.append((W, b))
    return {"z": layers, "y0": jnp.zeros((1,), jnp.float32)}


def apply_T(layers, xT, compute_dtype):
    """Transposed TanhMLP: xT (d_in, K) -> (d_out, K); lanes = K."""
    h = xT.astype(compute_dtype)
    n = len(layers)
    for i, (W, b) in enumerate(layers):
        h = lax.dot_general(W.astype(compute_dtype), h,
                            (((0,), (0,)), ((), ()))) + \
            b.astype(compute_dtype)[:, None]
        if i < n - 1:
            h = jnp.tanh(h)
    return h


def u_ref_table():
    # LLGC closed form: u*(t) = -B^T e^{A^T (T-t)} alpha with A=-I, B=I
    ts = np.arange(N) * DT
    tab = np.stack([-np.exp(-(1.0 - t)) * np.ones(D) for t in ts])
    return jnp.asarray(tab, jnp.float32)


def make_step_dk(K, dtype):
    """One transposed-layout train step (params, opt, key) -> ..."""
    tx = optax.adam(1e-3)
    u_tab = u_ref_table()
    f32 = jnp.float32
    dt = f32(DT)
    sq_dt = jnp.sqrt(dt)

    def rollout(params, key):
        XT0 = jnp.zeros((D, K), dtype)
        Y0 = jnp.broadcast_to(params["y0"], (K,)).astype(f32)

        def step(carry, n):
            XT, Y, u_l2 = carry
            t = n.astype(f32) * dt
            tX = jnp.concatenate(
                [jnp.full((1, K), 0.0, XT.dtype) + t, XT], axis=0)
            ZT = apply_T(params["z"], tX, dtype)
            c = lax.stop_gradient(-ZT)
            xi = jax.random.normal(jax.random.fold_in(key, n), (D, K),
                                   dtype=f32)
            # b(x) = -x, sigma = I
            XT_new = lax.stop_gradient(
                (XT + (-XT + c) * dt + xi * sq_dt).astype(dtype))
            Z32 = ZT.astype(f32)
            Zc = jnp.sum(Z32 * c.astype(f32), axis=0)
            Zxi = jnp.sum(Z32 * xi, axis=0)
            h_val = -0.5 * jnp.sum(Z32 * Z32, axis=0)
            Y_new = Y + (-h_val + Zc) * dt + Zxi * sq_dt
            err = -lax.stop_gradient(Z32) - u_tab[n][:, None]
            u_l2 = u_l2 + jnp.sum(err * err, axis=0) * dt
            return (XT_new, Y_new, u_l2), None

        step_r = jax.checkpoint(step, prevent_cse=False)
        (XT, Y, u_l2), _ = lax.scan(
            step_r, (XT0, Y0, jnp.zeros((K,), f32)), jnp.arange(N))
        return XT, Y, u_l2

    def loss_fn(params, key):
        XT, Y, u_l2 = rollout(params, key)
        gX = jnp.sum(XT, axis=0).astype(f32)  # alpha = ones
        r = Y - gX
        loss = jnp.mean((r - jnp.mean(r)) ** 2)
        return loss, jnp.mean(u_l2)

    def step_core(params, opt_state, key):
        (loss, u_l2), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "u_l2": u_l2}

    return step_core, tx


def measure_dk(K, dtype, steps_per_call=20, n_chunks=3, fwd_only=False):
    from pspde.solvers._chunk import make_chunked_step
    step_core, tx = make_step_dk(K, dtype)
    params = init_params(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    if fwd_only:
        # forward envelope: loss only, no grad/update
        core = make_step_dk(K, dtype)[0]

    chunk = make_chunked_step(step_core, steps_per_call)
    key = jax.random.PRNGKey(1)
    params, opt_state, key, aux = chunk(params, opt_state, key)
    jax.block_until_ready(aux["loss"])
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        params, opt_state, key, aux = chunk(params, opt_state, key)
    jax.block_until_ready(aux["loss"])
    dt_iter = (time.perf_counter() - t0) / (n_chunks * steps_per_call)
    return {"path_steps_per_sec": K * N / dt_iter,
            "iter_ms": 1e3 * dt_iter,
            "loss": float(aux["loss"][-1]), "u_l2": float(aux["u_l2"][-1])}


def main():
    out = {}
    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)

    # transposed scan, f32 / bf16, K=131072
    for name, dtype, K, spc in [
        ("dk_f32_K128k_spc20", jnp.float32, 131072, 20),
        ("dk_bf16_K128k_spc20", jnp.bfloat16, 131072, 20),
        ("dk_f32_K256k_spc20", jnp.float32, 262144, 20),
        ("dk_bf16_K256k_spc20", jnp.bfloat16, 262144, 20),
        ("dk_f32_K64k_spc20", jnp.float32, 65536, 20),
        ("dk_f32_K128k_spc50", jnp.float32, 131072, 50),
        ("dk_bf16_K128k_spc50", jnp.bfloat16, 131072, 50),
        ("dk_bf16_K512k_spc20", jnp.bfloat16, 524288, 20),
    ]:
        try:
            r = measure_dk(K, dtype, steps_per_call=spc)
            out[name] = round(r["path_steps_per_sec"] / 1e6, 2)
            print(json.dumps({name: r}), flush=True)
        except Exception as e:
            out[name] = f"ERR {e!r}"
            print(f"# {name} failed: {e!r}", flush=True)

    # baseline (current layout) for a same-process comparison point
    import bench
    for name, dtype in [("kd_f32_K128k_spc20", jnp.float32),
                        ("kd_bf16_K128k_spc20", jnp.bfloat16)]:
        r = bench.measure(dtype)
        out[name] = round(r["path_steps_per_sec"] / 1e6, 2)
        print(json.dumps({name: r}), flush=True)

    print("SUMMARY " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
