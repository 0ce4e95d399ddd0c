"""Checkpoint / resume via orbax (params + optimizer state).

Upgrades the reference's ``save_networks`` / ``load_networks``
(solver.py:313-332), which stored only network weights (optimizer state
was lost and Adam restarted on resume); here the optax state is saved
alongside the parameters.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


def _unwrap_key(key):
    """(raw_uint32_data, impl_name_or_None): typed PRNG keys (e.g. the
    solvers' rng_impl='rbg' mode) are stored as their raw key data plus
    the impl name, since orbax cannot serialize extended dtypes."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return jax.random.key_data(key), str(jax.random.key_impl(key))
    return key, None


def save_params(path: str, params, opt_state=None):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_params(path: str, params_like, opt_state_like=None):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = {"params": params_like}
    if opt_state_like is not None:
        target["opt_state"] = opt_state_like
    restored = ckptr.restore(path, target)
    return restored["params"], restored.get("opt_state", opt_state_like)


def save_training_state(path: str, solver):
    """Full failure-recovery checkpoint (SURVEY.md section 5.3/5.4):
    params + optimizer state + the training PRNG key (orbax) and the step
    counter + metric logs (JSON sidecar).  ``load_training_state`` then
    resumes ``train()`` mid-run with the identical trajectory the
    uninterrupted run would have produced (same noise stream, same Adam
    moments, contiguous logs)."""
    import json

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    key_data, key_impl = _unwrap_key(solver._train_key)
    ckptr.save(path, {"params": solver.params,
                      "opt_state": solver.opt_state,
                      "train_key": key_data}, force=True)
    ckptr.wait_until_finished()
    logs = {name: getattr(solver, name) for name in solver._LOG_ATTRS}
    with open(path + ".logs.json", "w") as f:
        json.dump({"step": solver.step, "logs": logs,
                   "key_impl": key_impl}, f)
    return path


def load_training_state(path: str, solver):
    """Restore a ``save_training_state`` checkpoint into `solver`."""
    import json

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    key_like, _ = _unwrap_key(solver._train_key)
    restored = ckptr.restore(path, {"params": solver.params,
                                    "opt_state": solver.opt_state,
                                    "train_key": key_like})
    with open(path + ".logs.json") as f:
        meta = json.load(f)
    solver.params = restored["params"]
    solver.opt_state = restored["opt_state"]
    solver._train_key = restored["train_key"]
    if meta.get("key_impl"):
        solver._train_key = jax.random.wrap_key_data(
            restored["train_key"], impl=meta["key_impl"])
    solver.step = int(meta["step"])
    for name, value in meta["logs"].items():
        setattr(solver, name, value)
    return solver
