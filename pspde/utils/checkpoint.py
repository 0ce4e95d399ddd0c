"""Checkpoint / resume via orbax (params + optimizer state).

Upgrades the reference's ``save_networks`` / ``load_networks``
(solver.py:313-332), which stored only network weights (optimizer state
was lost and Adam restarted on resume); here the optax state is saved
alongside the parameters.
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp


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
