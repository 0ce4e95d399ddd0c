"""Shared experiment harness.

Each experiment script reproduces one reference notebook
(/root/reference/experiments/*) as a runnable configuration of the pspde
library.  ``--smoke`` shrinks iteration counts ~100x for quick validation;
``--L`` overrides the gradient-step budget; results (loss/error logs) are
saved as JSON next to the script via pspde.eval.save_exp_logs.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(default_L: int, extra=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=default_L,
                    help="gradient steps")
    ap.add_argument("--smoke", action="store_true",
                    help="~100x shorter run for validation")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--no-save", action="store_true")
    if extra:
        for name, kw in extra.items():
            ap.add_argument(name, **kw)
    args = ap.parse_args()
    if args.smoke:
        args.L = max(50, default_L // 100)
    from pspde.utils import enable_compilation_cache
    enable_compilation_cache()  # re-runs of a config skip XLA compiles
    return args


def save(models, name, args):
    if args.no_save:
        return
    from pspde.eval import save_exp_logs
    out = save_exp_logs(models, name,
                        log_dir=os.path.join(os.path.dirname(
                            os.path.abspath(__file__)), "logs"))
    print("logs saved to", out)


def report(models, attr="u_L2_loss"):
    for m in models:
        log = getattr(m, attr)
        if log:
            print(f"  {m.name}: final {attr} = {log[-1]:.4e}")
