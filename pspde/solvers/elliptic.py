"""Elliptic boundary-value solver (TPU-native rebuild of
``EllipticSolver``, solver.py:560-931).

One jitted step per iteration: boundary + domain sampling, the stopped
Euler-Maruyama rollout with Z = sigma^T grad V per step (second-order
autodiff through the scan replaces the reference's per-step
``autograd.grad(..., create_graph=True)``, solver.py:725-729), loss
assembly per method (diffusion / BSDE / BSDE-2 / BSDE-3 / BSDE-4 / PINN),
one optax update.  PINN mode evaluates batched Hessians in one vmapped XLA
computation instead of the reference's per-sample Python loop
(solver.py:891-894).
"""

from __future__ import annotations

from datetime import date

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ansatz import DenseNet
from ..losses.pinn import elliptic_pinn_residual
from ..parallel.mesh import constrain_batch
from ..rollout.sampling import inside_fn, sample_boundary, sample_domain
from ..rollout.sde import (StoppedRolloutConfig, stopped_rollout,
                           stopped_rollout_dk)
from ._chunk import run_training


def _unbiased_var(x):
    n = x.shape[0]
    return jnp.var(x) * n / max(n - 1, 1)


def masked_mean(x, mask):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


class EllipticSolver:
    """Constructor kwargs mirror solver.py:562-566."""

    _LOG_ATTRS = ("loss_log", "loss_log_domain", "loss_log_boundary",
                  "V_L2_log", "V_test_L2", "V_test_abs", "V_test_rel_abs",
                  "K_log", "times", "not_all_stopped_count")

    def __init__(self, problem, name, seed=42, delta_t=0.01, N=50, lr=0.001,
                 L=100000, K=200, K_boundary=50, alpha=(1.0, 1.0),
                 adaptive_forward_process=False, detach_forward=True,
                 print_every=100, verbose=True, approx_method="Y",
                 sample_center=False, loss_method="diffusion",
                 loss_with_stopped=False, K_test_log=None,
                 PINN_log_variance=False, log_loss_parts=False,
                 boundary_loss=True, boundary_type="Dirichlet",
                 variance_moment_split=False, full_hessian=False,
                 uniform_square=False, value_net=None, remat=None,
                 mesh=None, steps_per_call="auto", rng_impl="threefry",
                 layout="auto", rollout_mode="scan", fused_tile=None,
                 fused_unroll=None, fused_rng=None):
        self.problem = problem
        self.name = name
        self.date = date.today().strftime("%Y-%m-%d")
        self.d = problem.d
        self.seed = seed
        self.delta_t = float(delta_t)
        self.N = N
        self.lr = lr
        self.L = L
        self.K = K
        self.K_boundary = K_boundary
        self.alpha = tuple(alpha)
        self.boundary_type = boundary_type

        self.adaptive_forward_process = adaptive_forward_process
        self.detach_forward = detach_forward
        if approx_method != "Y":
            # the reference DEFINES approx_method='Z' (solver.py:723-729)
            # but its train loop only ever evaluates self.V, so the
            # branch is dead code there; rebuilding it would be untestable
            # parity theater — fail loudly instead (README deviations)
            raise ValueError(
                "approx_method=%r is not supported: the reference's 'Z' "
                "branch is dead code (its training loop only uses V, "
                "solver.py:723-729); use approx_method='Y'"
                % (approx_method,))
        self.approx_method = approx_method
        self.sample_center = sample_center
        self.loss_method = loss_method
        self.loss_with_stopped = loss_with_stopped
        self.boundary_loss = boundary_loss
        self.PINN_log_variance = PINN_log_variance
        self.variance_moment_split = variance_moment_split
        self.full_hessian = full_hessian
        self.uniform_square = uniform_square
        self.print_every = print_every
        self.verbose = verbose
        self.log_loss_parts = log_loss_parts
        # With a mesh, the K-path ensemble axis is sharded over 'dp'
        # (constraints on the rollout start state; GSPMD turns the loss
        # means into all-reduces); params stay replicated.
        self.mesh = mesh
        self.steps_per_call = steps_per_call
        self.remat = (N > 512) if remat is None else remat

        # rng_impl='rbg' swaps the in-rollout noise / sampling draws for
        # XLA's RngBitGenerator (cf. HJBSolver rng_impl: threefry bit
        # generation is a first-order VPU cost at large K); layout='dk'
        # carries the stopped-rollout path state transposed (d, K) so the
        # per-step value-net vjp matmuls run K-in-lanes (rollout/sde.py:
        # stopped_rollout_dk; falls back to 'kd' with a warning when the
        # problem lacks the transposed protocol or the net lacks a
        # transposed apply).  Param init always uses threefry.
        self.rng_impl = rng_impl
        self.layout = layout
        # rollout_mode='fused_train' runs the stopped rollout as ONE
        # Pallas kernel per direction (rollout/kernels.py:
        # make_fused_stopped_train_rollout — the backward replays the
        # forward, grad-of-grad in-kernel).  Requirements: TPU backend,
        # loss_method in ('diffusion', 'BSDE') (the non-recursive-Y
        # family), detach_forward, the problem's transposed protocol and
        # a transposed-apply value net; falls back to the scan with a
        # warning otherwise (resolved_rollout_mode records the engine).
        # Noise is the in-kernel TPU PRNG — statistically, not bitwise,
        # the scan's stream.
        self.rollout_mode = rollout_mode
        self.fused_tile = fused_tile
        self.fused_unroll = fused_unroll
        self.fused_rng = fused_rng
        key = jax.random.PRNGKey(seed)
        k_net, self._train_key = jax.random.split(key)
        if rng_impl != "threefry":
            self._train_key = jax.random.key(seed ^ 0x5eed, impl=rng_impl)
        self.V_net = value_net if value_net is not None else DenseNet(d_out=1)
        self.params = self.V_net.init(k_net, jnp.zeros((1, self.d)))
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)

        # logging (solver.py:613-626)
        self.K_test_log = K_test_log
        self.loss_log = []
        self.loss_log_domain = []
        self.loss_log_boundary = []
        self.V_L2_log = []
        self.V_test_L2 = []
        self.V_test_abs = []
        self.V_test_rel_abs = []
        self.K_log = []
        self.times = []
        self.not_all_stopped_count = 0
        self.step = 0


    # ------------------------------------------------------------------
    def V(self, X):
        return self.V_net.apply(self.params, X)[:, 0]

    def _v_fn(self, params):
        return lambda X: self.V_net.apply(params, X)[:, 0]

    def _value_grad_fn(self):
        sig = self.problem.sigma_struct
        net = self.V_net

        def fn(params, X, t):
            v_of_x = lambda x: net.apply(params, x)[:, 0]
            V, pull = jax.vjp(v_of_x, X)
            (gradX,) = pull(jnp.ones_like(V))
            # solver.py:729: Z = sigma^T grad V
            return V, sig.apply_T(gradX)

        return fn

    def _value_grad_fn_T(self):
        """Column-layout (d, K) variant of :meth:`_value_grad_fn` for the
        transposed stopped rollout (layout='dk'): the vjp runs through
        ansatz/transposed.py so every matmul — forward and pullback —
        keeps the path axis in the TPU lane dimension."""
        from ..ansatz.transposed import transposed_apply
        sig = self.problem.sigma_struct
        net = self.V_net

        def fn(params, XT, t):
            v_of_xT = lambda xT: transposed_apply(net, params, xT)[0, :]
            V, pull = jax.vjp(v_of_xT, XT)
            (gradXT,) = pull(jnp.ones_like(V))
            return V, sig.apply_T_cols(gradXT)

        return fn

    def _terms_math_T(self):
        """terms_math for the fused stopped kernel
        (rollout/kernels.py: make_fused_stopped_train_rollout): (V,
        Z = sigma^T grad V, h) at the pre-step state in column layout,
        h with y_in_h = V (the non-recursive losses, solver.py:765-770).
        """
        from ..ansatz.transposed import transposed_apply
        from ..rollout.sde import _call_h_T
        sig = self.problem.sigma_struct
        net = self.V_net
        problem = self.problem
        treedef = jax.tree.structure(self.params)

        def terms(leaves, XT, t_row):
            prm = jax.tree.unflatten(treedef, list(leaves))
            v_of_xT = lambda xT: transposed_apply(net, prm, xT)[0, :]
            V, pull = jax.vjp(v_of_xT, XT)
            (gradXT,) = pull(jnp.ones_like(V))
            ZT = sig.apply_T_cols(gradXT)
            hv = _call_h_T(problem, t_row[0, :], XT, V, ZT)
            return V.reshape(1, -1), ZT, hv.reshape(1, -1)

        return terms

    _fused_needs_xt = False   # elliptic value net consumes x only

    def _probe_params(self):
        """Value-net param tree for the transposed-apply capability probe
        (EigenSolver nests the net under 'V')."""
        return self.params

    def _resolve_fused(self):
        """Gate rollout_mode='fused_train' -> usable, or fall back to the
        scan with a one-time warning (cf. HJBSolver's resolution;
        resolved_rollout_mode records what actually runs)."""
        from ..ansatz.transposed import transposed_apply
        ok = (self.rollout_mode == "fused_train"
              and self.loss_method in ("diffusion", "BSDE")
              and self.detach_forward
              and not getattr(self, "solve_linear_L2_projection", False)
              and getattr(self.problem, "supports_transposed", False)
              and (self.mesh is None
                   or ("dp" in self.mesh.axis_names
                       and self.K % self.mesh.shape["dp"] == 0))
              and jax.default_backend() == "tpu")
        if ok:
            d_in = self.d + 1 if self._fused_needs_xt else self.d
            try:
                jax.eval_shape(lambda p: transposed_apply(
                    self.V_net, p, jnp.zeros((d_in, 4))),
                    self._probe_params())
            except NotImplementedError:
                ok = False
        self.resolved_rollout_mode = "fused_train" if ok else "scan"
        if (self.rollout_mode == "fused_train" and not ok
                and not getattr(self, "_fused_fallback_warned", False)):
            import warnings
            self._fused_fallback_warned = True
            warnings.warn(
                "rollout_mode='fused_train' fell back to 'scan' (needs a "
                "TPU backend, loss_method 'diffusion'/'BSDE', "
                "detach_forward, the problem's transposed-coefficient "
                "protocol and a transposed-apply value net)", stacklevel=3)
        return ok

    def _build_fused_run(self, time_stopping=False):
        """Construct the fused stopped-rollout kernel (and remember
        whether the in-kernel v_ref diagnostic is active)."""
        from ..rollout.kernels import (
            jaxpr_mosaic_safe, make_fused_stopped_train_rollout,
            make_fused_stopped_train_rollout_sharded)
        from ..rollout.sampling import inside_fn_cols
        problem = self.problem
        leaves_ex = tuple(jax.tree.leaves(self.params))
        v_ref_T = (getattr(problem, "v_ref_T", None)
                   if not time_stopping else None)
        if v_ref_T is not None and not jaxpr_mosaic_safe(
                v_ref_T, jax.ShapeDtypeStruct((self.d, 8), jnp.float32)):
            v_ref_T = None   # FD-table refs gather: skip in-kernel diag
        self._fused_v_ref = v_ref_T is not None
        fkw = dict(inside_fn_T=inside_fn_cols(problem.geometry),
                   adaptive_forward=self.adaptive_forward_process,
                   time_stopping=time_stopping, v_ref_T=v_ref_T)
        if self.fused_tile is not None:
            fkw["tile"] = int(self.fused_tile)
        if self.fused_unroll is not None:
            fkw["unroll"] = int(self.fused_unroll)
        if self.fused_rng is not None:
            fkw["rng"] = str(self.fused_rng)
        if self.mesh is not None:
            return make_fused_stopped_train_rollout_sharded(
                problem, self._terms_math_T(), leaves_ex, self.K, self.N,
                self.delta_t, mesh=self.mesh, **fkw)
        return make_fused_stopped_train_rollout(
            problem, self._terms_math_T(), leaves_ex, self.K, self.N,
            self.delta_t, **fkw)

    def _shard_T(self, X0T):
        """Keep transposed path state path-sharded (P(None, 'dp')) under
        a mesh: without the constraint GSPMD may re-shard/gather X0.T
        (the hazard test_parallel's HLO guard checks; ADVICE r4)."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            X0T = jax.lax.with_sharding_constraint(
                X0T, NamedSharding(self.mesh, P(None, "dp")))
        return X0T

    def _fused_call(self, fused_run, params, X0, t0, kr):
        """Shared fused-kernel call prologue — transpose + dp constraint
        + leaf flattening + f32 seed — one definition for the elliptic/
        general/eigen steps (code review r5: was duplicated 4x)."""
        X0T = self._shard_T(X0.T)
        leaves = tuple(jax.tree.leaves(params))
        seed_f = jax.random.randint(
            kr, (), 0, 2**23 - 1).astype(jnp.float32)
        return fused_run(leaves, X0T, t0, seed_f)

    def _fused_v_l2(self, v_l2_acc):
        """V_L2 accumulator -> metric: NaN sentinel when the in-kernel
        v_ref diagnostic was DROPPED (Mosaic-unsafe v_ref_T) on a problem
        that does have a reference — a 0.0 there would read as perfect
        accuracy (code review r5; shared by elliptic and eigen)."""
        no_ref = not getattr(self, "_fused_v_ref", False)
        if no_ref and self.problem.has_v_ref:
            return jnp.full_like(v_l2_acc, jnp.nan)
        return v_l2_acc

    def _fused_to_stopped_out(self, fo, Y0, K):
        """FusedStoppedOut -> StoppedRolloutOut view for the shared loss
        assembly (Y_0 added outside the kernel; no step losses in the
        fused family)."""
        from ..rollout.sde import StoppedRolloutOut
        return StoppedRolloutOut(
            X=fo.XT.T, Y=Y0.astype(jnp.float32) + fo.Y, t=fo.t,
            stopped=fo.stopped > 0.5, hitting=fo.hitting,
            v_l2=self._fused_v_l2(fo.v_l2),
            step_loss=jnp.float32(0.0),
            active_count=jnp.sum(fo.adv_steps))

    def _resolve_dk(self, needs_xt: bool = False):
        """Resolve layout='dk' -> usable transposed pieces, or fall back
        to 'kd' with a one-time warning (cf. HJBSolver resolution).
        layout='auto' (default) picks dk when the gates pass AND
        K >= 1024 — the measured lane-occupancy crossover (RESULTS
        round-4 stopped-layout table: 1.2-2x at K >= 8192, a wash or a
        loss at the reference's K=200); explicit 'kd'/'dk' force."""
        from ..ansatz.transposed import transposed_apply
        want_dk = (self.layout == "dk"
                   or (self.layout == "auto" and self.K >= 1024))
        use_dk = (want_dk
                  and getattr(self.problem, "supports_transposed", False)
                  and self.loss_method != "PINN")
        if use_dk:
            d_in = self.d + 1 if needs_xt else self.d
            try:
                jax.eval_shape(lambda p: transposed_apply(
                    self.V_net, p, jnp.zeros((d_in, 4))), self.params)
            except NotImplementedError:
                use_dk = False
        self.resolved_layout = "dk" if use_dk else "kd"
        if (self.layout == "dk" and not use_dk
                and not getattr(self, "_fallback_warned", False)):
            import warnings
            self._fallback_warned = True
            warnings.warn(
                "layout='dk' fell back to 'kd' (needs the problem's "
                "transposed-coefficient protocol, a transposed-apply-"
                "capable value net, and a non-PINN loss)", stacklevel=3)
        return use_dk

    def _rollout_cfg(self):
        lm = self.loss_method
        return StoppedRolloutConfig(
            N=self.N, delta_t=self.delta_t,
            adaptive_forward=self.adaptive_forward_process,
            detach_forward=self.detach_forward,
            recursive_y_in_h=lm in ("BSDE-2", "BSDE-4"),
            step_loss=lm if lm in ("BSDE-2", "BSDE-3") else None,
            remat=self.remat, alpha0=self.alpha[0],
        )

    def _boundary_loss(self, params, Xb):
        """Dirichlet value matching or Neumann radial-derivative matching
        (solver.py:676-685)."""
        v_fn = self._v_fn(params)
        if self.boundary_type == "Dirichlet":
            return jnp.mean((v_fn(Xb) - self.problem.g(Xb)) ** 2)
        V, pull = jax.vjp(v_fn, Xb)
        (grad_V,) = pull(jnp.ones_like(V))
        lhs = jnp.sum(grad_V * Xb, axis=-1)
        rhs = jnp.sum(self.problem.g(Xb) * Xb, axis=-1)
        return jnp.mean((lhs - rhs) ** 2)

    def _build_step(self):
        problem = self.problem
        geom = problem.geometry
        lm = self.loss_method
        cfg = self._rollout_cfg()
        vg_fn = self._value_grad_fn()
        ins = inside_fn(geom)
        K, Kb, d = self.K, self.K_boundary, self.d
        a0, a1 = self.alpha[0], self.alpha[1]
        v_ref = problem.v_ref if hasattr(problem, "v_ref") else None
        use_fused = self._resolve_fused()
        if use_fused:
            fused_run = self._build_fused_run()
        use_dk = (not use_fused) and self._resolve_dk()
        if use_dk:
            from ..rollout.sampling import inside_fn_cols
            vg_fn_T = self._value_grad_fn_T()
            ins_T = inside_fn_cols(geom)
            v_ref_T = (getattr(problem, "v_ref_T", None)
                       or (None if v_ref is None
                           else (lambda XT: v_ref(XT.T))))

        def loss_fn(params, key):
            kb, kd, kr = jax.random.split(key, 3)
            v_fn = self._v_fn(params)
            loss = jnp.float32(0.0)
            aux = {}

            if self.sample_center and problem.has_v_ref:
                # gated on has_v_ref (the reference crashes on an
                # oracle-less problem here, solver.py:644-645 — beat it)
                Xc = jnp.zeros((1, d))
                loss = loss + jnp.mean((v_fn(Xc) - problem.v_ref(Xc)) ** 2)

            bound_l = jnp.float32(0.0)
            if (lm not in ("BSDE-4", "BSDE") and self.boundary_loss
                    and geom.bounded):
                Xb = sample_boundary(kb, geom, Kb, d)
                bound_l = self._boundary_loss(params, Xb)
                loss = loss + a1 * bound_l
            aux["boundary"] = bound_l

            X0 = constrain_batch(
                sample_domain(kd, geom, K, d,
                              uniform_square=self.uniform_square), self.mesh)
            if lm in ("BSDE-2", "BSDE-4", "BSDE", "diffusion"):
                Y0 = v_fn(X0)
            else:
                Y0 = jnp.zeros((K,))
            Y0 = constrain_batch(Y0, self.mesh)

            if use_fused:
                fo = self._fused_call(fused_run, params, X0,
                                      jnp.zeros((K,)), kr)
                out = self._fused_to_stopped_out(fo, Y0, K)
            elif use_dk:
                X0T = self._shard_T(X0.T)
                out = stopped_rollout_dk(cfg, problem, vg_fn_T, params,
                                         X0T, Y0, jnp.zeros((K,)), kr,
                                         ins_T, v_ref_T=v_ref_T)
            else:
                out = stopped_rollout(cfg, problem, vg_fn, params, X0, Y0,
                                      jnp.zeros((K,)), kr, ins, v_ref=v_ref)
            loss = loss + out.step_loss

            if lm == "diffusion":
                if self.variance_moment_split:
                    # solver.py:788-789
                    r = v_fn(out.X) - out.Y
                    loss = loss + a0 * (_unbiased_var(r)
                                        + jnp.mean(r[:1] ** 2))
                else:
                    loss = loss + a0 * jnp.mean((v_fn(out.X) - out.Y) ** 2)
            if lm in ("BSDE-4", "BSDE"):
                loss = loss + jnp.mean((problem.g(out.X) - out.Y) ** 2)
            if self.loss_with_stopped:
                loss = loss + masked_mean((problem.g(out.X) - out.Y) ** 2,
                                          out.stopped)

            aux["V_L2"] = jnp.mean(out.v_l2)
            aux["K_count"] = out.active_count
            aux["all_stopped"] = jnp.all(out.stopped)
            aux["domain"] = loss - a1 * bound_l
            return loss, aux

        def step(params, opt_state, key):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, key)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            aux["loss"] = loss
            self._add_test_metrics(params, key, aux)
            return params, opt_state, aux

        return step

    def _build_pinn_step(self):
        problem = self.problem
        geom = problem.geometry
        Kb, K, d = self.K_boundary, self.K, self.d
        a0, a1 = self.alpha[0], self.alpha[1]

        def loss_fn(params, key):
            kb, kd = jax.random.split(key)
            v_fn = self._v_fn(params)
            X = sample_domain(kd, geom, K, d,
                              uniform_square=self.uniform_square)
            resid = elliptic_pinn_residual(problem, v_fn, X,
                                           self.full_hessian)
            if self.PINN_log_variance:
                dom = _unbiased_var(resid)
            else:
                dom = jnp.mean(resid ** 2)
            loss = a0 * dom
            bound_l = jnp.float32(0.0)
            if self.boundary_loss and geom.bounded:
                Xb = sample_boundary(kb, geom, Kb, d)
                bound_l = jnp.mean((v_fn(Xb) - problem.g(Xb)) ** 2)
                loss = loss + a1 * bound_l
            # V_L2 diagnostic only when the problem carries an oracle
            # (NaN metric instead of a crash on e.g. DoubleWell_multidim_2)
            v_l2 = (jnp.mean((v_fn(X) - problem.v_ref(X)) ** 2)
                    * self.delta_t if problem.has_v_ref
                    else jnp.float32(jnp.nan))
            aux = {"boundary": bound_l, "domain": dom, "V_L2": v_l2,
                   "K_count": jnp.float32(K),
                   "all_stopped": jnp.bool_(True)}
            return loss, aux

        def step(params, opt_state, key):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, key)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            aux["loss"] = loss
            self._add_test_metrics(params, key, aux)
            return params, opt_state, aux

        return step

    def _add_test_metrics(self, params, key, aux):
        """Fresh-sample test error, computed inside the jitted step (one
        dispatch per iteration instead of two)."""
        if self.K_test_log is None:
            return
        from ..eval.test_error import compute_test_error
        net = self.V_net
        v_fn = lambda X: net.apply(params, X)[:, 0]
        L2, mae, mre = compute_test_error(
            v_fn, self.problem, self.K_test_log,
            jax.random.fold_in(key, 7), modus="elliptic")
        aux["test_L2"], aux["test_abs"], aux["test_rel_abs"] = L2, mae, mre

    # ------------------------------------------------------------------

    # -- persistence (orbax; mirrors solver.py:313-332) --------------------
    def save_networks(self, out_dir="output"):
        import os
        from ..utils.checkpoint import save_params
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "%s_%s" % (self.name, self.date))
        save_params(path, self.params, self.opt_state)
        if self.verbose:
            print("\nnetworks data has been stored to: %s" % path)
        return path

    def load_networks(self, path):
        from ..utils.checkpoint import load_params
        self.params, self.opt_state = load_params(
            path, self.params, self.opt_state)

    def save_training_state(self, out_dir="output"):
        """Full resume checkpoint: params, opt state, RNG key, step, logs."""
        import os
        from ..utils.checkpoint import save_training_state
        os.makedirs(out_dir, exist_ok=True)
        return save_training_state(
            os.path.join(out_dir, "%s_%s_state" % (self.name, self.date)),
            self)

    def load_training_state(self, path):
        from ..utils.checkpoint import load_training_state
        load_training_state(path, self)

    def _record(self, aux):
        """Append one iteration's metrics to the reference-name logs."""
        self.loss_log.append(float(aux["loss"]))
        self.V_L2_log.append(float(aux["V_L2"]))
        self.K_log.append(float(aux["K_count"]))
        if not bool(aux["all_stopped"]) and self.loss_method in (
                "BSDE", "BSDE-4"):
            self.not_all_stopped_count += 1
        if self.log_loss_parts:
            self.loss_log_domain.append(float(aux["domain"]))
            self.loss_log_boundary.append(float(aux["boundary"]))
        if self.K_test_log is not None:
            self.V_test_L2.append(float(aux["test_L2"]))
            self.V_test_abs.append(float(aux["test_abs"]))
            self.V_test_rel_abs.append(float(aux["test_rel_abs"]))

    def _maybe_print(self, done, n):
        first = done - n
        if self.verbose and (first == 0 or first // self.print_every
                             != done // self.print_every):
            print("%d - loss = %.4e, v L2 error = %.4e, %.2f"
                  % (done - 1, self.loss_log[-1], self.V_L2_log[-1],
                     np.mean(self.times[-self.print_every:])))

    def train(self):
        run_training(self, self._build_pinn_step()
                     if self.loss_method == "PINN" else self._build_step())
