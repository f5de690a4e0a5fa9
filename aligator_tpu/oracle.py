"""Plain-NumPy fp64 reference ProxDDP — the full-solver parity oracle.

NOT PRODUCT SURFACE: this module is a deliberate test/parity instrument
(it backs the iterate-for-iterate parity tests, the randomized parity
fuzz, and the convergence-tail ablation). It ships inside the package
only so those tests and offline ablation scripts can import it without
path games; nothing in the solver stack depends on it.

An *independent* re-implementation of the complete serial ProxDDP loop,
mirroring the reference C++ (``solver-proxddp.hxx:458-741``): multiplier
estimates (``computeMultipliers``, :458:210), PDAL merit
(``merit-function.hxx:31``), Lagrangian gradients (``core/lagrangian.hpp``),
active-set projected Jacobians (:22-67), LQ subproblem assembly
(``updateLQSubproblem``, :802), the serial proximal Riccati recursion
(``gar/riccati-kernel.hxx:64-361``), Armijo backtracking, BCL tolerance
updates (:519-570) and the regularization schedule (:351-366).

Everything *solver-side* is independent of the JAX implementation:

* plain Python loops over stages (no scan/vmap/flattening tricks),
* per-stage KKT systems solved as full symmetric-indefinite systems with
  ``numpy.linalg.solve`` (the Bunch-Kaufman role) — NOT the Schur/Cholesky
  reductions the JAX kernel uses,
* general-E handling throughout (no explicit-dynamics fast path).

The *model side* (cost/dynamics/constraint evaluation and derivatives,
manifold retraction, constraint-set projections) is shared with the problem
definition — exactly the reference's own test strategy, which runs two
solvers on one problem object and compares (``tests/gar/parallel.cpp``,
``tests/python/test_solver.py``).

Used by ``tests/test_parity_oracle.py`` to certify the north-star
"controls match aligator to 1e-4" criterion on LQR, SE(2)-car and
UR5-reach, iterate-by-iterate at identical iteration budgets.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core import problem as problem_mod
from .solvers.proxddp import ProxDDPConfig


def _np(a):
    return np.asarray(a, dtype=np.float64)


@dataclasses.dataclass
class OracleTrace:
    xs_hist: list
    us_hist: list
    xs: np.ndarray
    us: np.ndarray
    vs: np.ndarray
    lams: np.ndarray
    conv: bool
    num_iters: int
    prim_infeas: float
    dual_infeas: float


class _Model:
    """Shared model boundary: evaluates the problem (values + derivatives)
    and constraint-set projections through the problem definition, returning
    NumPy arrays. All *solver* math stays in :class:`NumpyProxDDP`."""

    def __init__(self, problem):
        self.problem = problem
        self.space = problem.space
        self.N = problem.nsteps
        self._derivs = jax.jit(
            lambda xs, us: problem_mod.compute_derivatives(problem, xs, us)
        )
        self._eval = jax.jit(
            lambda xs, us: problem_mod.evaluate(problem, xs, us)
        )
        self._integrate = jax.jit(
            jax.vmap(lambda x, dx: problem.space.integrate(x, dx))
        )

    def derivatives(self, xs, us):
        d = self._derivs(jnp.asarray(xs), jnp.asarray(us))
        return jax.tree.map(_np, d)

    def evaluate(self, xs, us):
        d = self._eval(jnp.asarray(xs), jnp.asarray(us))
        return jax.tree.map(_np, d)

    def integrate(self, xs, dxs):
        return _np(self._integrate(jnp.asarray(xs), jnp.asarray(dxs)))

    def integrate1(self, x, dx):
        return _np(self._integrate(jnp.asarray(x)[None], jnp.asarray(dx)[None]))[0]

    def difference(self, x0, x1):
        if not hasattr(self, "_difference"):
            self._difference = jax.jit(
                lambda a, b: self.problem.space.difference(a, b)
            )
        return _np(self._difference(jnp.asarray(x0), jnp.asarray(x1)))

    def dyn_forward(self, t, x, u):
        """x' = f_t(x, u) through stage t's dynamics (explicit)."""
        if not hasattr(self, "_dyn_fwd"):
            def fwd(t_, x_, u_):
                stage = jax.tree.map(lambda a: a[t_], self.problem.stages)
                return stage.dynamics.forward(self.space, x_, u_)

            self._dyn_fwd = jax.jit(fwd)
        return _np(self._dyn_fwd(jnp.asarray(t), jnp.asarray(x), jnp.asarray(u)))

    def cstr_projection(self, mu, shifted):
        cset = self.problem.stages.constraint_set().set_prox_parameter(mu)
        proj = cset.normal_cone_projection(jnp.asarray(shifted))
        act = cset.active_mask(jnp.asarray(shifted))
        return _np(proj), np.asarray(act)

    def term_cstr_projection(self, mu, shifted):
        tset = self.problem.term_constraint_set().set_prox_parameter(mu)
        proj = tset.normal_cone_projection(jnp.asarray(shifted))
        act = tset.active_mask(jnp.asarray(shifted))
        return _np(proj), np.asarray(act)


class NumpyProxDDP:
    """Reference serial ProxDDP in NumPy (see module docstring).

    Follows the same iteration schedule as the JAX solver (one Newton step
    per iteration; BCL update fires when the inner criterion is met — the
    flattened form of the reference's nested loops) so iterates can be
    compared one-for-one.
    """

    def __init__(self, problem, cfg: ProxDDPConfig):
        if cfg.ls_strategy not in ("armijo", "nonmonotone"):
            raise NotImplementedError(cfg.ls_strategy)
        if cfg.rollout != "linear":
            raise NotImplementedError("oracle supports linear rollout")
        self.problem = problem
        self.cfg = cfg
        self.model = _Model(problem)

    # -- multiplier estimates (computeMultipliers, solver-proxddp.hxx:210) --
    def _multipliers(self, data, lams, vs, vs_term, prev):
        cfg, mu = self.cfg, self.mu
        mudyn = cfg.dyn_al_scale * mu
        prev_lams, prev_vs, prev_vs_term = prev

        dyn_vals = np.concatenate([data.init_res[None], data.dyn_res], axis=0)
        lams_plus = prev_lams + dyn_vals / mudyn
        lams_pdal = 2.0 * lams_plus - lams
        Lds = mudyn * (lams_plus - lams)
        if cfg.force_initial_condition:
            Lds[0] = 0.0

        shifted = data.cstr_vals + mu * prev_vs
        vs_plus_raw, active = self.model.cstr_projection(mu, shifted)
        Lvs = vs_plus_raw - mu * vs
        vs_plus = vs_plus_raw / mu

        shifted_t = data.term_cstr_vals + mu * prev_vs_term
        vs_plus_t_raw, active_t = self.model.term_cstr_projection(mu, shifted_t)
        Lvs_t = vs_plus_t_raw - mu * vs_term
        vs_plus_t = vs_plus_t_raw / mu

        return dict(
            lams_plus=lams_plus, lams_pdal=lams_pdal, Lds=Lds,
            dyn_slacks=dyn_vals, active=active, vs_plus=vs_plus, Lvs=Lvs,
            vs_pdal=2.0 * vs_plus - vs, active_t=active_t,
            vs_plus_t=vs_plus_t, Lvs_t=Lvs_t,
            vs_pdal_t=2.0 * vs_plus_t - vs_term,
        )

    def _merit(self, cost, m):
        mudyn = self.cfg.dyn_al_scale * self.mu
        return (
            cost
            + 0.5 * mudyn * np.sum(m["lams_plus"] ** 2)
            + 0.5 * self.mu * np.sum(m["vs_plus"] ** 2)
            + 0.5 * self.mu * np.sum(m["vs_plus_t"] ** 2)
        )

    # -- Lagrangian gradients (core/lagrangian.hpp:26) --
    def _lagrangian_grads(self, data, lams, vs, vs_term):
        N = self.problem.nsteps
        Lxs = np.zeros_like(data.Lx)
        Lus = np.zeros_like(data.Lu)
        Lxs[0] += data.init_Jx.T @ lams[0]
        for t in range(N):
            Lxs[t] += (
                data.Lx[t] + data.A[t].T @ lams[t + 1]
                + data.cstr_Jx[t].T @ vs[t]
            )
            Lxs[t + 1] += data.E[t].T @ lams[t + 1]
            Lus[t] = (
                data.Lu[t] + data.B[t].T @ lams[t + 1]
                + data.cstr_Ju[t].T @ vs[t]
            )
        Lxs[N] += data.Lx[N] + data.term_cstr_Jx.T @ vs_term
        if self.cfg.force_initial_condition:
            Lxs[0] = 0.0
        return Lxs, Lus

    def _criteria(self, m, Lxs, Lus, prev):
        _, prev_vs, prev_vs_term = prev
        mu = self.mu

        def infn(a):
            return np.max(np.abs(a)) if a.size else 0.0

        stage_infeas = max(
            infn(mu * (m["vs_plus"] - prev_vs)),
            infn(mu * (m["vs_plus_t"] - prev_vs_term)),
        )
        prim = max(stage_infeas, infn(m["dyn_slacks"]))
        dual = max(infn(Lxs), infn(Lus))
        crit = max(dual, infn(m["Lds"]), infn(m["Lvs"]), infn(m["Lvs_t"]))
        return prim, dual, crit

    # -- LQ assembly (updateLQSubproblem, solver-proxddp.hxx:802) --
    def _assemble_lq(self, data, m, Lxs, Lus):
        pb, cfg, mu = self.problem, self.cfg, self.mu
        N = pb.nsteps
        ndx, nu = pb.space.ndx, pb.nu
        nc, nct = pb.nc, pb.nc_term
        ncmax = max(nc, nct)

        knots = []
        for t in range(N + 1):
            kn = {}
            kn["Q"] = data.Lxx[t] + self.preg * np.eye(ndx)
            if t < N:
                act = m["active"][t][:, None]
                Cp = np.where(act, data.cstr_Jx[t], 0.0)
                Dp = np.where(act, data.cstr_Ju[t], 0.0)
                Lv_s = m["Lvs"][t] / mu
                corr_x = (data.cstr_Jx[t] - Cp).T @ Lv_s
                corr_u = (data.cstr_Ju[t] - Dp).T @ Lv_s
                kn["q"] = Lxs[t] + corr_x
                kn["S"] = data.Lxu[t]
                kn["R"] = data.Luu[t] + self.preg * np.eye(nu)
                kn["r"] = Lus[t] + corr_u
                kn["A"], kn["B"], kn["E"] = data.A[t], data.B[t], data.E[t]
                kn["f"] = m["Lds"][t + 1]
                kn["C"] = np.zeros((ncmax, ndx))
                kn["D"] = np.zeros((ncmax, nu))
                kn["d"] = np.zeros((ncmax,))
                kn["C"][:nc] = Cp
                kn["D"][:nc] = Dp
                kn["d"][:nc] = m["Lvs"][t]
            else:
                act_t = m["active_t"][:, None]
                Cp_t = np.where(act_t, data.term_cstr_Jx, 0.0)
                corr_xt = (data.term_cstr_Jx - Cp_t).T @ (m["Lvs_t"] / mu)
                kn["q"] = Lxs[N] + corr_xt
                kn["S"] = np.zeros((ndx, nu))
                kn["R"] = np.eye(nu)
                kn["r"] = np.zeros((nu,))
                kn["C"] = np.zeros((ncmax, ndx))
                kn["D"] = np.zeros((ncmax, nu))
                kn["d"] = np.zeros((ncmax,))
                kn["C"][:nct] = Cp_t
                kn["d"][:nct] = m["Lvs_t"]
            knots.append(kn)
        G0 = data.init_Jx
        g0 = np.zeros((ndx,)) if cfg.force_initial_condition else m["Lds"][0]
        return knots, G0, g0

    # -- serial proximal Riccati (gar/riccati-kernel.hxx:64-361), solved with
    #    full KKT systems via numpy.linalg.solve --
    def _riccati(self, knots, G0, g0):
        cfg = self.cfg
        mudyn = cfg.dyn_al_scale * self.mu
        mueq = self.mu
        N = len(knots) - 1
        ndx = knots[0]["Q"].shape[0]
        nu = knots[0]["R"].shape[0]
        ncmax = knots[0]["C"].shape[0]

        def reduced_solve(Rhat, D, rhs_u, rhs_c):
            # full symmetric-indefinite reduced KKT, one LU solve
            n, c = Rhat.shape[0], D.shape[0]
            M = np.zeros((n + c, n + c))
            M[:n, :n] = Rhat
            M[:n, n:] = D.T
            M[n:, :n] = D
            M[n:, n:] = -mueq * np.eye(c)
            rhs = np.concatenate([rhs_u, rhs_c], axis=0)
            sol = np.linalg.solve(M, rhs)
            return sol[:n], sol[n:]

        gains = [None] * (N + 1)
        kn = knots[N]
        kff, zff = reduced_solve(kn["R"], kn["D"], -kn["r"], -kn["d"])
        K, Z = reduced_solve(kn["R"], kn["D"], -kn["S"].T, -kn["C"])
        P = kn["Q"] + kn["C"].T @ Z + kn["S"] @ K
        P = 0.5 * (P + P.T)
        p = kn["q"] + kn["C"].T @ zff + kn["S"] @ kff
        gains[N] = dict(kff=kff, K=K, zff=zff, Z=Z)

        for t in range(N - 1, -1, -1):
            kn = knots[t]
            A, B, E, f = kn["A"], kn["B"], kn["E"], kn["f"]
            Einv = np.linalg.inv(E)
            Ptilde = Einv.T @ P @ Einv
            Ptilde = 0.5 * (Ptilde + Ptilde.T)
            ptilde = -(Einv.T @ p)
            schur = np.eye(ndx) + mudyn * Ptilde
            Vxx = np.linalg.solve(schur, Ptilde)
            Vxx = 0.5 * (Vxx + Vxx.T)
            vx = np.linalg.solve(schur, ptilde + Ptilde @ f)

            Qhat = kn["Q"] + A.T @ Vxx @ A
            Rhat = kn["R"] + B.T @ Vxx @ B
            Shat = kn["S"] + A.T @ Vxx @ B
            qhat = kn["q"] + A.T @ vx
            rhat = kn["r"] + B.T @ vx

            kff, zff = reduced_solve(Rhat, kn["D"], -rhat, -kn["d"])
            K, Z = reduced_solve(Rhat, kn["D"], -Shat.T, -kn["C"])

            lff = vx + Vxx @ (B @ kff)
            L = Vxx @ A + Vxx @ (B @ K)
            yff = -(Einv @ (f + B @ kff - mudyn * lff))
            Afb = -(Einv @ (A + B @ K - mudyn * L))

            P = Qhat + Shat @ K + kn["C"].T @ Z
            P = 0.5 * (P + P.T)
            p = qhat + Shat @ kff + kn["C"].T @ zff
            gains[t] = dict(
                kff=kff, K=K, zff=zff, Z=Z, lff=lff, L=L, yff=yff, Afb=Afb
            )

        # initial KKT [[P, G0ᵀ],[G0, -mudyn I]] — full solve
        nc0 = G0.shape[0]
        M0 = np.zeros((ndx + nc0, ndx + nc0))
        M0[:ndx, :ndx] = P
        M0[:ndx, ndx:] = G0.T
        M0[ndx:, :ndx] = G0
        M0[ndx:, ndx:] = -mudyn * np.eye(nc0)
        sol0 = np.linalg.solve(M0, np.concatenate([-p, -g0]))
        x0, lam0 = sol0[:ndx], sol0[ndx:]

        # forward substitution
        dxs = np.zeros((N + 1, ndx))
        dus = np.zeros((N + 1, nu))
        dvs = np.zeros((N + 1, ncmax))
        dlams = np.zeros((N + 1, nc0))
        dxs[0], dlams[0] = x0, lam0
        for t in range(N):
            g = gains[t]
            dus[t] = g["kff"] + g["K"] @ dxs[t]
            dvs[t] = g["zff"] + g["Z"] @ dxs[t]
            dlams[t + 1] = g["lff"] + g["L"] @ dxs[t]
            dxs[t + 1] = g["yff"] + g["Afb"] @ dxs[t]
        g = gains[N]
        dus[N] = g["kff"] + g["K"] @ dxs[N]
        dvs[N] = g["zff"] + g["Z"] @ dxs[N]
        return dxs, dus, dvs, dlams

    # -- main loop (run(), solver-proxddp.hxx:458; flattened schedule) --
    def solve(self, xs_init=None, us_init=None) -> OracleTrace:
        pb, cfg = self.problem, self.cfg
        N = pb.nsteps
        ndx, nu = pb.space.ndx, pb.nu
        nc, nct = pb.nc, pb.nc_term

        xs = (
            np.broadcast_to(_np(pb.x0), (N + 1,) + _np(pb.x0).shape).copy()
            if xs_init is None else _np(xs_init).copy()
        )
        us = np.zeros((N, nu)) if us_init is None else _np(us_init).copy()
        vs = np.zeros((N, nc))
        vs_term = np.zeros((nct,))
        lams = np.zeros((N + 1, ndx))
        prev = (lams.copy(), vs.copy(), vs_term.copy())

        self.mu = max(cfg.mu_init, cfg.mu_lower_bound)
        self.preg = max(cfg.reg_init, cfg.reg_min)
        preg_last = 0.0
        arg0 = min(self.mu, 0.99)
        inner_tol = max(cfg.inner_tol0 * arg0**cfg.dual_alpha, cfg.target_dual_tol)
        prim_tol = max(cfg.prim_tol0 * arg0**cfg.prim_alpha, cfg.tol)

        conv = False
        fail = False
        al_iter = 0
        it = 0
        ls_mov_avg = 0.0
        ls_avg_weight = 0.0
        xs_hist, us_hist = [], []

        while (
            it < cfg.max_iters and not conv and not fail
            and al_iter < cfg.max_al_iters
        ):
            data = self.model.derivatives(xs, us)
            m = self._multipliers(data, lams, vs, vs_term, prev)
            Lxs, Lus = self._lagrangian_grads(data, lams, vs, vs_term)
            prim, dual, crit = self._criteria(m, Lxs, Lus, prev)
            xs_hist.append(xs.copy())
            us_hist.append(us.copy())

            overall = dual <= cfg.target_dual_tol and prim <= cfg.tol
            inner_done = crit <= inner_tol or overall

            if inner_done:
                # BCL update (run() loop body, solver-proxddp.hxx:519-570)
                if prim <= prim_tol:
                    arg = min(self.mu, 0.99)
                    prim_tol *= arg**cfg.prim_beta
                    inner_tol *= arg**cfg.dual_beta
                    while crit < inner_tol:
                        prim_tol *= arg**cfg.prim_beta
                        inner_tol *= arg**cfg.dual_beta
                    if cfg.multiplier_update_mode == "newton":
                        prev = (lams.copy(), vs.copy(), vs_term.copy())
                    elif cfg.multiplier_update_mode == "primal":
                        prev = (m["lams_plus"], m["vs_plus"], m["vs_plus_t"])
                    else:
                        prev = (m["lams_pdal"], m["vs_pdal"], m["vs_pdal_t"])
                    if overall:
                        conv = True
                else:
                    mu_f = max(self.mu * cfg.mu_update_factor, cfg.mu_lower_bound)
                    if mu_f <= cfg.mu_lower_bound * (1.0 + 1e-12):
                        mu_f = max(cfg.mu_init, cfg.mu_lower_bound)
                    self.mu = mu_f
                    arg_f = min(mu_f, 0.99)
                    prim_tol = cfg.prim_tol0 * arg_f**cfg.prim_alpha
                    inner_tol = cfg.inner_tol0 * arg_f**cfg.dual_alpha
                inner_tol = max(inner_tol, 0.01 * cfg.target_dual_tol)
                prim_tol = max(prim_tol, cfg.tol)
                al_iter += 1
                ls_mov_avg = 0.0
                ls_avg_weight = 0.0

            if conv or fail:
                it += 1
                break

            # --- Newton step ---
            self.preg = (
                max(cfg.reg_init, cfg.reg_min)
                if preg_last == 0.0
                else max(cfg.reg_min, preg_last * cfg.reg_dec_k)
            )
            data = self.model.derivatives(xs, us)
            m = self._multipliers(data, lams, vs, vs_term, prev)
            phi0 = self._merit(data.cost, m)
            Lxs, Lus = self._lagrangian_grads(data, lams, vs, vs_term)

            knots, G0, g0 = self._assemble_lq(data, m, Lxs, Lus)
            dxs, dus_p, dvs_p, dlams = self._riccati(knots, G0, g0)
            dus = dus_p[:N]
            dvs = dvs_p[:N, :nc]
            dvs_t = dvs_p[N, :nct]
            if cfg.force_initial_condition:
                dxs[0] = 0.0
                dlams[0] = 0.0

            Lxs_p, Lus_p = self._lagrangian_grads(
                data, m["lams_plus"], m["vs_plus"], m["vs_plus_t"]
            )
            dphi0 = np.sum(Lxs_p * dxs) + np.sum(Lus_p * dus)

            if cfg.ls_strategy == "nonmonotone":
                ls_mov_avg = (
                    cfg.ls_avg_eta * ls_avg_weight * ls_mov_avg + phi0
                )
                ls_avg_weight = cfg.ls_avg_eta * ls_avg_weight + 1.0
                ls_mov_avg /= ls_avg_weight
                phi_ref = ls_mov_avg
            else:
                phi_ref = phi0

            def try_alpha(alpha):
                txs = self.model.integrate(xs, alpha * dxs)
                tus = us + alpha * dus
                tvs = vs + alpha * dvs
                tvt = vs_term + alpha * dvs_t
                tlams = lams + alpha * dlams
                d = self.model.evaluate(txs, tus)
                mm = self._multipliers(d, tlams, tvs, tvt, prev)
                phi = self._merit(d.cost, mm)
                return (txs, tus, tvs, tvt, tlams), d.cost, phi

            def propose_alpha(k, alpha, phi_a, alpha_p, phi_p):
                # safeguarded polynomial interpolation
                # (linesearch-armijo.hpp:150-210)
                if cfg.ls_interp == "bisection":
                    return alpha * cfg.ls_contraction
                big = np.finfo(np.float64).max / 8
                pa = phi_a if np.isfinite(phi_a) else big
                qa = (pa - phi0 - alpha * dphi0) / (alpha * alpha)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cand = -dphi0 / (2.0 * qa)
                if cfg.ls_interp == "cubic" and k >= 1:
                    pp = phi_p if np.isfinite(phi_p) else big
                    a0, a1 = alpha, alpha_p
                    V = np.array(
                        [[a0**3, a0**2], [a1**3, a1**2]], dtype=np.float64
                    )
                    rhs = np.array(
                        [pa - phi0 - dphi0 * a0, pp - phi0 - dphi0 * a1]
                    )
                    try:
                        c3, c2 = np.linalg.solve(V, rhs)
                        disc = c2 * c2 - 3.0 * c3 * dphi0
                        cand_c = (-c2 + np.sqrt(max(disc, 0.0))) / (3.0 * c3)
                        if np.isfinite(cand_c) and abs(c3) > 1e-30:
                            cand = cand_c
                    except np.linalg.LinAlgError:
                        pass
                if not np.isfinite(cand):
                    cand = cfg.ls_contraction_min * alpha
                return float(
                    np.clip(
                        cand,
                        cfg.ls_contraction_min * alpha,
                        cfg.ls_contraction_max * alpha,
                    )
                )

            alpha = 1.0
            trial, cost_tr, phi = try_alpha(alpha)
            alpha_p, phi_p = 1.0, phi
            k = 0
            while (
                not (phi <= phi_ref + cfg.ls_armijo_c1 * alpha * dphi0)
                and k < cfg.ls_max_steps and alpha > cfg.ls_alpha_min
            ):
                alpha2 = max(
                    propose_alpha(k, alpha, phi, alpha_p, phi_p),
                    cfg.ls_alpha_min,
                )
                alpha_p, phi_p = alpha, phi
                alpha = alpha2
                trial, cost_tr, phi = try_alpha(alpha)
                k += 1

            tiny_dir = abs(dphi0) <= cfg.dphi_thresh
            trial_ok = np.isfinite(phi) and not tiny_dir
            if trial_ok:
                xs, us, vs, vs_term, lams = trial
            else:
                alpha = cfg.ls_alpha_min

            ls_failed = alpha <= cfg.ls_alpha_min and not tiny_dir
            if ls_failed:
                if self.preg >= cfg.reg_max:
                    fail = True
                self.preg = min(
                    self.preg
                    * (cfg.reg_inc_first_k if preg_last == 0.0 else cfg.reg_inc_k),
                    cfg.reg_max,
                )
            preg_last = self.preg
            it += 1

        data = self.model.derivatives(xs, us)
        m = self._multipliers(data, lams, vs, vs_term, prev)
        Lxs, Lus = self._lagrangian_grads(data, lams, vs, vs_term)
        prim, dual, _ = self._criteria(m, Lxs, Lus, prev)
        conv = conv or (dual <= cfg.target_dual_tol and prim <= cfg.tol)

        return OracleTrace(
            xs_hist=xs_hist, us_hist=us_hist, xs=xs, us=us, vs=vs, lams=lams,
            conv=bool(conv), num_iters=it, prim_infeas=float(prim),
            dual_infeas=float(dual),
        )


@dataclasses.dataclass
class FDDPOracleTrace:
    us_hist: list
    xs: np.ndarray
    us: np.ndarray
    conv: bool
    num_iters: int
    prim_infeas: float
    dual_infeas: float
    traj_cost: float


class NumpyFDDP:
    """Reference FDDP in NumPy — the parity oracle for the second solver.

    Independent re-implementation of ``SolverFDDPTpl`` (reference
    ``solvers/fddp/solver-fddp.hxx``): multiple-shooting gaps
    (``computeInfeasibility``, :167), backward DDP sweep with Q-function
    regularization (:203), the gap-contracting rollout (:58), the
    Mastalli-style expected-improvement linesearch
    (``solvers/fddp/linesearch.hpp:13``) and the step-driven regularization
    schedule — written as plain Python loops over stages with
    ``numpy.linalg`` factorizations, sharing only the model boundary
    (cost/dynamics derivatives, manifold ops) with the JAX solver. Used by
    ``tests/test_fddp.py`` to certify that the vectorized `lax.while_loop`
    solver reproduces the loop-form algorithm decision-for-decision
    (same iteration count, same accepted steps, matching controls).
    """

    def __init__(self, problem, cfg):
        self.problem = problem
        self.cfg = cfg
        self.model = _Model(problem)
        self.N = problem.nsteps
        self.ndx = problem.space.ndx
        self.nu = problem.nu

    def _gaps(self, xs, us):
        fs = np.zeros((self.N + 1, self.ndx))
        fs[0] = self.model.difference(xs[0], _np(self.problem.x0))
        for t in range(self.N):
            xnext = self.model.dyn_forward(t, xs[t], us[t])
            fs[t + 1] = self.model.difference(xs[t + 1], xnext)
        return fs

    def _backward(self, data, fs, preg):
        N, ndx, nu = self.N, self.ndx, self.nu
        Vxx = data.Lxx[N] + preg * np.eye(ndx)
        ftVxxN = Vxx @ fs[N]
        Vx = data.Lx[N] + ftVxxN
        out = dict(
            kff=np.zeros((N, nu)), K=np.zeros((N, nu, ndx)),
            Qu=np.zeros((N, nu)), Quuk=np.zeros((N, nu)),
            Vx=np.zeros((N, ndx)), ftVxx=np.zeros((N, ndx)), ftVxxN=ftVxxN,
        )
        for t in reversed(range(N)):
            F = np.linalg.solve(
                -data.E[t], np.concatenate([data.A[t], data.B[t]], axis=1)
            )
            Fx, Fu = F[:, :ndx], F[:, ndx:]
            Qx = data.Lx[t] + Fx.T @ Vx
            Qu = data.Lu[t] + Fu.T @ Vx
            Qxx = data.Lxx[t] + Fx.T @ Vxx @ Fx
            Qxu = data.Lxu[t] + Fx.T @ Vxx @ Fu
            Quu = data.Luu[t] + Fu.T @ Vxx @ Fu + preg * np.eye(nu)
            Quu = 0.5 * (Quu + Quu.T)
            kff = -np.linalg.solve(Quu, Qu)
            K = -np.linalg.solve(Quu, Qxu.T)
            Vx_new = Qx + K.T @ Qu
            Vxx_new = Qxx + Qxu @ K
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T) + preg * np.eye(ndx)
            ftVxx = Vxx_new @ fs[t]
            Vx_new = Vx_new + ftVxx
            out["kff"][t], out["K"][t] = kff, K
            out["Qu"][t] = Qu
            out["Quuk"][t] = Quu @ kff
            out["Vx"][t] = Vx_new
            out["ftVxx"][t] = ftVxx
            Vx, Vxx = Vx_new, Vxx_new
        return out

    def _forward(self, xs, us, fs, bw, alpha):
        """Gap-contracting rollout (reference forwardPass, solver-fddp.hxx:58)."""
        N = self.N
        xs_t = np.zeros_like(xs)
        us_t = np.zeros_like(us)
        dxs = np.zeros((N + 1, self.ndx))
        x_try = self.model.integrate1(xs[0], alpha * fs[0])
        dx = alpha * fs[0]
        for t in range(N):
            xs_t[t] = x_try
            dxs[t] = dx
            us_t[t] = us[t] + alpha * bw["kff"][t] + bw["K"][t] @ dx
            xnext = self.model.dyn_forward(t, x_try, us_t[t])
            x_try = self.model.integrate1(xnext, (alpha - 1.0) * fs[t + 1])
            dx = self.model.difference(xs[t + 1], x_try)
        xs_t[N] = x_try
        dxs[N] = dx
        cost = float(self.model.evaluate(xs_t, us_t).cost)
        return xs_t, us_t, dxs, cost

    def solve(self, xs_init=None, us_init=None):
        cfg, N = self.cfg, self.N
        xs = (
            np.tile(_np(self.problem.x0), (N + 1, 1))
            if xs_init is None else _np(xs_init)
        )
        us = np.zeros((N, self.nu)) if us_init is None else _np(us_init)
        cost = float(self.model.evaluate(xs, us).cost)
        preg = cfg.reg_init
        conv = False
        fail = False
        it = 0
        us_hist = []

        while it < cfg.max_iters and not conv and not fail:
            data = self.model.derivatives(xs, us)
            fs = self._gaps(xs, us)
            prim = float(np.max(np.abs(fs)))
            bw = self._backward(data, fs, preg)
            dual = float(np.max(np.abs(bw["Qu"])))
            if max(prim, dual) < cfg.tol:
                conv = True
                it += 1
                break

            phi0 = cost
            dg = (
                np.sum(bw["Qu"] * bw["kff"]) + np.sum(bw["Vx"] * fs[:N])
                + bw["ftVxxN"] @ fs[N] + data.Lx[N] @ fs[N]
            )
            dq = np.sum(bw["kff"] * bw["Quuk"]) - (
                np.sum(fs[:N] * bw["ftVxx"]) + fs[N] @ bw["ftVxxN"]
            )

            def try_alpha(alpha):
                xs_t, us_t, dxs, c = self._forward(xs, us, fs, bw, alpha)
                dv = -(np.sum(dxs[:N] * bw["ftVxx"]) + dxs[N] @ bw["ftVxxN"])
                d1 = dg + dv
                d2 = dq - 2.0 * dv
                model = phi0 + alpha * (d1 + 0.5 * d2 * alpha)
                return xs_t, us_t, c, model, d1

            def accept_step(c, model, d1):
                if not np.isfinite(c):
                    return False
                dVreal, dVmodel = c - phi0, model - phi0
                if dVmodel < 0.0:
                    return (
                        abs(d1) < cfg.th_grad
                        or dVreal <= cfg.th_accept_step * dVmodel
                    )
                return dVreal <= cfg.th_accept_neg_step * dVmodel

            alpha = 1.0
            xs_t, us_t, c, model, d1 = try_alpha(alpha)
            accept = accept_step(c, model, d1)
            while not accept and alpha > cfg.ls_alpha_min * (1 + 1e-10):
                alpha = max(alpha * cfg.ls_beta, cfg.ls_alpha_min)
                xs_t, us_t, c, model, d1 = try_alpha(alpha)
                accept = accept_step(c, model, d1)

            if np.isfinite(c):
                xs, us, cost = xs_t, us_t, c
            conv = conv or abs(d1) < cfg.th_grad

            if alpha > cfg.th_step_dec:
                preg = max(preg * cfg.reg_dec_factor, cfg.reg_min)
            inc = alpha <= cfg.th_step_inc
            if inc:
                preg = min(preg * cfg.reg_inc_factor, cfg.reg_max)
                fail = preg >= cfg.reg_max
            it += 1
            us_hist.append(us.copy())

        data = self.model.derivatives(xs, us)
        fs = self._gaps(xs, us)
        bw = self._backward(data, fs, preg)
        prim = float(np.max(np.abs(fs)))
        dual = float(np.max(np.abs(bw["Qu"])))
        conv = conv or max(prim, dual) < cfg.tol

        return FDDPOracleTrace(
            us_hist=us_hist, xs=xs, us=us, conv=bool(conv), num_iters=it,
            prim_infeas=prim, dual_infeas=dual,
            traj_cost=float(self.model.evaluate(xs, us).cost),
        )
