"""Batch-on-lanes Pallas kernel for the whole-body derivative tensor pass.

Round-5 VERDICT item 1 (the Talos evaluate/derivative bound).  The RTT-free
profile shows the analytic RBD derivative pass (``rnea_tensors`` +
``_point_derivative_rows`` + the Jᵀλ transport, ``derivatives.py``) at
~8–10 ms per batch-16 call — ~65% of the whole-body solve.  FLOP count is
trivial (~1 MFLOP per stage instance); the bound is LANE UTILIZATION: the
pass is built from (nv, nb, 6)-shaped cross products and small einsums
whose minor axis of 6 occupies 6/128 TPU lanes (≈5%) under the standard
vmap layout.  Measured confirmations (ROUND5 ledger): a flat single-vmap
restructuring gives only 1.44×; the per-block math in isolation runs in
~0.1 ms.

This kernel lays the FLATTENED instance batch (scenario × stage) on the
128-wide lane axis — every tensor op becomes a (nv|nb, 6, 128) full-lane
VPU op — and fuses the ENTIRE pass (velocity/acceleration derivative
tensors, inertia-transport force derivatives, τ derivatives, per-contact
acceleration rows and the Jᵀλ configuration transport) into one Pallas
body, eliminating the (nv, nb, 6, 6) ``dI6`` materialization via the
algebraic identity

    (∂I₆/∂q_j)·w = maskjb · (S_j ×* (I₆ w) − I₆ (S_j ×ₘ w)).

Outputs are exactly what ``constrained_fd_tensors`` needs downstream:
``ra1_q, ra1_v`` (nv, nv) and ``r2_q, r2_v`` (nc, nv) per instance — the
KKT tangent right-hand sides (the KKT solves already ride the
batch-on-lanes SPD kernel, ``gar/pallas_spd.py``).

The kernel is generated per static contact configuration (bodies, dims,
Baumgarte gains) and validated in interpret mode against the jnp
implementation (``tests/test_pallas_tensors.py``); the jnp path stays the
oracle and the off-TPU fallback.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _cr3(a, b, axis=-2):
    """Cross product over a 3-component axis (lane axis stays minor).

    Keep-dims slices + concatenate only — Mosaic lowers middle-axis
    integer indexing as an (unsupported >2D) gather, so no squeezing."""

    def comp(x, k):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(k, k + 1)
        return x[tuple(idx)]

    a0, a1, a2 = comp(a, 0), comp(a, 1), comp(a, 2)
    b0, b1, b2 = comp(b, 0), comp(b, 1), comp(b, 2)
    out_axis = axis if axis >= 0 else a.ndim + axis
    return jnp.concatenate(
        [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0],
        axis=out_axis,
    )


def _mc(m1, m2):
    """motion_cross in lane-minor layout: (..., 6, L) × (..., 6, L)."""
    v1, w1 = m1[..., :3, :], m1[..., 3:, :]
    v2, w2 = m2[..., :3, :], m2[..., 3:, :]
    return jnp.concatenate(
        [_cr3(w1, v2) + _cr3(v1, w2), _cr3(w1, w2)], axis=-2
    )


def _mcf(m, f):
    """motion_cross_force in lane-minor layout."""
    v, w = m[..., :3, :], m[..., 3:, :]
    fl, tau = f[..., :3, :], f[..., 3:, :]
    return jnp.concatenate(
        [_cr3(w, fl), _cr3(w, tau) + _cr3(v, fl)], axis=-2
    )


def make_fd_rows_kernel(nv, nb, contact_bodies, contact_dims, kd, kp,
                        has_prefs):
    """Kernel body closed over the static contact configuration; the
    topology masks are runtime inputs (lane-replicated)."""
    nc = int(sum(contact_dims))
    offs = np.concatenate([[0], np.cumsum(contact_dims)])[:-1]

    def kernel(A_ref, D_ref, Dt_ref, S_ref, v_ref, Vb_ref, Vpar_ref, Vdof_ref,
               Ca_ref, Capar_ref, Accb_ref, h_ref, y_ref, I6_ref, lam_ref,
               pc_ref, act_ref, prefs_ref,
               ra1q_ref, ra1v_ref, r2q_ref, r2v_ref,
               SxS_s, G_s, F_s):
        L = S_ref.shape[-1]
        dt = S_ref.dtype
        S = S_ref[:]            # (nv, 6, L)
        v = v_ref[:]            # (nv, L)
        Vb = Vb_ref[:]          # (nb, 6, L)
        Vpar = Vpar_ref[:]      # (nv, 6, L)
        Vdof = Vdof_ref[:]      # (nv, 6, L)
        Ca = Ca_ref[:]          # (nb, 6, L)
        Capar = Capar_ref[:]    # (nv, 6, L)
        Accb = Accb_ref[:]      # (nb, 6, L)

        Sv = S * v[:, None, :]
        CVS = _mc(Vdof, S)      # (nv, 6, L)
        # masks arrive LANE-REPLICATED (…, L): Mosaic crashes on 1D→3D
        # broadcasts (vector expanding over sublane AND lane dims at
        # once); with the lane axis already present every broadcast below
        # only inserts middle axes — the pattern that compiles.
        Amat = A_ref[:]         # (nb, nv, L)
        Dmat = D_ref[:]         # (nv, nv, L) [k, j]
        Dt = Dt_ref[:]          # (nv, nv, L) [j, k]

        # --- SxS and G, one j-row at a time (bounds VMEM transients) ---
        def g_row(j, _):
            # implicit (1, 6, L) × (nv, 6, L) broadcasting inside the
            # cross products — an explicit broadcast_to here crashed the
            # Mosaic compiler (internal error in broadcast_in_dim)
            S_j = S_ref[pl.ds(j, 1)]                # (1, 6, L)
            sxs_j = _mc(S_j, S)                     # (nv, 6, L) row j
            SxS_s[pl.ds(j, 1)] = sxs_j[None]
            X1 = _mc(S_j, Vdof - Vpar_ref[pl.ds(j, 1)])
            X2 = _mc(X1, Sv)
            X3 = _mc(Vdof, sxs_j * v[:, None, :])
            dtj = Dt_ref[pl.ds(j, 1)][0]            # (nv, L) = Dt[j, :]
            G_s[pl.ds(j, 1)] = (dtj[:, None, :] * (X2 + X3))[None]
            return 0

        jax.lax.fori_loop(0, nv, g_row, 0)

        # --- per-body A-contractions of G / Gv, inline (no scratch:
        # the two (nb, nv, 6, L) buffers overflowed VMEM) ---
        def dAG_of(ab):
            return jnp.sum(G_s[:] * ab[None, :, None, :], axis=1)

        def dAvG_of(ab):
            return (
                jnp.sum(
                    SxS_s[:]
                    * (Dt * ab[None, :, :])[:, :, None, :]
                    * v[None, :, None, :],
                    axis=1,
                )
                + ab[:, None, :] * CVS
            )

        # --- init accumulators ---
        ra1q_ref[:] = jnp.zeros((nv, nv, L), dt)
        ra1v_ref[:] = jnp.zeros((nv, nv, L), dt)
        F_s[:] = jnp.zeros((nv, 6, L), dt)

        # --- body loop: force derivatives → dtau accumulations ---
        def body_step(b, _):
            ab = A_ref[pl.ds(b, 1)][0]              # (nv, L)
            abm = ab[:, None, :]
            Vb_b = Vb_ref[pl.ds(b, 1)][0]           # (6, L)
            Ca_b = Ca_ref[pl.ds(b, 1)][0]
            Accb_b = Accb_ref[pl.ds(b, 1)][0]
            h_b = h_ref[pl.ds(b, 1)][0]
            y_b = y_ref[pl.ds(b, 1)][0]
            I6_b = I6_ref[pl.ds(b, 1)][0]           # (6, 6, L)

            def i6b(z):  # I6_b @ z over the 6-axis: z (nv, 6, L)
                return jnp.sum(
                    I6_b[None, :, :, :] * z[:, None, :, :], axis=2
                )

            def bc6(x):  # (6, L) -> (nv, 6, L) broadcast
                return jnp.broadcast_to(x[None], S.shape)

            dV_b = abm * _mc(S, bc6(Vb_b) - Vpar)
            dAcc_b = abm * _mc(S, bc6(Ca_b) - Capar) + dAG_of(ab)
            dVv_b = abm * S
            dAccv_b = dAvG_of(ab)

            def dI6_con(w_vec, yw):  # (∂I6/∂q)·w without materializing dI6
                return abm * (
                    _mcf(S, bc6(yw)) - i6b(_mc(S, bc6(w_vec)))
                )

            df_b = (
                dI6_con(Accb_b, y_b)
                + i6b(dAcc_b)
                + _mcf(dV_b, bc6(h_b))
                + _mcf(bc6(Vb_b), dI6_con(Vb_b, h_b) + i6b(dV_b))
            )
            dfv_b = (
                i6b(dAccv_b)
                + _mcf(dVv_b, bc6(h_b))
                + _mcf(bc6(Vb_b), i6b(dVv_b))
            )

            f_b = y_b + _mcf(Vb_b[None], h_b[None])[0]  # (6, L)
            F_s[:] = F_s[:] + ab[:, None, :] * f_b[None]

            # dtau[k, j] += A[b, k] Σ_s S[k, s] df_b[j, s]
            acc_q = jnp.sum(S[:, None, :, :] * df_b[None, :, :, :], axis=2)
            ra1q_ref[:] = ra1q_ref[:] + ab[:, None, :] * acc_q
            acc_v = jnp.sum(S[:, None, :, :] * dfv_b[None, :, :, :], axis=2)
            ra1v_ref[:] = ra1v_ref[:] + ab[:, None, :] * acc_v
            return 0

        jax.lax.fori_loop(0, nb, body_step, 0)

        # --- term1 of dtau_dq: D[k, j] Σ_s SxS[j, k, s] F[k, s] ---
        SxS = SxS_s[:]
        E = jnp.sum(SxS * F_s[:][None, :, :, :], axis=2)  # E[j, k, L]
        ra1q_ref[:] = ra1q_ref[:] + Dmat * jnp.swapaxes(E, 0, 1)

        # --- per-contact acceleration rows + Jᵀλ transport ---
        for c, (bc, dim) in enumerate(zip(contact_bodies, contact_dims)):
            ab_c = Amat[bc]         # (nv, L) static row index
            abm = ab_c[:, None, :]
            Vb_bc = Vb[bc]          # (6, L)
            Ca_bc = Ca[bc]
            Accb_bc = Accb[bc]
            omega, VL = Vb_bc[3:, :], Vb_bc[:3, :]
            AccA = Accb_bc[3:, :]
            p_c = pc_ref[c]         # (3, L)
            act = act_ref[pl.ds(c, 1)]  # (1, L) keep-dims (1D values
            # trigger the Mosaic broadcast crash class)

            dV_c = abm * _mc(S, Vb_bc[None] - Vpar)
            dAcc_c = (
                abm * _mc(S, Ca_bc[None] - Capar) + dAG_of(ab_c)
            )
            dVv_c = abm * S
            dAccv_c = dAvG_of(ab_c)
            pdot = VL + _cr3(omega, p_c, axis=0)

            dp = ab_c[:, None, :] * (
                S[:, :3, :] + _cr3(S[:, 3:, :], p_c[None], axis=-2)
            )  # (nv, 3, L)
            dom, dVL_ = dV_c[:, 3:, :], dV_c[:, :3, :]
            dAccL, dAccA = dAcc_c[:, :3, :], dAcc_c[:, 3:, :]

            def bc3(x):  # (3, L) -> (nv, 3, L)
                return jnp.broadcast_to(x[None], dp.shape)

            dpdot = (
                dVL_
                + _cr3(dom, p_c[None], axis=-2)
                + _cr3(bc3(omega), dp, axis=-2)
            )
            dalpha_q = (
                dAccL
                + _cr3(dAccA, p_c[None], axis=-2)
                + _cr3(bc3(AccA), dp, axis=-2)
                + _cr3(dom, pdot[None], axis=-2)
                + _cr3(bc3(omega), dpdot, axis=-2)
            )
            domv, dVLv = dVv_c[:, 3:, :], dVv_c[:, :3, :]
            dAccLv, dAccAv = dAccv_c[:, :3, :], dAccv_c[:, 3:, :]
            dpdotv = dVLv + _cr3(domv, p_c[None], axis=-2)
            dalpha_v = (
                dAccLv
                + _cr3(dAccAv, p_c[None], axis=-2)
                + _cr3(domv, pdot[None], axis=-2)
                + _cr3(bc3(omega), dpdotv, axis=-2)
            )

            lin_q = dalpha_q + kd * dpdot
            lin_v = dalpha_v + kd * dpdotv
            if has_prefs:
                lin_q = lin_q + kp * dp

            off = int(offs[c])
            actb = act[None]        # (1, 1, L)
            r2q_ref[pl.ds(off, 3)] = actb * jnp.swapaxes(lin_q, 0, 1)
            r2v_ref[pl.ds(off, 3)] = actb * jnp.swapaxes(lin_v, 0, 1)
            if dim == 6:
                ang_q = jnp.swapaxes(dAccA + kd * dom, 0, 1)
                ang_v = jnp.swapaxes(dAccAv + kd * domv, 0, 1)
                r2q_ref[pl.ds(off + 3, 3)] = actb * ang_q
                r2v_ref[pl.ds(off + 3, 3)] = actb * ang_v

            # Jᵀλ configuration transport (→ ra1_q)
            w_f = lam_ref[pl.ds(off, 3)]            # (3, L)
            if dim == 6:
                w_tau = lam_ref[pl.ds(off + 3, 3)]
            else:
                w_tau = jnp.zeros_like(w_f)
            F_c = jnp.concatenate(
                [w_f, _cr3(p_c, w_f, axis=0) + w_tau], axis=0
            )  # (6, L)
            # s1[j, k] = Σ_s SxS[j, k, s] F_c[s] — F_c broadcast to the
            # (nv, 6, L) shape first (the (6, L) → (1, 1, 6, L)
            # double-leading expansion is in the Mosaic crash class; the
            # (nv, 6, L)[None] pattern matches the compiling term1 path)
            F_cb = jnp.broadcast_to(F_c[None], (nv, 6, L))
            s1 = jnp.sum(SxS * F_cb[None, :, :, :], axis=2)
            t1 = (ab_c[:, None, :] * Dmat) * jnp.swapaxes(s1, 0, 1)
            dpxw = _cr3(dp, bc3(w_f), axis=-2)
            # t2[k, j] = A[bc, k] Σ_c S_ang[k, c] dpxw[j, c]
            S_ang = S[:, 3:, :]
            t2 = ab_c[:, None, :] * jnp.sum(
                S_ang[:, None, :, :] * dpxw[None, :, :, :], axis=2
            )
            ra1q_ref[:] = ra1q_ref[:] + t1 + t2

    return kernel, nc


@functools.partial(
    jax.jit,
    static_argnames=(
        "contact_bodies", "contact_dims", "kd", "kp", "has_prefs",
        "interpret",
    ),
)
def fd_rows_lanes(
    S, v, Vb, Vpar, Vdof, Ca, Capar, Accb, h, y, I6, lam, pcs, active,
    prefs, A2, D2, Dt2, *, contact_bodies, contact_dims, kd, kp,
    has_prefs, interpret=False,
):
    """Run the fused derivative-rows kernel over a flat instance batch.

    Inputs are standard-layout batched arrays (K leading); the wrapper
    transposes to lane-minor, pads K to the next 128-lane boundary and
    tiles the grid.  The topology masks ``A2`` (nb, nv), ``D2``/``Dt2``
    (nv, nv) are RUNTIME ARRAY inputs — deliberately, so wrappers above
    (``derivatives._fd_rows_kernel_cv``) stay consts-free, which is what
    keeps the custom_vmap dispatch legal inside a vmapped while_loop.
    Returns ``(ra1_q, ra1_v, r2_q, r2_v)`` with K leading.
    """
    nb, nv = A2.shape
    K = S.shape[0]
    dt = S.dtype

    kernel, nc = make_fd_rows_kernel(
        nv, nb, contact_bodies, contact_dims, kd, kp, has_prefs
    )

    pad = (-K) % LANES
    Kp = K + pad

    def lane(x):  # (K, ...) -> (..., Kp)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
            )
        return jnp.moveaxis(x, 0, -1)

    ncont = len(contact_bodies)

    def lane_rep(m):  # replicate a mask over the 128 lanes
        return jnp.broadcast_to(
            m.astype(dt)[:, :, None], m.shape + (LANES,)
        )

    ins = [lane_rep(A2), lane_rep(D2), lane_rep(Dt2)] + [
        lane(x)
        for x in (
            S, v, Vb, Vpar, Vdof, Ca, Capar, Accb, h, y, I6, lam, pcs,
            active, prefs,
        )
    ]

    grid = (Kp // LANES,)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape + (LANES,), lambda ib: (0,) * nd + (ib,))

    def cspec(shape):  # constant input (lane-replicated), same block
        nd = len(shape)
        return pl.BlockSpec(
            shape + (LANES,), lambda ib: (0,) * (nd + 1)
        )

    in_specs = [
        cspec((nb, nv)), cspec((nv, nv)), cspec((nv, nv)),
        bspec((nv, 6)), bspec((nv,)), bspec((nb, 6)), bspec((nv, 6)),
        bspec((nv, 6)), bspec((nb, 6)), bspec((nv, 6)), bspec((nb, 6)),
        bspec((nb, 6)), bspec((nb, 6)), bspec((nb, 6, 6)), bspec((nc,)),
        bspec((ncont, 3)), bspec((ncont,)), bspec((ncont, 3)),
    ]
    out_specs = [
        bspec((nv, nv)), bspec((nv, nv)), bspec((nc, nv)), bspec((nc, nv)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nv, nv, Kp), dt),
        jax.ShapeDtypeStruct((nv, nv, Kp), dt),
        jax.ShapeDtypeStruct((nc, nv, Kp), dt),
        jax.ShapeDtypeStruct((nc, nv, Kp), dt),
    ]
    scratch_shapes = [
        pltpu.VMEM((nv, nv, 6, LANES), dt),   # SxS
        pltpu.VMEM((nv, nv, 6, LANES), dt),   # G
        pltpu.VMEM((nv, 6, LANES), dt),       # F
    ]

    try:
        cparams = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    except TypeError:  # older jax spelling
        cparams = pltpu.TPUCompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=cparams,
        interpret=interpret,
    )(*ins)

    def unlane(x):
        return jnp.moveaxis(x, -1, 0)[:K]

    return tuple(unlane(o) for o in outs)
