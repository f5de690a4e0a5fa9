"""Fused whole-stage batch-on-lanes Pallas kernel for the medium-dim
proximal Riccati backward sweep.

Round-4 VERDICT item 3 ("finish the medium-dim kernel story"): after the
batch-on-lanes SPD kernel (``pallas_spd.py``) took the Schur solves, the
round-3 op-count decomposition still left ~47% of the nx=36 stage on XLA —
the value-propagation GEMMs (AᵀV A, BᵀV B, AᵀV B ≈ 25%) and the reduced-KKT
assembly (≈ 22%) run as per-scenario 36×36 batched matmuls that cannot tile
onto the MXU.  This kernel fuses the ENTIRE stage recursion body
(reference ``gar/riccati-kernel.hxx:166-300`` stageKernelSolve) into one
Pallas dispatch per stage with the scenario batch laid on the 128-wide lane
axis:

* the (I + μ_dyn P) Schur solve, the value GEMMs, the reduced-KKT Schur-of-μ
  assembly ``W = R̂ + DᵀD/μ_eq``, its Cholesky, and every gain product run
  as (m, n, 128) VPU ops with NO intermediate HBM round-trips;
* matmuls are unrolled over the contraction axis — per step one
  (m, 1, 128) × (1, n, 128) broadcast FMA — so the lowered op count is
  O(n) per GEMM, not O(n³) (same discipline as ``pallas_spd``);
* transposed operands (Aᵀ, Bᵀ, Cᵀ, Dᵀ, Sᵀ) are produced OUTSIDE the kernel
  by laying the same batch-major array out lane-major with the two matrix
  axes swapped — a free re-indexing at the layout pass, not a copy chain
  inside the kernel (in-kernel sublane transposes are the expensive op);
* value symmetrization (``_sym`` in the XLA path) happens on the carry
  BETWEEN kernel calls in XLA — one cheap transpose per stage — so the
  kernel body stays transpose-free.

Layout contract: the whole backward sweep runs lane-major — stage data is
pre-transposed ONCE to ``(N, rows, cols, B)`` before the scan and gains are
transposed back once after, so the per-stage HBM traffic is the same
stream the XLA scan pays.

Restrictions (checked by :func:`fused_stage_eligible`): fp32, explicit
dynamics (E = −I), no θ-block, nc ≥ 1, batch a multiple of 128, VMEM
estimate under cap.  The μ parameters are per-lane (each scenario's BCL
schedule evolves independently under vmap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def fused_stage_eligible(axis_size, nx, nu, nc, dtype, nth=0,
                         assume_explicit=True, backend=None):
    """Static eligibility of a batched backward sweep for the fused stage
    kernel.  The VMEM estimate counts double-buffered in/out blocks plus
    the scratch workspaces at 128 lanes fp32; the cap is conservative
    against the 100 MB ``vmem_limit_bytes`` the kernel requests (the same
    idiom as ``modelling/multibody/pallas_tensors.py``).

    The ``nx <= 44`` ceiling is measured, not architectural: at humanoid
    dims (nx=36, nu=12, nc=12, batch 1024) the fused sweep is **1.24×**
    end-to-end on v5e (2,462 → 3,052 ProxDDP solves/s), but at the lqr56
    shape (nx=56, nu=22, batch 256) it is 0.86× — the per-lane unrolled
    O(n³) FMA chains grow faster than XLA's batched-GEMM path and only
    2 lane tiles are live.  Between the two measured points the cutoff is
    placed at 44."""
    if backend is None:
        backend = jax.default_backend()
    r1 = nx + 1
    words_in = (
        2 * nx * nx          # Q, P
        + 3 * nx * nu        # S, St(=S other layout), B/Bt share counts below
        + nu * nu            # R
        + 2 * nx * nx        # A, At
        + 2 * nx * nu        # B, Bt
        + 2 * nc * nx        # C, Ct
        + 2 * nc * nu        # D, Dt
        + 3 * nx + nu + nc + 2  # q, p, f, r, d, mud, mue
    )
    words_out = nu * r1 + nc * r1 + 2 * nx + 2 * nx * nx + nx * nx + nx
    words_scratch = nx * nx + 3 * nx * r1 + nu * nu + nu * r1
    vmem_est = 4 * LANES * (2 * (words_in + words_out) + words_scratch)
    return (
        backend == "tpu"
        and dtype == jnp.float32
        and nth == 0
        and assume_explicit
        and axis_size >= LANES
        and axis_size % LANES == 0
        and nx >= 12
        and nx <= 44
        and nu >= 1
        and vmem_est < 48 * 1024 * 1024
    )


def _mm(A, B):
    """Contraction over the shared middle axis: A (m, K, L) @ B (K, n, L)
    → (m, n, L), unrolled as K broadcast FMAs (each (m,1,L) × (1,n,L))."""
    K = A.shape[1]
    acc = A[:, 0:1, :] * B[0:1, :, :]
    for k in range(1, K):
        acc = acc + A[:, k : k + 1, :] * B[k : k + 1, :, :]
    return acc


def _chol_inplace(W_ref, n, ii, jj):
    """Right-looking Cholesky of the (n, n, L) block in place; on exit the
    lower triangle (diagonal included) holds L.  Same loop as
    ``pallas_spd._spd_kernel`` (kept in both modules: the refs live in
    different kernel bodies)."""
    for k in range(n):
        d = W_ref[pl.ds(k, 1), pl.ds(k, 1), :]
        rd = 1.0 / jnp.sqrt(d)
        colk = W_ref[:, pl.ds(k, 1), :] * rd
        rowk = W_ref[pl.ds(k, 1), :, :] * rd
        cm = jnp.where(ii > k, colk, 0.0)
        rm = jnp.where(jj > k, rowk, 0.0)
        W_ref[:] = W_ref[:] - cm * rm
        W_ref[:, pl.ds(k, 1), :] = jnp.where(ii >= k, colk, 0.0)


def _subst_inplace(W_ref, X_ref, n, ii):
    """Forward + backward substitution solving (L Lᵀ) X = X in place."""
    for j in range(n):
        lcol = W_ref[:, pl.ds(j, 1), :]
        ljj = W_ref[pl.ds(j, 1), pl.ds(j, 1), :]
        yj = X_ref[pl.ds(j, 1), :, :] / ljj
        X_ref[pl.ds(j, 1), :, :] = yj
        cm = jnp.where(ii > j, lcol, 0.0)
        X_ref[:] = X_ref[:] - cm * yj
    for t in range(n):
        i = n - 1 - t
        lcol = W_ref[:, pl.ds(i, 1), :]
        lii = W_ref[pl.ds(i, 1), pl.ds(i, 1), :]
        cm = jnp.where(ii > i, lcol, 0.0)
        s = jnp.sum(cm * X_ref[:], axis=0, keepdims=True)
        X_ref[pl.ds(i, 1), :, :] = (X_ref[pl.ds(i, 1), :, :] - s) / lii


def _stage_kernel(
    # inputs (lane-major blocks)
    Q_ref, S_ref, St_ref, R_ref, q_ref, r_ref,
    A_ref, At_ref, B_ref, Bt_ref, f_ref,
    C_ref, Ct_ref, D_ref, Dt_ref, d_ref,
    P_ref, p_ref, mud_ref, mue_ref,
    # outputs
    kff_ref, K_ref, zff_ref, Z_ref, lff_ref, L_ref, yff_ref, Afb_ref,
    Pc_ref, pc_ref,
    # scratch
    W1_ref, SOL_ref, W2_ref, U_ref, PAN1_ref, PAN2_ref,
):
    """One fused backward stage, explicit dynamics (E = −I).  Mirrors
    ``riccati._stage_kernel`` (reference riccati-kernel.hxx:166) term for
    term; see the module docstring for what is deliberately different
    (no in-kernel symmetrization)."""
    nx = Q_ref.shape[0]
    nu = R_ref.shape[0]

    iix = jax.lax.broadcasted_iota(jnp.int32, (nx, 1, 1), 0)
    jjx = jax.lax.broadcasted_iota(jnp.int32, (1, nx, 1), 1)
    iiu = jax.lax.broadcasted_iota(jnp.int32, (nu, 1, 1), 0)
    jju = jax.lax.broadcasted_iota(jnp.int32, (1, nu, 1), 1)

    mud = mud_ref[:]  # (1, 1, L)
    mue = mue_ref[:]
    P = P_ref[:]
    p = p_ref[:]      # (nx, 1, L)
    f = f_ref[:]
    A = A_ref[:]
    Bm = B_ref[:]

    # --- Schur solve: (I + mudyn P) [Vxx | vx] = [P | p + P f] -----------
    eye = jnp.where(iix == jjx, 1.0, 0.0)
    W1_ref[:] = eye + mud * P
    SOL_ref[:, : nx, :] = P
    SOL_ref[:, pl.ds(nx, 1), :] = p + _mm(P, f)
    _chol_inplace(W1_ref, nx, iix, jjx)
    _subst_inplace(W1_ref, SOL_ref, nx, iix)
    sol = SOL_ref[:]              # [Vxx | vx]  (nx, nx+1, L)
    Vxx = sol[:, :nx, :]
    vx = sol[:, nx : nx + 1, :]

    # --- value-propagation GEMMs ----------------------------------------
    AtVfull = _mm(At_ref[:], sol)   # [AᵀV | Aᵀvx]  (nx, nx+1, L)
    BtVfull = _mm(Bt_ref[:], sol)   # [BᵀV | Bᵀvx]  (nu, nx+1, L)
    AtV = AtVfull[:, :nx, :]
    BtV = BtVfull[:, :nx, :]
    Qhat = Q_ref[:] + _mm(AtV, A)
    Rhat = R_ref[:] + _mm(BtV, Bm)
    Shat = S_ref[:] + _mm(AtV, Bm)          # (nx, nu, L)
    ShatT = St_ref[:] + _mm(BtV, A)         # (nu, nx, L)
    qhat = q_ref[:] + AtVfull[:, nx : nx + 1, :]
    rhat = r_ref[:] + BtVfull[:, nx : nx + 1, :]

    # --- reduced KKT: Schur of μ_eq, SPD Cholesky -----------------------
    D = D_ref[:]
    Dt = Dt_ref[:]
    C = C_ref[:]
    d = d_ref[:]
    W2_ref[:] = Rhat + _mm(Dt, D) / mue
    U_ref[:, 0:1, :] = -(rhat + _mm(Dt, d) / mue)
    U_ref[:, 1:, :] = -(ShatT + _mm(Dt, C) / mue)
    _chol_inplace(W2_ref, nu, iiu, jju)
    _subst_inplace(W2_ref, U_ref, nu, iiu)
    U = U_ref[:]                  # [kff | K]  (nu, nx+1, L)
    kff = U[:, 0:1, :]
    K = U[:, 1:, :]
    zff = (_mm(D, kff) + d) / mue
    Z = (_mm(D, K) + C) / mue

    # --- gains + closed loop (explicit: E = −I) -------------------------
    # Panels go through scratch refs and narrow columns are read back as
    # REF slices: adding two 1-wide second-minor slices of (nx, nx+1, L)
    # VALUES crashes the Mosaic lowering (lower_to_llo.cc `d >> 32` check,
    # measured on v5e) while the identical ref-slice reads are the pattern
    # the Cholesky loops already rely on.
    PAN1_ref[:] = _mm(Bm, U)      # [B kff | B K]  (nx, nx+1, L)
    PAN2_ref[:] = _mm(Vxx, PAN1_ref[:])
    lff = SOL_ref[:, pl.ds(nx, 1), :] + PAN2_ref[:, pl.ds(0, 1), :]
    VA = _mm(Vxx, A)
    L = VA + PAN2_ref[:, 1:, :]
    yff = f + PAN1_ref[:, pl.ds(0, 1), :] - mud * lff
    Afb = A + PAN1_ref[:, 1:, :] - mud * L

    # --- value update (symmetrization happens outside, on the carry) ----
    PAN1_ref[:] = _mm(Shat, U)    # Ŝ [kff | K]  (nx, nx+1, L)
    Ct = Ct_ref[:]
    Pc = Qhat + PAN1_ref[:, 1:, :] + _mm(Ct, Z)
    pc = qhat + PAN1_ref[:, pl.ds(0, 1), :] + _mm(Ct, zff)

    kff_ref[:] = kff
    K_ref[:] = K
    zff_ref[:] = zff
    Z_ref[:] = Z
    lff_ref[:] = lff
    L_ref[:] = L
    yff_ref[:] = yff
    Afb_ref[:] = Afb
    Pc_ref[:] = Pc
    pc_ref[:] = pc


@functools.partial(
    jax.jit, static_argnames=("nx", "nu", "nc", "interpret")
)
def _stage_call(knot, P, p, mud, mue, nx, nu, nc, interpret=False):
    """One fused stage over the whole lane-major batch.  ``knot`` is a dict
    of lane-major blocks (see :func:`sweep_lanes`); returns the 10 stage
    outputs lane-major."""
    B = P.shape[-1]
    grid = (B // LANES,)
    dt = P.dtype
    r1 = nx + 1

    bspec = lambda d0, d1: pl.BlockSpec(  # noqa: E731
        (d0, d1, LANES), lambda ib: (0, 0, ib)
    )
    in_specs = [
        bspec(nx, nx), bspec(nx, nu), bspec(nu, nx), bspec(nu, nu),
        bspec(nx, 1), bspec(nu, 1),
        bspec(nx, nx), bspec(nx, nx), bspec(nx, nu), bspec(nu, nx),
        bspec(nx, 1),
        bspec(nc, nx), bspec(nx, nc), bspec(nc, nu), bspec(nu, nc),
        bspec(nc, 1),
        bspec(nx, nx), bspec(nx, 1), bspec(1, 1), bspec(1, 1),
    ]
    out_specs = [
        bspec(nu, 1), bspec(nu, nx), bspec(nc, 1), bspec(nc, nx),
        bspec(nx, 1), bspec(nx, nx), bspec(nx, 1), bspec(nx, nx),
        bspec(nx, nx), bspec(nx, 1),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(s.block_shape[:2] + (B,), dt) for s in out_specs
    ]
    scratch = [
        pltpu.VMEM((nx, nx, LANES), dt),
        pltpu.VMEM((nx, r1, LANES), dt),
        pltpu.VMEM((nu, nu, LANES), dt),
        pltpu.VMEM((nu, r1, LANES), dt),
        pltpu.VMEM((nx, r1, LANES), dt),
        pltpu.VMEM((nx, r1, LANES), dt),
    ]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    return pl.pallas_call(
        _stage_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(
        knot["Q"], knot["S"], knot["St"], knot["R"], knot["q"], knot["r"],
        knot["A"], knot["At"], knot["B"], knot["Bt"], knot["f"],
        knot["C"], knot["Ct"], knot["D"], knot["Dt"], knot["d"],
        P, p, mud, mue,
    )


def _lane_mat(x):
    """(B, N, r, c) batch-major → (N, r, c, B) lane-major."""
    return jnp.transpose(x, (1, 2, 3, 0))


def _lane_mat_T(x):
    """(B, N, r, c) batch-major → (N, c, r, B): the transposed operand in
    lane-major layout, a pure re-indexing of the same array."""
    return jnp.transpose(x, (1, 3, 2, 0))


def _lane_vec(x):
    """(B, N, n) batch-major → (N, n, 1, B)."""
    return jnp.transpose(x, (1, 2, 0))[:, :, None, :]


def sweep_lanes(knot_fields, carry0, mudyn, mueq, interpret=False):
    """Batched backward Riccati sweep through the fused stage kernel.

    ``knot_fields``: dict of batch-major stacked knots — matrices
    ``(B, N, r, c)``, vectors ``(B, N, n)`` (the ``riccati.sweep`` scan
    inputs with a leading batch axis).  ``carry0``: ``{"P": (B, nx, nx),
    "p": (B, nx)}``.  ``mudyn``/``mueq``: ``(B,)`` per-scenario parameters.
    Returns ``(carry_f, stages)`` in the same batch-major layout as
    ``jax.vmap`` of the scan path.
    """
    Q = knot_fields["Q"]
    B_, N = Q.shape[0], Q.shape[1]
    nx = Q.shape[-1]
    nu = knot_fields["R"].shape[-1]
    nc = knot_fields["C"].shape[-2]
    nc_in = nc
    if nc == 0:
        # unconstrained stages: pad to one all-zero constraint row — the
        # reduced KKT is unchanged (DᵀD = 0, zff = Z = 0, CᵀZ = 0) and the
        # kernel keeps its fixed operand list; the dummy multiplier rows
        # are sliced off below
        dt = Q.dtype
        knot_fields = dict(
            knot_fields,
            C=jnp.zeros((B_, N, 1, nx), dt),
            D=jnp.zeros((B_, N, 1, nu), dt),
            d=jnp.zeros((B_, N, 1), dt),
        )
        nc = 1

    xs = dict(
        Q=_lane_mat(knot_fields["Q"]),
        S=_lane_mat(knot_fields["S"]),
        St=_lane_mat_T(knot_fields["S"]),
        R=_lane_mat(knot_fields["R"]),
        q=_lane_vec(knot_fields["q"]),
        r=_lane_vec(knot_fields["r"]),
        A=_lane_mat(knot_fields["A"]),
        At=_lane_mat_T(knot_fields["A"]),
        B=_lane_mat(knot_fields["B"]),
        Bt=_lane_mat_T(knot_fields["B"]),
        f=_lane_vec(knot_fields["f"]),
        C=_lane_mat(knot_fields["C"]),
        Ct=_lane_mat_T(knot_fields["C"]),
        D=_lane_mat(knot_fields["D"]),
        Dt=_lane_mat_T(knot_fields["D"]),
        d=_lane_vec(knot_fields["d"]),
    )
    P0 = jnp.transpose(carry0["P"], (1, 2, 0))
    p0 = jnp.transpose(carry0["p"], (1, 0))[:, None, :]
    mud = jnp.broadcast_to(jnp.asarray(mudyn), (B_,))[None, None, :]
    mue = jnp.broadcast_to(jnp.asarray(mueq), (B_,))[None, None, :]

    def body(carry, knot):
        P, p = carry
        outs = _stage_call(knot, P, p, mud, mue, nx, nu, nc, interpret)
        kff, K, zff, Z, lff, L, yff, Afb, Pc, pc = outs
        # symmetrize the carry in XLA — one transpose per stage keeps the
        # kernel body transpose-free and stops roundoff asymmetry from
        # accumulating down the recursion (riccati._sym's role)
        Pc = 0.5 * (Pc + jnp.swapaxes(Pc, 0, 1))
        out = dict(
            kff=kff, K=K, zff=zff, Z=Z, lff=lff, L=L, yff=yff, Afb=Afb,
            Pmat=Pc, pvec=pc,
        )
        return (Pc, pc), out

    (Pf, pf), stages = jax.lax.scan(body, (P0, p0), xs, reverse=True)

    def back_mat(x):  # (N, r, c, B) → (B, N, r, c)
        return jnp.transpose(x, (3, 0, 1, 2))

    def back_vec(x):  # (N, n, 1, B) → (B, N, n)
        return jnp.transpose(x[:, :, 0, :], (2, 0, 1))

    stages_bm = dict(
        kff=back_vec(stages["kff"]),
        K=back_mat(stages["K"]),
        zff=back_vec(stages["zff"])[:, :, :nc_in],
        Z=back_mat(stages["Z"])[:, :, :nc_in],
        lff=back_vec(stages["lff"]),
        L=back_mat(stages["L"]),
        yff=back_vec(stages["yff"]),
        Afb=back_mat(stages["Afb"]),
        Pmat=back_mat(stages["Pmat"]),
        pvec=back_vec(stages["pvec"]),
    )
    carry_f = dict(
        P=jnp.transpose(Pf, (2, 0, 1)),
        p=jnp.transpose(pf[:, 0, :], (1, 0)),
    )
    return carry_f, stages_bm


# ---------------------------------------------------------------------------
# Fused forward substitution (the rollout of the computed gains)
# ---------------------------------------------------------------------------


def fwd_lanes_eligible(axis_size, nx, nu, nc, dtype, backend=None):
    """Eligibility of the batched forward substitution for the lanes
    kernel.  The forward pass is 4 matvecs per stage — tiny batched GEMVs
    that XLA cannot tile well (measured ~22 ms of the 113 ms humanoid-dim
    LQ solve at batch 1024); there is no O(n³) growth here so no upper
    nx ceiling."""
    if backend is None:
        backend = jax.default_backend()
    words = 2 * nx * nx + nx * nu + nc * nx + 4 * nx + nu + nc
    return (
        backend == "tpu"
        and dtype == jnp.float32
        and axis_size >= LANES
        and axis_size % LANES == 0
        and nx >= 12
        and nu >= 1
        and 4 * LANES * 2 * words < 48 * 1024 * 1024
    )


def _fwd_kernel(kff_ref, K_ref, zff_ref, Z_ref, lff_ref, L_ref, yff_ref,
                Afb_ref, x_ref, u_ref, v_ref, lam_ref, xn_ref):
    """One forward stage: u = kff + K x, v = zff + Z x,
    λ⁺ = lff + L x, x⁺ = yff + A_fb x (riccati.forward body,
    reference forwardImpl riccati-kernel.hxx:302)."""
    x = x_ref[:]
    u_ref[:] = kff_ref[:] + _mm(K_ref[:], x)
    v_ref[:] = zff_ref[:] + _mm(Z_ref[:], x)
    lam_ref[:] = lff_ref[:] + _mm(L_ref[:], x)
    xn_ref[:] = yff_ref[:] + _mm(Afb_ref[:], x)


@functools.partial(jax.jit, static_argnames=("nx", "nu", "nc", "interpret"))
def _fwd_call(knot, x, nx, nu, nc, interpret=False):
    B = x.shape[-1]
    grid = (B // LANES,)
    dt = x.dtype
    bspec = lambda d0, d1: pl.BlockSpec(  # noqa: E731
        (d0, d1, LANES), lambda ib: (0, 0, ib)
    )
    in_specs = [
        bspec(nu, 1), bspec(nu, nx), bspec(nc, 1), bspec(nc, nx),
        bspec(nx, 1), bspec(nx, nx), bspec(nx, 1), bspec(nx, nx),
        bspec(nx, 1),
    ]
    out_specs = [bspec(nu, 1), bspec(nc, 1), bspec(nx, 1), bspec(nx, 1)]
    out_shape = [
        jax.ShapeDtypeStruct(s.block_shape[:2] + (B,), dt) for s in out_specs
    ]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(
        knot["kff"], knot["K"], knot["zff"], knot["Z"],
        knot["lff"], knot["L"], knot["yff"], knot["Afb"], x,
    )


def forward_lanes(fields, x0, interpret=False):
    """Batched forward substitution through the lanes kernel.

    ``fields``: dict of batch-major stacked gains (the ``riccati.forward``
    scan inputs with a leading batch axis): kff/zff/lff/yff ``(B, N, n)``,
    K/Z/L/Afb ``(B, N, r, c)``.  ``x0``: ``(B, nx)``.  Returns
    ``(xN, outs)`` matching ``lax.scan`` of the forward body: ``outs`` has
    ``x`` (the pre-update state), ``u``, ``v``, ``lam_next``, each
    ``(B, N, ·)``.
    """
    K = fields["K"]
    B_, N = K.shape[0], K.shape[1]
    nu, nx = K.shape[2], K.shape[3]
    nc = fields["Z"].shape[2]
    nc_in = nc
    if nc == 0:
        dt = K.dtype
        fields = dict(
            fields,
            Z=jnp.zeros((B_, N, 1, nx), dt),
            zff=jnp.zeros((B_, N, 1), dt),
        )
        nc = 1

    xs = dict(
        kff=_lane_vec(fields["kff"]), K=_lane_mat(fields["K"]),
        zff=_lane_vec(fields["zff"]), Z=_lane_mat(fields["Z"]),
        lff=_lane_vec(fields["lff"]), L=_lane_mat(fields["L"]),
        yff=_lane_vec(fields["yff"]), Afb=_lane_mat(fields["Afb"]),
    )
    x0_l = jnp.transpose(x0, (1, 0))[:, None, :]

    def body(x, knot):
        u, v, lam, xn = _fwd_call(knot, x, nx, nu, nc, interpret)
        return xn, dict(x=x, u=u, v=v, lam_next=lam)

    xN, outs = jax.lax.scan(body, x0_l, xs)

    def back_vec(v):  # (N, n, 1, B) → (B, N, n)
        return jnp.transpose(v[:, :, 0, :], (2, 0, 1))

    outs_bm = dict(
        x=back_vec(outs["x"]),
        u=back_vec(outs["u"]),
        v=back_vec(outs["v"])[:, :, :nc_in],
        lam_next=back_vec(outs["lam_next"]),
    )
    return jnp.transpose(xN[:, 0, :], (1, 0)), outs_bm
