"""Parallel-in-time proximal Riccati solver (leg condensation).

TPU-native re-design of the reference's ``ParallelRiccatiSolver``
(``include/aligator/gar/parallel-solver.hxx``, RSS 2024): the horizon is
split into L equal legs; each non-last leg is θ-parameterized by the costate
at its outgoing interface (``setupKnot``: Gx = Aᵀ, Gu = Bᵀ, Gth = −μ_dyn I,
γ = f — ``parallel-solver.hpp:43-51``); the per-leg backward sweeps run
**batched via `vmap`** over the leg axis (the TPU replacement for OpenMP
threads — and shardable across devices along that axis); their boundary
value functions are assembled into a symmetric block-tridiagonal "condensed"
interface system solved by a short `lax.scan`; forward substitution seeds
each leg from the condensed solution and again `vmap`s over legs.

Requirements: uniform leg length (``(N+1) % legs == 0``) and
``nc0 == nx`` (state-dimension initial constraint) so the condensed blocks
are uniform — both are the natural TPU padding conventions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .._pytree import pytree_dataclass, replace
from . import block_tridiag
from .lqr_problem import LQRKnots, LQRProblem, add_parameterization
from .riccati import forward as serial_forward
from .riccati import RiccatiFactors, sweep


def _split_legs(kn: LQRKnots, legs: int) -> LQRKnots:
    """Reshape stacked knots (T, ...) → (legs, m, ...)."""
    T = kn.Q.shape[0]
    m = T // legs
    return jax.tree.map(lambda a: a.reshape((legs, m) + a.shape[1:]), kn)


@pytree_dataclass
class ParallelGains:
    """Control gains recovered from the parallel-in-time solve (for MPC).

    ``kff`` has the θ-feedback folded in using the solved interface costates
    (so ``u_t = kff_t + K_t x_t`` exactly reproduces the solution controls);
    ``K[0]`` is the *collapsed* first-stage feedback — the θ-sensitivity is
    folded into state feedback via the condensed elimination chain
    (reference ``collapseFeedback``, ``parallel-solver.hpp:55-66``) so it
    equals the serial solver's ``K[0]``.
    """

    kff: jax.Array  # (T, nu)
    K: jax.Array  # (T, nu, nx)


def solve(
    problem: LQRProblem,
    mudyn,
    mueq,
    legs: int,
    assume_explicit: bool = False,
    time_sharding=None,
    refine_steps: int = 1,
    return_gains: bool = False,
):
    """Solve the proximal LQ problem with L parallel legs.

    Returns ``(xs, us, vs, lams)`` identical (to rounding) to the serial
    solver — cross-validated in ``tests/gar/test_parallel.py`` exactly as the
    reference validates (``tests/gar/parallel.cpp``). With ``return_gains``
    a :class:`ParallelGains` is appended to the tuple.

    ``refine_steps`` iterative-refinement passes run on the condensed
    interface system (reference ``parallel-solver.hxx:148-175``), which is
    what keeps many-leg fp32 solves accurate.
    """
    kn = problem.knots
    T = kn.Q.shape[0]
    nx = kn.nx
    if T % legs != 0:
        raise ValueError(f"horizon+1={T} must be divisible by legs={legs}")
    if problem.nc0 != nx:
        raise ValueError("parallel solver requires nc0 == nx (pad G0)")
    m = T // legs
    dt = kn.Q.dtype

    # 1. parameterize all legs by θ of dim nx (the last leg keeps zero
    #    G-blocks → its θ-quantities vanish identically).
    if kn.nth != nx:
        kn = add_parameterization(kn, nx)

    # 2. interface knots: last knot of each non-last leg gets the costate
    #    parameterization (reference setupKnot).
    idx = jnp.arange(legs - 1) * m + (m - 1)  # global knot indices
    eye = jnp.eye(nx, dtype=dt)
    kn = replace(
        kn,
        Gx=kn.Gx.at[idx].set(jnp.swapaxes(kn.A[idx], -1, -2)),
        Gu=kn.Gu.at[idx].set(jnp.swapaxes(kn.B[idx], -1, -2)),
        Gth=kn.Gth.at[idx].set(-mudyn * eye),
        gamma=kn.gamma.at[idx].set(kn.f[idx]),
    )

    legs_kn = _split_legs(kn, legs)
    if time_sharding is not None:
        # shard the leg axis over devices: each device runs its legs'
        # backward/forward sweeps; only the tiny condensed system is global
        # (the reference's OpenMP legs → ICI-sharded legs).
        legs_kn = jax.lax.with_sharding_constraint(legs_kn, time_sharding)

    # 3. per-leg backward sweeps, batched over the leg axis.
    carries, stages = jax.vmap(
        lambda k: sweep(k, mudyn, mueq, assume_explicit)
    )(legs_kn)
    P_leg = carries["P"]  # (legs, nx, nx)  value at leg head
    p_leg = carries["p"]  # (legs, nx)
    Vxt_leg = carries["Vxt"]  # (legs, nx, nx)
    Vtt_leg = carries["Vtt"]  # (legs, nx, nx)
    vt_leg = carries["vt"]  # (legs, nx)

    # 4. condensed symmetric block-tridiagonal system in the interface
    #    variables [λ0, x_0^{(0)}, θ_0, x_0^{(1)}, θ_1, ..., x_0^{(L-1)}]
    #    (reference assembleCondensedSystem, parallel-solver.hxx:64-109).
    K = 2 * legs
    diag = jnp.zeros((K, nx, nx), dt)
    lower = jnp.zeros((K - 1, nx, nx), dt)
    rhs = jnp.zeros((K, nx), dt)

    diag = diag.at[0].set(-mudyn * eye)
    diag = diag.at[1::2].set(P_leg)  # blocks 1, 3, ..., 2L-1: leg-head values
    diag = diag.at[2::2].set(Vtt_leg[: legs - 1])  # θ blocks

    # super-diagonal entries (stored transposed in `lower` = subdiagonal):
    # block (0,1): G0 ; (2i+1, 2i+2): Vxt_leg[i] ; (2i+2, 2i+3): E at interface
    E_if = kn.E[idx] if legs > 1 else jnp.zeros((0, nx, nx), dt)
    lower = lower.at[0].set(problem.G0.T)
    lower = lower.at[1::2].set(jnp.swapaxes(Vxt_leg[: legs - 1], -1, -2))
    lower = lower.at[2::2].set(jnp.swapaxes(E_if, -1, -2))

    rhs = rhs.at[0].set(-problem.g0)
    rhs = rhs.at[1::2].set(-p_leg)
    rhs = rhs.at[2::2].set(-vt_leg[: legs - 1])

    bt_factors = block_tridiag.factorize(diag, lower)
    sol = block_tridiag.solve_factored(bt_factors, lower, rhs)  # (K, nx)
    for _ in range(refine_steps):
        resid = rhs - block_tridiag.matmul(diag, lower, sol)
        sol = sol + block_tridiag.solve_factored(bt_factors, lower, resid)

    lam_heads = sol[0::2]  # (legs,) λ at each leg head
    x_heads = sol[1::2]  # (legs,) x at each leg head
    # θ_i = λ at the head of leg i+1 (zero θ for the last leg)
    thetas = jnp.concatenate(
        [lam_heads[1:], jnp.zeros((1, nx), dt)], axis=0
    )

    # 5. per-leg forward substitution, batched over legs.
    def leg_forward(leg_facs, x0, lam0, theta):
        facs = RiccatiFactors(
            kff=leg_facs["kff"],
            K=leg_facs["K"],
            zff=leg_facs["zff"],
            Z=leg_facs["Z"],
            lff=leg_facs["lff"],
            L=leg_facs["L"],
            yff=leg_facs["yff"],
            Afb=leg_facs["Afb"],
            Pmat=leg_facs["Pmat"],
            pvec=leg_facs["pvec"],
            x0=x0,
            lam0=lam0,
            Kth=leg_facs["Kth"],
            Zth=leg_facs["Zth"],
            Lth=leg_facs["Lth"],
            Yth=leg_facs["Yth"],
            Vxt=leg_facs["Vxt"],
            Vtt=leg_facs["Vtt"],
            vt=leg_facs["vt"],
        )
        return serial_forward(facs, theta=theta, x0=x0, lam0=lam0)

    if time_sharding is not None:
        stages = jax.lax.with_sharding_constraint(stages, time_sharding)
    xs_l, us_l, vs_l, lams_l = jax.vmap(leg_forward)(
        stages, x_heads, lam_heads, thetas
    )
    # (legs, m, ·) → (T, ·); per-leg lams[0] is the leg-head costate which is
    # the global costate at that index.
    def merge(a):
        return a.reshape((T,) + a.shape[2:])

    out = (merge(xs_l), merge(us_l), merge(vs_l), merge(lams_l))
    if not return_gains:
        return out

    # θ-folded feedforward: u_t = kff_t + K_t x_t + Kth_t θ_leg(t)
    kff_eff = stages["kff"] + jnp.einsum(
        "lmun,ln->lmu", stages["Kth"], thetas
    )
    K_all = merge(stages["K"])
    kff_all = merge(kff_eff)
    if legs > 1:
        # collapseFeedback (parallel-solver.hpp:55-66): θ_0 is condensed
        # variable 2, x_0 is condensed variable 1; the elimination chain gives
        # θ_0(x_0) = θ_0* + W_1 (x_0* - x_0), so fold Kth into state feedback
        # at stage 0 (and shift the feedforward to keep u_0 = kff + K x_0
        # exact at the solution and to first order around it).
        _, _, Ws = bt_factors
        Kth0 = stages["Kth"][0, 0]
        K_all = K_all.at[0].set(K_all[0] - Kth0 @ Ws[1])
        kff_all = kff_all.at[0].add(Kth0 @ (Ws[1] @ x_heads[0]))
    return out + (ParallelGains(kff=kff_all, K=K_all),)
