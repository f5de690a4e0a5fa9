"""Rigid-body model and algorithms in JAX.

TPU-native replacement for the Pinocchio layer the reference depends on
(``modelling/dynamics/multibody-free-fwd.hpp:25`` uses ABA;
``modelling/multibody/*`` use frame kinematics/Jacobians): a kinematic tree
with revolute/prismatic/free-flyer joints, forward kinematics, recursive
Newton-Euler inverse dynamics (RNEA), mass matrix, and forward dynamics.

Design notes (tpu-first):
* The topology (parents, joint types/axes) is **static** metadata — the
  per-joint recursions unroll at trace time into a fixed XLA graph (robots
  have ≤ ~40 joints; unrolled small-tensor code vectorizes well and `vmap`
  batches it across scenarios).
* All numeric parameters (joint placements, inertias) are pytree leaves, so
  models are differentiable and batchable.
* Derivatives of dynamics come from exact forward-mode autodiff, replacing
  Pinocchio's hand-derived analytical derivatives.
* Convention: spatial vectors are 6-vectors (linear, angular), body-frame,
  matching Pinocchio's ``Motion``/``Force`` layout.

Validation strategy (no Pinocchio available): internal-consistency identities
— forward-dynamics∘RNEA round trip, mass-matrix symmetry/PSD, energy
conservation of simulations, momentum conservation for floating bases, and
finite-difference checks of every Jacobian (see ``tests/test_multibody.py``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..._pytree import pytree_dataclass, static_field
from ...core.manifolds import Manifold, TangentBundle, VectorSpace
from ..spaces.se3 import SE3, exp3_quat, quat_to_matrix

REVOLUTE = "revolute"
PRISMATIC = "prismatic"
FREEFLYER = "freeflyer"

_JOINT_NQ = {REVOLUTE: 1, PRISMATIC: 1, FREEFLYER: 7}
_JOINT_NV = {REVOLUTE: 1, PRISMATIC: 1, FREEFLYER: 6}


@pytree_dataclass
class RobotModel:
    """Kinematic tree. Joint i has parent ``parents[i] < i`` (root = -1)."""

    # data (pytree leaves)
    jplac_p: jax.Array  # (nj, 3)   parent_T_joint translation
    jplac_q: jax.Array  # (nj, 4)   parent_T_joint quaternion (x,y,z,w)
    axes: jax.Array  # (nj, 3)   joint axis in joint frame (rev/prism)
    mass: jax.Array  # (nj,)
    com: jax.Array  # (nj, 3)   body com in joint frame
    inertia: jax.Array  # (nj, 3, 3) rotational inertia about the com
    gravity: jax.Array  # (3,) e.g. (0, 0, -9.81)
    # frame (operational point) placements
    fplac_p: jax.Array  # (nf, 3)
    fplac_q: jax.Array  # (nf, 4)
    # static topology
    joint_types: tuple = static_field(default=())
    parents: tuple = static_field(default=())
    frame_parents: tuple = static_field(default=())
    frame_names: tuple = static_field(default=())

    @property
    def njoints(self) -> int:
        return len(self.joint_types)

    @property
    def nq(self) -> int:
        return sum(_JOINT_NQ[t] for t in self.joint_types)

    @property
    def nv(self) -> int:
        return sum(_JOINT_NV[t] for t in self.joint_types)

    @property
    def q_slices(self):
        out, i = [], 0
        for t in self.joint_types:
            out.append((i, i + _JOINT_NQ[t]))
            i += _JOINT_NQ[t]
        return out

    @property
    def v_slices(self):
        out, i = [], 0
        for t in self.joint_types:
            out.append((i, i + _JOINT_NV[t]))
            i += _JOINT_NV[t]
        return out

    def frame_id(self, name: str) -> int:
        return self.frame_names.index(name)

    def configuration_space(self) -> Manifold:
        from ...core.manifolds import CartesianProduct

        comps = []
        for t in self.joint_types:
            if t == FREEFLYER:
                comps.append(SE3())
            else:
                comps.append(VectorSpace(1))
        if len(comps) == 1:
            return comps[0]
        return CartesianProduct(*comps)

    def phase_space(self) -> Manifold:
        return TangentBundle(self.configuration_space())

    def neutral(self) -> jax.Array:
        return self.configuration_space().neutral()


def make_model(joints, frames=(), gravity=(0.0, 0.0, -9.81)):
    """Build a RobotModel from joint descriptions.

    ``joints``: list of dicts with keys
      type ('revolute'|'prismatic'|'freeflyer'), parent (int, -1 = world),
      placement_p (3,), placement_q (4,) [optional], axis (3,) [rev/prism],
      mass, com (3,), inertia (3,3)  [about the com, in joint frame]
    ``frames``: list of dicts: name, parent (joint idx), placement_p,
      placement_q [optional].
    """
    ident_q = jnp.array([0.0, 0.0, 0.0, 1.0])

    jp = jnp.stack([jnp.asarray(j.get("placement_p", jnp.zeros(3)), float) for j in joints])
    jq = jnp.stack([jnp.asarray(j.get("placement_q", ident_q), float) for j in joints])
    axes = jnp.stack(
        [jnp.asarray(j.get("axis", jnp.array([0.0, 0.0, 1.0])), float) for j in joints]
    )
    mass = jnp.asarray([j["mass"] for j in joints], float)
    com = jnp.stack([jnp.asarray(j["com"], float) for j in joints])
    inertia = jnp.stack([jnp.asarray(j["inertia"], float) for j in joints])

    nf = len(frames)
    if nf:
        fp = jnp.stack([jnp.asarray(f.get("placement_p", jnp.zeros(3)), float) for f in frames])
        fq = jnp.stack([jnp.asarray(f.get("placement_q", ident_q), float) for f in frames])
    else:
        fp = jnp.zeros((0, 3))
        fq = jnp.zeros((0, 4))

    return RobotModel(
        jplac_p=jp,
        jplac_q=jq,
        axes=axes,
        mass=mass,
        com=com,
        inertia=inertia,
        gravity=jnp.asarray(gravity, float),
        fplac_p=fp,
        fplac_q=fq,
        joint_types=tuple(j["type"] for j in joints),
        parents=tuple(int(j.get("parent", i - 1)) for i, j in enumerate(joints)),
        frame_parents=tuple(int(f["parent"]) for f in frames),
        frame_names=tuple(str(f.get("name", f"frame{k}")) for k, f in enumerate(frames)),
    )


# ---------------------------------------------------------------------------
# spatial algebra helpers ((linear, angular) 6-vectors, body coordinates)
# ---------------------------------------------------------------------------


def _rot(q):
    return quat_to_matrix(q)


def motion_to_child(R_cp, p_cp, m):
    """Transform a motion vector from parent coords (at parent origin) to
    child coords (at child origin); (R_cp, p_cp) = pose of child in parent."""
    v, w = m[:3], m[3:]
    v_at_c = v + jnp.cross(w, p_cp)
    return jnp.concatenate([R_cp.T @ v_at_c, R_cp.T @ w])


def force_to_parent(R_cp, p_cp, f):
    """Transform a force vector from child coords to parent coords."""
    fl, tau = f[:3], f[3:]
    fl_p = R_cp @ fl
    tau_p = R_cp @ tau + jnp.cross(p_cp, fl_p)
    return jnp.concatenate([fl_p, tau_p])


def motion_cross(m1, m2):
    """m1 ×ₘ m2 (spatial motion cross product)."""
    v1, w1 = m1[:3], m1[3:]
    v2, w2 = m2[:3], m2[3:]
    return jnp.concatenate(
        [jnp.cross(w1, v2) + jnp.cross(v1, w2), jnp.cross(w1, w2)]
    )


def motion_cross_force(m, f):
    """m ×* f (spatial force cross product)."""
    v, w = m[:3], m[3:]
    fl, tau = f[:3], f[3:]
    return jnp.concatenate(
        [jnp.cross(w, fl), jnp.cross(w, tau) + jnp.cross(v, fl)]
    )


def inertia_apply(mass, com, I_com, m):
    """Spatial momentum h = I·m for a body with (mass, com offset, I about
    com), in the joint frame."""
    v, w = m[:3], m[3:]
    v_com = v + jnp.cross(w, com)
    p_lin = mass * v_com
    L = I_com @ w + jnp.cross(com, p_lin)
    return jnp.concatenate([p_lin, L])


def _joint_transform_and_subspace(model, i, q_i, dtype):
    """Joint i's (R, p) in its parent-joint-attached frame and motion
    subspace S (6, nv_i) in the joint frame."""
    t = model.joint_types[i]
    R0 = _rot(model.jplac_q[i]).astype(dtype)
    p0 = model.jplac_p[i].astype(dtype)
    if t == REVOLUTE:
        a = model.axes[i].astype(dtype)
        qj = exp3_quat(a * q_i[0])
        Rj = _rot(qj)
        R = R0 @ Rj
        p = p0
        S = jnp.concatenate([jnp.zeros(3, dtype), a])[:, None]
    elif t == PRISMATIC:
        a = model.axes[i].astype(dtype)
        R = R0
        p = p0 + R0 @ (a * q_i[0])
        S = jnp.concatenate([a, jnp.zeros(3, dtype)])[:, None]
    elif t == FREEFLYER:
        pj, qj = q_i[:3], q_i[3:]
        Rj = _rot(qj)
        R = R0 @ Rj
        p = p0 + R0 @ pj
        S = jnp.eye(6, dtype=dtype)
    else:  # pragma: no cover
        raise ValueError(f"unknown joint type {t}")
    return R, p, S


def forward_kinematics(model: RobotModel, q, v: Optional[jax.Array] = None):
    """Joint placements in the world frame; optionally body-frame spatial
    velocities. Returns dict with 'R' (nj,3,3), 'p' (nj,3) [, 'vel' (nj,6)].
    """
    dtype = q.dtype
    qs = model.q_slices
    vs = model.v_slices
    Rs, ps, vels = [], [], []
    for i in range(model.njoints):
        qi = q[qs[i][0] : qs[i][1]]
        R_l, p_l, S = _joint_transform_and_subspace(model, i, qi, dtype)
        par = model.parents[i]
        if par < 0:
            R_w = R_l
            p_w = p_l
        else:
            R_w = Rs[par] @ R_l
            p_w = ps[par] + Rs[par] @ p_l
        Rs.append(R_w)
        ps.append(p_w)
        if v is not None:
            vi = v[vs[i][0] : vs[i][1]]
            vj = S @ vi
            if par < 0:
                vel = vj
            else:
                vel = motion_to_child(R_l, p_l, vels[par]) + vj
            vels.append(vel)
    out = {"R": jnp.stack(Rs), "p": jnp.stack(ps)}
    if v is not None:
        out["vel"] = jnp.stack(vels)
    return out


def rnea(model: RobotModel, q, v, a, ext_forces: Optional[jax.Array] = None):
    """Inverse dynamics τ = RNEA(q, v, a) (body-frame Featherstone).

    ``ext_forces``: optional (nj, 6) external spatial forces expressed in each
    joint's local frame (as Pinocchio's ``fext``).
    """
    dtype = q.dtype
    qs = model.q_slices
    vsl = model.v_slices
    nj = model.njoints

    R_l, p_l, S_list = [], [], []
    vels, accs, forces = [], [], []

    a_grav = jnp.concatenate([-model.gravity.astype(dtype), jnp.zeros(3, dtype)])

    for i in range(nj):
        qi = q[qs[i][0] : qs[i][1]]
        vi = v[vsl[i][0] : vsl[i][1]]
        ai = a[vsl[i][0] : vsl[i][1]]
        R, p, S = _joint_transform_and_subspace(model, i, qi, dtype)
        R_l.append(R)
        p_l.append(p)
        S_list.append(S)
        par = model.parents[i]
        vj = S @ vi
        if par < 0:
            vel = vj
            acc = motion_to_child(R, p, a_grav) + S @ ai
        else:
            vel = motion_to_child(R, p, vels[par]) + vj
            acc = (
                motion_to_child(R, p, accs[par])
                + S @ ai
                + motion_cross(vel, vj)
            )
        vels.append(vel)
        accs.append(acc)
        h = inertia_apply(model.mass[i], model.com[i].astype(dtype), model.inertia[i].astype(dtype), vel)
        f = inertia_apply(model.mass[i], model.com[i].astype(dtype), model.inertia[i].astype(dtype), acc)
        f = f + motion_cross_force(vel, h)
        if ext_forces is not None:
            f = f - ext_forces[i]
        forces.append(f)

    tau = [None] * nj
    for i in reversed(range(nj)):
        tau[i] = S_list[i].T @ forces[i]
        par = model.parents[i]
        if par >= 0:
            forces[par] = forces[par] + force_to_parent(R_l[i], p_l[i], forces[i])
    return jnp.concatenate(tau)


def mass_matrix(model: RobotModel, q):
    """Joint-space inertia M(q), via unit-acceleration RNEA columns
    (equivalent to CRBA; nv+1 RNEA passes, each O(n) — fine for small n and
    fully vectorized by vmap over columns)."""
    nv = model.nv
    dtype = q.dtype
    zero_v = jnp.zeros((nv,), dtype)
    model_nog = _without_gravity(model)
    bias0 = rnea(model_nog, q, zero_v, zero_v)

    def col(e):
        return rnea(model_nog, q, zero_v, e) - bias0

    M = jax.vmap(col)(jnp.eye(nv, dtype=dtype))
    return 0.5 * (M + M.T)


def _without_gravity(model: RobotModel) -> RobotModel:
    from ..._pytree import replace

    return replace(model, gravity=jnp.zeros_like(model.gravity))


def nonlinear_effects(model: RobotModel, q, v):
    """Coriolis + centrifugal + gravity torque b(q, v) = RNEA(q, v, 0)."""
    return rnea(model, q, v, jnp.zeros((model.nv,), q.dtype))


def aba(model: RobotModel, q, v, tau, ext_forces: Optional[jax.Array] = None):
    """Forward dynamics q̈ = M(q)⁻¹(τ − b(q,v)).

    Role of Pinocchio's ABA in the reference (``multibody-free-fwd.hpp:25``).
    Implemented via mass-matrix Cholesky — O(nv³) but nv is small and the
    factorization batches perfectly on TPU; a true O(n) articulated-body
    recursion is unnecessary at these sizes.
    """
    b = rnea(model, q, v, jnp.zeros((model.nv,), q.dtype), ext_forces)
    M = mass_matrix(model, q)
    c = jax.scipy.linalg.cho_factor(M, lower=True)
    return jax.scipy.linalg.cho_solve(c, tau - b)


# ---------------------------------------------------------------------------
# frames
# ---------------------------------------------------------------------------


def frame_placement(model: RobotModel, q, frame_id: int):
    """World pose (R, p) of an operational frame."""
    fk = forward_kinematics(model, q)
    par = model.frame_parents[frame_id]
    Rf = _rot(model.fplac_q[frame_id]).astype(q.dtype)
    pf = model.fplac_p[frame_id].astype(q.dtype)
    R = fk["R"][par] @ Rf
    p = fk["p"][par] + fk["R"][par] @ pf
    return R, p


def frame_velocity(model: RobotModel, q, v, frame_id: int):
    """Spatial velocity of a frame in the LOCAL frame (linear, angular)."""
    fk = forward_kinematics(model, q, v)
    par = model.frame_parents[frame_id]
    Rf = _rot(model.fplac_q[frame_id]).astype(q.dtype)
    pf = model.fplac_p[frame_id].astype(q.dtype)
    return motion_to_child(Rf, pf, fk["vel"][par])


def center_of_mass(model: RobotModel, q):
    """World-frame CoM position of the whole robot."""
    fk = forward_kinematics(model, q)
    total = jnp.sum(model.mass)
    acc = jnp.zeros(3, q.dtype)
    for i in range(model.njoints):
        c_w = fk["p"][i] + fk["R"][i] @ model.com[i].astype(q.dtype)
        acc = acc + model.mass[i] * c_w
    return acc / total
