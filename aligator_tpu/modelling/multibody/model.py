"""Rigid-body model and algorithms in JAX (engine v2, world-frame einsum form).

TPU-native replacement for the Pinocchio layer the reference depends on
(``modelling/dynamics/multibody-free-fwd.hpp:25`` uses ABA;
``modelling/multibody/*`` use frame kinematics/Jacobians): a kinematic tree
with revolute/prismatic/free-flyer joints, forward kinematics, recursive
Newton-Euler inverse dynamics (RNEA), mass matrix (CRBA-equivalent), and
forward dynamics.

Design notes (tpu-first; this is v2 — v1 unrolled Python loops per joint,
which traced O(n_joints) graphs and took ~10 min to compile at quadruped
scale; v2 traces O(1) graphs):

* **Topology is static** (parents, joint types/axes layout); all numeric
  parameters (placements, inertias) are pytree leaves, so models stay
  differentiable and batchable.
* **Uniform joints**: every joint's local transform is computed for all
  three joint types with type-coded ``jnp.where`` selection, so a single
  ``vmap`` over joints covers heterogeneous trees.
* **FK is the only sequential part**: one ``lax.scan`` over joints in
  topological order (gathering the parent pose by index). Trace size is
  constant in the number of joints.
* **Everything else is einsums over a static ancestor mask.** After FK we
  form the world-frame motion axis of every dof at the world origin,
  ``Phi (nv, 6)``. With the static 0/1 ancestor matrix ``A (nbody, nv)``
  (``A[b,k]=1`` iff dof k's joint is an ancestor-or-self of body b):

    - body spatial velocities   ``V = (A * v) @ Phi``
    - body spatial accelerations ``Acc = (A * qdd) @ Phi + A @ beta + grav``
      with the per-dof velocity-product bias ``beta_k = V_{joint(k)} x (Phi_k vk)``
      (Featherstone's world-coordinates recursion ``a_i = a_l + s qdd + v_i x s qd``)
    - Newton-Euler forces       ``f_b = I_b Acc_b + V_b x* (I_b V_b)``
      with spatial inertias expressed at the world origin
    - joint torques (RNEA)      ``tau = sum(Phi * (A^T @ f), axis=1)``
    - mass matrix (CRBA role)   ``M = sum_b (A_b Phi)^T I_b (A_b Phi)``

  These are dense (nbody x nv x 6) contractions — exactly the shape the MXU
  likes, they batch perfectly under ``vmap``, and autodiff through them is
  compact (no per-joint graph unrolling).
* Forward dynamics stays dense-Cholesky on M: at robot sizes (nv <= ~40)
  an O(nv^3) batched Cholesky on the MXU beats a latency-bound serial O(n)
  articulated-body recursion on TPU by a wide margin.
* Convention: spatial vectors are 6-vectors (linear, angular); free-flyer
  velocities are body-frame coordinates, matching Pinocchio's layout.

Validation strategy (no Pinocchio available): internal-consistency
identities — forward-dynamics∘RNEA round trip, mass-matrix symmetry/PSD,
energy conservation of simulations, momentum conservation for floating
bases, and finite-difference checks of every Jacobian
(see ``tests/test_multibody.py``).
"""

from __future__ import annotations

import functools

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..._pytree import pytree_dataclass, static_field
from ...core.manifolds import Manifold, TangentBundle, VectorSpace
from ..spaces.se3 import SE3, exp3_quat, quat_to_matrix

REVOLUTE = "revolute"
PRISMATIC = "prismatic"
FREEFLYER = "freeflyer"

_JOINT_NQ = {REVOLUTE: 1, PRISMATIC: 1, FREEFLYER: 7}
_JOINT_NV = {REVOLUTE: 1, PRISMATIC: 1, FREEFLYER: 6}
_CODE = {REVOLUTE: 0, PRISMATIC: 1, FREEFLYER: 2}


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
    # per-dof reflected rotor inertia (MJCF/URDF ``armature``), added to the
    # mass-matrix diagonal and to RNEA's τ as armature·q̈ (MuJoCo/Pinocchio
    # convention); None ⇔ zeros
    armature: Optional[jax.Array] = None  # (nv,)
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


def with_frame(model: "RobotModel", name: str, parent: int,
               placement_p=None, placement_q=None) -> "RobotModel":
    """Return a copy of ``model`` with one additional operational frame
    (e.g. to alias a parsed MJCF body frame under a task-level name)."""
    from ..._pytree import replace

    ident_q = jnp.array([0.0, 0.0, 0.0, 1.0])
    p = jnp.zeros(3) if placement_p is None else jnp.asarray(placement_p, float)
    qq = ident_q if placement_q is None else jnp.asarray(placement_q, float)
    return replace(
        model,
        fplac_p=jnp.concatenate([model.fplac_p, p[None]], axis=0),
        fplac_q=jnp.concatenate([model.fplac_q, qq[None]], axis=0),
        frame_parents=model.frame_parents + (int(parent),),
        frame_names=model.frame_names + (str(name),),
    )


def make_model(joints, frames=(), gravity=(0.0, 0.0, -9.81), armature=None):
    """Build a RobotModel from joint descriptions.

    ``joints``: list of dicts with keys
      type ('revolute'|'prismatic'|'freeflyer'), parent (int, -1 = world),
      placement_p (3,), placement_q (4,) [optional], axis (3,) [rev/prism],
      mass, com (3,), inertia (3,3)  [about the com, in joint frame]
    ``frames``: list of dicts: name, parent (joint idx), placement_p,
      placement_q [optional].
    ``armature``: optional (nv,) per-dof reflected rotor inertia.
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
        armature=None if armature is None else jnp.asarray(armature, float),
        joint_types=tuple(j["type"] for j in joints),
        parents=tuple(int(j.get("parent", i - 1)) for i, j in enumerate(joints)),
        frame_parents=tuple(int(f["parent"]) for f in frames),
        frame_names=tuple(str(f.get("name", f"frame{k}")) for k, f in enumerate(frames)),
    )


# ---------------------------------------------------------------------------
# spatial algebra helpers ((linear, angular) 6-vectors)
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
    v1, w1 = m1[..., :3], m1[..., 3:]
    v2, w2 = m2[..., :3], m2[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w1, v2) + jnp.cross(v1, w2), jnp.cross(w1, w2)], axis=-1
    )


def motion_cross_force(m, f):
    """m ×* f (spatial force cross product)."""
    v, w = m[..., :3], m[..., 3:]
    fl, tau = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, fl), jnp.cross(w, tau) + jnp.cross(v, fl)], axis=-1
    )


def inertia_apply(mass, com, I_com, m):
    """Spatial momentum h = I·m for a body with (mass, com offset, I about
    com), all expressed in the same frame as the motion vector ``m``
    (works at the joint frame or, with world com/inertia, at the world
    origin). Broadcasts over leading axes."""
    v, w = m[..., :3], m[..., 3:]
    v_com = v + jnp.cross(w, com)
    p_lin = mass[..., None] * v_com
    L = jnp.einsum("...ij,...j->...i", I_com, w) + jnp.cross(com, p_lin)
    return jnp.concatenate([p_lin, L], axis=-1)


# ---------------------------------------------------------------------------
# static topology tables (trace-time numpy; folded into the XLA graph)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _topology(joint_types: tuple, parents: tuple):
    """Static index tables for the uniform-joint formulation.

    Memoized on the (hashable) topology tuples: kinematics/dynamics call it
    ~5x per trace, and the O(nj²) ancestor loop otherwise reruns on every
    retrace (callers must not mutate the returned arrays)."""
    nj = len(joint_types)
    codes = np.array([_CODE[t] for t in joint_types], dtype=np.int32)

    # padded q gather: every joint sees a 7-wide q (freeflyer layout); the
    # default fill (0,0,0, 0,0,0,1) makes the unused freeflyer branch of a
    # 1-dof joint an identity transform (all branches must be finite).
    q_idx = np.zeros((nj, 7), dtype=np.int32)
    q_mask = np.zeros((nj, 7))
    q_default = np.tile(np.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0]), (nj, 1))
    v_idx = np.zeros((nj, 6), dtype=np.int32)
    v_mask = np.zeros((nj, 6))

    dof_joint, dof_col = [], []
    iq = iv = 0
    for i, t in enumerate(joint_types):
        nq_i, nv_i = _JOINT_NQ[t], _JOINT_NV[t]
        q_idx[i, :nq_i] = np.arange(iq, iq + nq_i)
        q_mask[i, :nq_i] = 1.0
        v_idx[i, :nv_i] = np.arange(iv, iv + nv_i)
        v_mask[i, :nv_i] = 1.0
        for m in range(nv_i):
            dof_joint.append(i)
            dof_col.append(m)
        iq += nq_i
        iv += nv_i
    dof_joint = np.array(dof_joint, dtype=np.int32)
    dof_col = np.array(dof_col, dtype=np.int32)
    nv = len(dof_joint)

    # ancestor-or-self matrix over joints, then per-dof mask A (nj, nv)
    anc = np.zeros((nj, nj))
    for b in range(nj):
        j = b
        while j >= 0:
            anc[b, j] = 1.0
            j = parents[j]
    A = anc[:, dof_joint]  # (nj, nv)

    return {
        "codes": codes,
        "parents": np.array(parents, dtype=np.int32),
        "q_idx": q_idx,
        "q_mask": q_mask,
        "q_default": q_default,
        "v_idx": v_idx,
        "v_mask": v_mask,
        "dof_joint": dof_joint,
        "dof_col": dof_col,
        "A": A,
        "nv": nv,
    }


def _local_transforms(model: RobotModel, q):
    """(R, p) of every joint in its parent frame — all joints at once.

    Uniform type-coded evaluation replacing the per-joint Python branches of
    engine v1 (all three branches computed on padded q, selected by code).
    """
    dtype = q.dtype
    top = _topology(model.joint_types, model.parents)
    q_pad = (
        q[top["q_idx"]] * jnp.asarray(top["q_mask"], dtype)
        + jnp.asarray(top["q_default"], dtype)
        * (1.0 - jnp.asarray(top["q_mask"], dtype))
    )  # (nj, 7)
    codes = jnp.asarray(top["codes"])

    R0 = jax.vmap(_rot)(model.jplac_q).astype(dtype)  # (nj,3,3)
    p0 = model.jplac_p.astype(dtype)
    a = model.axes.astype(dtype)

    # revolute: rotate about axis by q[0]
    R_rev = jax.vmap(lambda ax, th: _rot(exp3_quat(ax * th)))(a, q_pad[:, 0])
    # prismatic: translate along axis by q[0]
    p_prism = a * q_pad[:, :1]
    # freeflyer: q = (p, quat)
    R_ff = jax.vmap(_rot)(q_pad[:, 3:7])
    p_ff = q_pad[:, :3]

    is_rev = (codes == 0)[:, None, None]
    is_ff = (codes == 2)[:, None, None]
    R_j = jnp.where(is_rev, R_rev, jnp.where(is_ff, R_ff, jnp.eye(3, dtype=dtype)))
    p_j = jnp.where(
        (codes == 1)[:, None], p_prism, jnp.where((codes == 2)[:, None], p_ff, 0.0)
    )
    R = jnp.einsum("nij,njk->nik", R0, R_j)
    p = p0 + jnp.einsum("nij,nj->ni", R0, p_j)
    return R, p


def _fk_world(model: RobotModel, q):
    """World pose of every joint: one ``lax.scan`` over the tree (the only
    sequential computation in the engine; O(1) trace size)."""
    dtype = q.dtype
    R_loc, p_loc = _local_transforms(model, q)
    parents = jnp.asarray(_topology(model.joint_types, model.parents)["parents"])
    nj = model.njoints

    def step(carry, xs):
        R_all, p_all = carry
        i, par, Rl, pl = xs
        safe = jnp.maximum(par, 0)
        Rp = jnp.where(par < 0, jnp.eye(3, dtype=dtype), R_all[safe])
        pp = jnp.where(par < 0, jnp.zeros(3, dtype=dtype), p_all[safe])
        Rw = Rp @ Rl
        pw = pp + Rp @ pl
        return (R_all.at[i].set(Rw), p_all.at[i].set(pw)), None

    init = (jnp.zeros((nj, 3, 3), dtype), jnp.zeros((nj, 3), dtype))
    (R, p), _ = jax.lax.scan(step, init, (jnp.arange(nj), parents, R_loc, p_loc))
    return R, p


def _world_axes(model: RobotModel, R, p):
    """Phi (nv, 6): world-frame motion axis of each dof at the world origin.

    Per-dof local axes (in the dof's joint frame): revolute (0; a),
    prismatic (a; 0), freeflyer columns of I6 — then transformed to the
    world origin by the joint's world pose."""
    dtype = R.dtype
    top = _topology(model.joint_types, model.parents)
    dj, dc = top["dof_joint"], top["dof_col"]
    codes = jnp.asarray(top["codes"])[dj]  # per-dof code

    a = model.axes.astype(dtype)[dj]  # (nv, 3)
    zero3 = jnp.zeros_like(a)
    eye6 = jnp.eye(6, dtype=dtype)[dc]  # (nv, 6) freeflyer columns
    s_rev = jnp.concatenate([zero3, a], axis=1)
    s_prism = jnp.concatenate([a, zero3], axis=1)
    S_loc = jnp.where(
        (codes == 0)[:, None], s_rev, jnp.where((codes == 1)[:, None], s_prism, eye6)
    )  # (nv, 6)

    Rj, pj = R[dj], p[dj]
    w_ang = jnp.einsum("kij,kj->ki", Rj, S_loc[:, 3:])
    w_lin = jnp.einsum("kij,kj->ki", Rj, S_loc[:, :3]) + jnp.cross(pj, w_ang)
    return jnp.concatenate([w_lin, w_ang], axis=1)  # (nv, 6)


def kinematics(model: RobotModel, q, v: Optional[jax.Array] = None):
    """One-pass kinematic data: world poses, dof axes, body velocities.

    Returns a dict with 'R' (nj,3,3), 'p' (nj,3), 'Phi' (nv,6), 'A' (nj,nv)
    [, 'V' (nj,6) world-origin body spatial velocities if v is given].
    Downstream algorithms (RNEA, CRBA, frame Jacobians, contacts) share this
    instead of re-running FK.
    """
    R, p = _fk_world(model, q)
    Phi = _world_axes(model, R, p)
    A = jnp.asarray(_topology(model.joint_types, model.parents)["A"], q.dtype)
    out = {"R": R, "p": p, "Phi": Phi, "A": A}
    if v is not None:
        out["V"] = (A * v) @ Phi  # (nj, 6)
    return out


def _world_inertia(model: RobotModel, R, p, dtype):
    """Per-body (mass, world com, world-rotated I_com) — the spatial inertia
    at the world origin in the ``inertia_apply`` parameterization."""
    m = model.mass.astype(dtype)
    c_w = p + jnp.einsum("nij,nj->ni", R, model.com.astype(dtype))
    I_w = jnp.einsum("nij,njk,nlk->nil", R, model.inertia.astype(dtype), R)
    return m, c_w, I_w


def forward_kinematics(model: RobotModel, q, v: Optional[jax.Array] = None):
    """Joint placements in the world frame; optionally body-frame spatial
    velocities. Returns dict with 'R' (nj,3,3), 'p' (nj,3) [, 'vel' (nj,6)].
    """
    kin = kinematics(model, q, v)
    out = {"R": kin["R"], "p": kin["p"]}
    if v is not None:
        # world-origin spatial velocity -> body-frame velocity at the joint
        V, R, p = kin["V"], kin["R"], kin["p"]
        w_w = V[:, 3:]
        v_at_p = V[:, :3] + jnp.cross(w_w, p)
        out["vel"] = jnp.concatenate(
            [
                jnp.einsum("nji,nj->ni", R, v_at_p),
                jnp.einsum("nji,nj->ni", R, w_w),
            ],
            axis=1,
        )
    return out


def _body_accels(model, kin, a, dtype):
    """World-origin spatial accelerations incl. the gravity offset
    (Featherstone world-coords recursion collapsed to einsums)."""
    A, Phi, V = kin["A"], kin["Phi"], kin["V"]
    top = _topology(model.joint_types, model.parents)
    # velocity-product bias per dof: beta_k = V_{joint(k)} x (Phi_k * vk)
    vd = kin["vdof"]
    beta = motion_cross(V[top["dof_joint"]], Phi * vd[:, None])  # (nv, 6)
    a_grav = jnp.concatenate([-model.gravity.astype(dtype), jnp.zeros(3, dtype)])
    return (A * a) @ Phi + A @ beta + a_grav


def _world_inertia_cached(model, kin, dtype):
    """World-origin spatial inertias, memoized on the kinematics dict so
    rnea/mass_matrix sharing one ``kin`` also share this."""
    if "_world_inertia" not in kin:
        kin["_world_inertia"] = _world_inertia(model, kin["R"], kin["p"], dtype)
    return kin["_world_inertia"]


def rnea(model: RobotModel, q, v, a, ext_forces: Optional[jax.Array] = None,
         kin=None):
    """Inverse dynamics τ = RNEA(q, v, a).

    World-frame Newton-Euler as three einsums over the ancestor mask (role
    of ``pinocchio::rnea`` used by the reference's multibody dynamics).
    ``ext_forces``: optional (nj, 6) external spatial forces expressed in
    each joint's local frame (as Pinocchio's ``fext``). Pass ``kin`` (from
    ``kinematics(model, q, v)``) to share the kinematics pass.
    """
    dtype = q.dtype
    if kin is None:
        kin = kinematics(model, q, v)
        kin["vdof"] = v
    R, p, A, Phi, V = kin["R"], kin["p"], kin["A"], kin["Phi"], kin["V"]

    Acc = _body_accels(model, kin, a, dtype)  # (nj, 6)
    m, c_w, I_w = _world_inertia_cached(model, kin, dtype)
    h = inertia_apply(m, c_w, I_w, V)
    f = inertia_apply(m, c_w, I_w, Acc) + motion_cross_force(V, h)  # (nj, 6)

    if ext_forces is not None:
        fl_w = jnp.einsum("nij,nj->ni", R, ext_forces[:, :3])
        tau_w = jnp.einsum("nij,nj->ni", R, ext_forces[:, 3:]) + jnp.cross(p, fl_w)
        f = f - jnp.concatenate([fl_w, tau_w], axis=1)

    # tau_k = Phi_k . sum_{b in subtree(k)} f_b
    tau = jnp.sum(Phi * (A.T @ f), axis=1)
    if model.armature is not None:
        tau = tau + model.armature.astype(dtype) * a
    return tau


def mass_matrix(model: RobotModel, q, kin=None):
    """Joint-space inertia M(q) — CRBA-equivalent, as one dense contraction:
    M = Σ_b (A_b ⊙ Φ)ᵀ I_b (A_b ⊙ Φ) with world-origin spatial inertias.
    MXU-shaped (nbody × 6 × nv einsums) instead of the nv+1 RNEA passes of
    engine v1. Pass ``kin`` to share a kinematics pass."""
    dtype = q.dtype
    if kin is None:
        kin = kinematics(model, q)
    A, Phi = kin["A"], kin["Phi"]
    m, c_w, I_w = _world_inertia_cached(model, kin, dtype)

    Psi = Phi.T[None, :, :] * A[:, None, :]  # (nj, 6, nv) masked Jacobians
    IPsi = inertia_apply(
        m[:, None], c_w[:, None, :], I_w[:, None, :, :],
        jnp.swapaxes(Psi, 1, 2),
    )  # (nj, nv, 6)
    M = jnp.einsum("bsk,bls->kl", Psi, IPsi)
    M = 0.5 * (M + M.T)
    if model.armature is not None:
        M = M + jnp.diag(model.armature.astype(dtype))
    return M


def nonlinear_effects(model: RobotModel, q, v):
    """Coriolis + centrifugal + gravity torque b(q, v) = RNEA(q, v, 0)."""
    return rnea(model, q, v, jnp.zeros((model.nv,), q.dtype))


def aba(model: RobotModel, q, v, tau, ext_forces: Optional[jax.Array] = None):
    """Forward dynamics q̈ = M(q)⁻¹(τ − b(q,v)).

    Role of Pinocchio's ABA in the reference (``multibody-free-fwd.hpp:25``).
    Dense mass-matrix Cholesky: at nv ≤ ~40 a batched O(nv³) Cholesky rides
    the MXU, while a serial O(n) articulated-body sweep would be a chain of
    ~nj tiny dependent ops — latency-bound on TPU. M and b share one
    kinematics pass.

    Derivatives are analytic (``derivatives.py`` custom JVP — the
    ``computeABADerivatives`` role, reference
    ``multibody-free-fwd.hxx:66``): ∂a/∂θ = −M⁻¹ ∂RNEA/∂θ|_{a*} with one
    reused Cholesky; model-parameter tangents fall back to autodiff.
    """
    from .derivatives import aba_custom

    fn = aba_custom(ext_forces is not None)
    if ext_forces is None:
        return fn(model, q, v, tau)
    return fn(model, q, v, tau, ext_forces)


def _aba_impl(model: RobotModel, q, v, tau,
              ext_forces: Optional[jax.Array] = None):
    """Raw (autodiff-differentiable) forward-dynamics implementation."""
    dtype = q.dtype
    kin = kinematics(model, q, v)
    kin["vdof"] = v

    b = rnea(model, q, v, jnp.zeros((model.nv,), dtype), ext_forces, kin=kin)
    M = mass_matrix(model, q, kin=kin)

    # recursive block Cholesky (gar/smallmat.py): batched-GEMM factor with
    # no while-loop primitives — ~2.7x cho_factor inside scans on TPU
    from ...gar import smallmat

    return smallmat.solve_spd(M, tau - b)


# ---------------------------------------------------------------------------
# frames
# ---------------------------------------------------------------------------


def frame_placement(model: RobotModel, q, frame_id: int, kin=None):
    """World pose (R, p) of an operational frame."""
    if kin is None:
        kin = kinematics(model, q)
    par = model.frame_parents[frame_id]
    Rf = _rot(model.fplac_q[frame_id]).astype(q.dtype)
    pf = model.fplac_p[frame_id].astype(q.dtype)
    R = kin["R"][par] @ Rf
    p = kin["p"][par] + kin["R"][par] @ pf
    return R, p


def frame_velocity(model: RobotModel, q, v, frame_id: int, kin=None):
    """Spatial velocity of a frame in the LOCAL frame (linear, angular)."""
    if kin is None:
        kin = kinematics(model, q, v)
    par = model.frame_parents[frame_id]
    Rw, pw = frame_placement(model, q, frame_id, kin=kin)
    V = kin["V"][par]
    w_w = V[3:]
    v_at_f = V[:3] + jnp.cross(w_w, pw)
    return jnp.concatenate([Rw.T @ v_at_f, Rw.T @ w_w])


def frame_jacobian_lwa(model: RobotModel, q, frame_id: int, kin=None):
    """6×nv LOCAL_WORLD_ALIGNED frame Jacobian (linear at the frame origin,
    world-aligned axes) — analytic, from the world dof axes Phi."""
    if kin is None:
        kin = kinematics(model, q)
    par = model.frame_parents[frame_id]
    _, pw = frame_placement(model, q, frame_id, kin=kin)
    Phi, A = kin["Phi"], kin["A"]
    mask = A[par][:, None]
    lin = (Phi[:, :3] + jnp.cross(Phi[:, 3:], pw[None, :])) * mask
    ang = Phi[:, 3:] * mask
    return jnp.concatenate([lin.T, ang.T], axis=0)  # (6, nv)


def center_of_mass(model: RobotModel, q, kin=None):
    """World-frame CoM position of the whole robot."""
    if kin is None:
        kin = kinematics(model, q)
    dtype = q.dtype
    c_w = kin["p"] + jnp.einsum("nij,nj->ni", kin["R"], model.com.astype(dtype))
    m = model.mass.astype(dtype)
    return (m @ c_w) / jnp.sum(m)
