"""Solo-like quadruped model (free-flyer base + 4 × 2-DOF legs).

Simplified analog of the Solo robot used by the reference's multi-contact
examples (``examples/solo_jump.py``, ``examples/solo_kinodynamics.py``):
nominal masses/lengths in the Solo-8 class, hip-pitch + knee joints per leg,
point feet as operational frames.
"""

from __future__ import annotations

import jax.numpy as jnp

from .model import FREEFLYER, REVOLUTE, make_model


def make_quadruped(
    base_mass=1.4,
    leg_mass=0.15,
    shank_mass=0.06,
    hip_x=0.19,
    hip_y=0.1046,
    upper_len=0.16,
    lower_len=0.16,
):
    joints = [
        dict(
            type=FREEFLYER,
            parent=-1,
            mass=base_mass,
            com=jnp.zeros(3),
            inertia=jnp.diag(jnp.array([0.0047, 0.0089, 0.0117])),
        )
    ]
    frames = []
    leg_id = 0
    for sx in (+1.0, -1.0):  # front/back
        for sy in (+1.0, -1.0):  # left/right
            hip = dict(
                type=REVOLUTE,
                parent=0,
                placement_p=jnp.array([sx * hip_x, sy * hip_y, 0.0]),
                axis=jnp.array([0.0, 1.0, 0.0]),
                mass=leg_mass,
                com=jnp.array([0.0, 0.0, -upper_len / 2]),
                inertia=jnp.diag(jnp.array([3e-4, 3e-4, 2e-5])),
            )
            joints.append(hip)
            hip_idx = len(joints) - 1
            knee = dict(
                type=REVOLUTE,
                parent=hip_idx,
                placement_p=jnp.array([0.0, 0.0, -upper_len]),
                axis=jnp.array([0.0, 1.0, 0.0]),
                mass=shank_mass,
                com=jnp.array([0.0, 0.0, -lower_len / 2]),
                inertia=jnp.diag(jnp.array([1e-4, 1e-4, 1e-5])),
            )
            joints.append(knee)
            knee_idx = len(joints) - 1
            frames.append(
                dict(
                    name=f"foot{leg_id}",
                    parent=knee_idx,
                    placement_p=jnp.array([0.0, 0.0, -lower_len]),
                )
            )
            leg_id += 1
    return make_model(joints, frames)


def standing_configuration(model, height=0.25, knee_bend=0.8):
    """A reasonable crouched stance: base at `height`, legs bent symmetric."""
    q = model.neutral()
    q = q.at[2].set(height)
    nq_base = 7
    for leg in range(4):
        q = q.at[nq_base + 2 * leg].set(knee_bend / 2)
        q = q.at[nq_base + 2 * leg + 1].set(-knee_bend)
    return q
