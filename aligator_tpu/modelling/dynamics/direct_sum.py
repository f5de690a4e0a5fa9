"""Direct sum of explicit dynamics (reference
``modelling/explicit-dynamics-direct-sum.hpp``): compose two dynamics on the
Cartesian product of their state spaces, with controls split accordingly."""

from __future__ import annotations

import jax.numpy as jnp

from ..._pytree import pytree_dataclass, static_field
from ...core.dynamics import ExplicitDynamics
from ...core.manifolds import CartesianProduct, Manifold


@pytree_dataclass
class DirectSumDynamics(ExplicitDynamics):
    f: ExplicitDynamics
    g: ExplicitDynamics
    space_f: Manifold = static_field(default=None)
    space_g: Manifold = static_field(default=None)
    nu_f: int = static_field(default=0)
    nu_g: int = static_field(default=0)

    def forward(self, space, x, u):
        nf = self.space_f.nx
        xf, xg = x[..., :nf], x[..., nf:]
        uf, ug = u[..., : self.nu_f], u[..., self.nu_f :]
        yf = self.f.forward(self.space_f, xf, uf)
        yg = self.g.forward(self.space_g, xg, ug)
        return jnp.concatenate([yf, yg], axis=-1)


def direct_sum(f, space_f, nu_f, g, space_g, nu_g):
    return (
        DirectSumDynamics(
            f=f, g=g, space_f=space_f, space_g=space_g, nu_f=nu_f, nu_g=nu_g
        ),
        CartesianProduct(space_f, space_g),
        nu_f + nu_g,
    )
