"""Identity projector (``identity_traits``).

Mirrors /root/reference/include/impl/identity_traits.hpp: project/unproject
are the identity, tangent/normal pass through, intrinsic distance is
Euclidean.  Used by the rigid model-in-scene configs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class IdentityState(NamedTuple):
    pass


def fit_from_cloud(cloud, mask=None) -> IdentityState:
    return IdentityState()


def fit_from_samples(ref_state, *samples) -> tuple[IdentityState, jax.Array]:
    return IdentityState(), jnp.asarray(True)


def project(state: IdentityState, xyz: jax.Array):
    return xyz, jnp.ones(xyz.shape[:-1], bool)


def unproject(state: IdentityState, uvw: jax.Array) -> jax.Array:
    return uvw


def tangent(state: IdentityState, xyz, tan) -> jax.Array:
    return tan


def normal(state: IdentityState, xyz, tan, nrm) -> jax.Array:
    return nrm


def intrinsic_distance(state: IdentityState, uvw0, uvw1) -> jax.Array:
    return jnp.linalg.norm(uvw1 - uvw0, axis=-1)
