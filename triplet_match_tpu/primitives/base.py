"""Projector primitive interface + shared math.

The reference carries four "projector traits" (identity/plane/plane2/
cylinder — /root/reference/include/{identity,plane,plane2,cylinder}_traits)
that map points into a primitive-intrinsic (u, v, w) chart.  They are
compiled but not wired into the live match path; here they are first-class
(SURVEY §7.9) because the acceptance configs exercise plane/cylinder
detection.

Each primitive is a pure-function bundle over a small state pytree:

  fit_from_cloud(cloud, mask)          -> state          (init_from_model)
  fit_from_samples(ref_state, samples) -> (state, valid) (init_from_samples)
  project(state, xyz)                  -> (uvw, valid)
  unproject(state, uvw)                -> xyz
  tangent(state, xyz, tangent)         -> uvw tangent
  normal(state, xyz, tangent, normal)  -> uvw normal
  intrinsic_distance(state, uvw0, uvw1)-> distance

All functions are batched over leading axes and jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unit_orthogonal(v: jax.Array) -> jax.Array:
    """A unit vector orthogonal to v (Eigen ``unitOrthogonal`` semantics).

    Matches Eigen/Geometry OrthoMethods: if x or y is not much smaller than
    z, return (-y, x, 0)/|(x,y)|, else (0, -z, y)/|(y,z)|.
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    eps = 1e-12
    use_xy = (jnp.abs(x) > jnp.abs(z) * 1e-6) | (jnp.abs(y) > jnp.abs(z) * 1e-6)
    inv_xy = 1.0 / jnp.sqrt(jnp.maximum(x * x + y * y, eps))
    inv_yz = 1.0 / jnp.sqrt(jnp.maximum(y * y + z * z, eps))
    a = jnp.stack([-y * inv_xy, x * inv_xy, jnp.zeros_like(x)], axis=-1)
    b = jnp.stack([jnp.zeros_like(x), -z * inv_yz, y * inv_yz], axis=-1)
    return jnp.where(use_xy[..., None], a, b)


def frame_to_g2l(origin: jax.Array, ex: jax.Array, ey: jax.Array, ez: jax.Array) -> jax.Array:
    """[..., 4, 4] global->local transform with rows (ex, ey, ez).

    Mirrors the trait handles' ``g2l`` assembly (e.g. cylinder_traits
    impl:32-38: row0=ref, row1=ref x axis, row2=axis, translation = R*(-o)).
    """
    r = jnp.stack([ex, ey, ez], axis=-2)  # rows
    t = -jnp.einsum("...ij,...j->...i", r, origin)
    out = jnp.zeros(r.shape[:-2] + (4, 4), r.dtype)
    out = out.at[..., :3, :3].set(r)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


_HI = jax.lax.Precision.HIGHEST


def apply_h(m: jax.Array, p: jax.Array) -> jax.Array:
    """Apply homogeneous [..., 4, 4] to points [..., 3]."""
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], p, precision=_HI) + m[..., :3, 3]


def rotate(m: jax.Array, v: jax.Array) -> jax.Array:
    """Apply the rotation block of [..., 4, 4] to vectors [..., 3]."""
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], v, precision=_HI)
