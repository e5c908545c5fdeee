"""Rigid-transform math: pair-frame alignment and weighted Kabsch/umeyama.

Batched (vmap-friendly) equivalents of:
* ``scene::base_transform_`` (/root/reference/include/impl/scene.hpp:538-567)
  — the 2-point + 1-tangent frame alignment that turns a (scene pair, model
  pair) correspondence into a rigid pose hypothesis.
* ``Eigen::umeyama(src, dst, false)`` (used at impl/scene.hpp:393) — the
  ICP least-squares rigid fit, here as weighted Kabsch so masked dense
  correspondence arrays work under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# TPU f32 matmuls default to bfloat16 passes, which quantizes transformed
# coordinates by ~1e-3 relative — fatal for mm-level pose math.  Every
# matmul in this module is pose-critical and pinned to HIGHEST.
_HI = jax.lax.Precision.HIGHEST


def _normalize(v, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def base_transform(src_i, src_j, src_t, tgt_i, tgt_j, tgt_t) -> jax.Array:
    """Rigid transform aligning the source pair frame to the target pair frame.

    All inputs [..., 3]; returns [..., 4, 4].  Frames are built exactly like
    the reference (impl/scene.hpp:547-564): u = normalized pair direction,
    v = tangent Gram-Schmidt-orthogonalized against u, w = u x v.  The frame
    matrix is orthonormal so its inverse is its transpose.
    """
    u_a = _normalize(src_j - src_i)
    u_b = _normalize(tgt_j - tgt_i)
    v_a = _normalize(src_t - jnp.sum(src_t * u_a, -1, keepdims=True) * u_a)
    v_b = _normalize(tgt_t - jnp.sum(tgt_t * u_b, -1, keepdims=True) * u_b)
    w_a = _normalize(jnp.cross(u_a, v_a))
    w_b = _normalize(jnp.cross(u_b, v_b))

    base_a = jnp.stack([u_a, v_a, w_a], axis=-1)  # columns
    base_b = jnp.stack([u_b, v_b, w_b], axis=-1)
    r = jnp.matmul(base_b, jnp.swapaxes(base_a, -1, -2), precision=_HI)
    t = tgt_i - jnp.einsum("...ij,...j->...i", r, src_i, precision=_HI)

    out = jnp.zeros(r.shape[:-2] + (4, 4), r.dtype)
    out = out.at[..., :3, :3].set(r)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def weighted_kabsch(src, dst, w, axis_name: str | None = None) -> jax.Array:
    """Least-squares rigid transform mapping src -> dst under weights.

    Semantics of ``Eigen::umeyama(src, dst, with_scaling=false)``
    (impl/scene.hpp:393): minimizes sum_i w_i ||dst_i - (R src_i + t)||^2
    with det(R) = +1 enforced via the SVD sign correction.

    Args:
      src, dst: [..., N, 3]; w: [..., N] nonnegative weights (mask).
      axis_name: when src/dst/w are point-axis shards of a mesh-sharded
        cloud (inside shard_map), the moment sums psum over this axis so
        every shard computes the identical global fit.
    Returns:
      [..., 4, 4].  Degenerate inputs (all-zero weights) return identity.
    """

    def _reduce(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    if axis_name is None:
        wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
        wn = w / wsum
        mu_s = jnp.einsum("...n,...nd->...d", wn, src, precision=_HI)
        mu_d = jnp.einsum("...n,...nd->...d", wn, dst, precision=_HI)
        ds = src - mu_s[..., None, :]
        dd = dst - mu_d[..., None, :]
        sigma = jnp.einsum("...n,...nd,...ne->...de", wn, dd, ds, precision=_HI)  # cov(dst, src)
    else:
        # raw-moment formulation: every term is a plain sum over points, so
        # one psum round yields the global fit from shard-local pieces
        wsum = jnp.maximum(_reduce(jnp.sum(w, axis=-1, keepdims=True)), 1e-12)
        sw_s = _reduce(jnp.einsum("...n,...nd->...d", w, src, precision=_HI))
        sw_d = _reduce(jnp.einsum("...n,...nd->...d", w, dst, precision=_HI))
        sw_ds = _reduce(jnp.einsum("...n,...nd,...ne->...de", w, dst, src, precision=_HI))
        mu_s = sw_s / wsum
        mu_d = sw_d / wsum
        sigma = sw_ds / wsum - mu_d[..., :, None] * mu_s[..., None, :]

    u, s, vt = jnp.linalg.svd(sigma)
    det = jnp.linalg.det(jnp.matmul(u, vt, precision=_HI))
    fix = jnp.ones(sigma.shape[:-2] + (3,), sigma.dtype).at[..., 2].set(jnp.sign(det))
    r = jnp.matmul(u, fix[..., :, None] * vt, precision=_HI)
    t = mu_d - jnp.einsum("...ij,...j->...i", r, mu_s, precision=_HI)

    degenerate = _reduce(jnp.sum(w, axis=-1)) <= 1e-12
    eye = jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), r.shape)
    r = jnp.where(degenerate[..., None, None], eye, r)
    t = jnp.where(degenerate[..., None], 0.0, t)

    out = jnp.zeros(r.shape[:-2] + (4, 4), r.dtype)
    out = out.at[..., :3, :3].set(r)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def gauss_newton_pose_step(src, dst, m_dir, m_kind, w,
                           axis_name: str | None = None) -> jax.Array:
    """One Gauss-Newton rigid update for a hybrid point-to-plane objective.

    Minimizes sum_i w_i |M_i (src_i + dx - dst_i)|^2 over the se(3) update
    dx = (omega, t) linearized at identity (apply to already-transformed
    src), where M_i projects the residual:

      surface corr (m_kind=0): M = n n^T      (point-to-plane, n = m_dir)
      edge corr    (m_kind=1): M = I - t t^T  (perpendicular to the edge
                                               tangent, t = m_dir)

    This is a strictly-better refinement than the reference's point-to-point
    umeyama (impl/scene.hpp:393): the tangential DOFs of sampled surfaces do
    not bias the fit.  Returns [4, 4] (the small update as a rigid pose).

    src/dst: [N, 3]; m_dir: [N, 3]; m_kind: [N] bool (True=edge); w: [N].

    ``axis_name``: when the corr arrays are point-axis shards of a
    mesh-sharded scene (inside shard_map), the normal equations A = J^T W J
    and b = -J^T W r are plain sums over points — one psum round makes
    every shard solve the identical global 6x6 system (the same raw-moment
    pattern as ``weighted_kabsch``'s sharded path).
    """
    d = src - dst  # residual vector per corr
    # M d and M J assembled via the projector action on vectors
    def project(v):
        along = jnp.sum(v * m_dir, axis=-1, keepdims=True) * m_dir
        plane = v - along  # I - t t^T (edge)
        normal = along  # n n^T (surface)
        return jnp.where(m_kind[:, None], plane, normal)

    # J columns: d(residual)/d(omega) = -[src]x ; d/dt = I
    # For each corr, A_i = J^T M J with M idempotent symmetric -> use rows
    # r_k = M e_k stacked implicitly: accumulate via projected basis action.
    n = src.shape[0]
    eye = jnp.eye(3, dtype=src.dtype)

    # Build the 3x6 Jacobian per corr: J = [ -[p]x | I ]
    px, py, pz = src[:, 0], src[:, 1], src[:, 2]
    zeros = jnp.zeros_like(px)
    neg_skew = jnp.stack([
        jnp.stack([zeros, pz, -py], axis=-1),
        jnp.stack([-pz, zeros, px], axis=-1),
        jnp.stack([py, -px, zeros], axis=-1),
    ], axis=-2)  # [N, 3, 3] = -[p]x
    j = jnp.concatenate([neg_skew, jnp.broadcast_to(eye, (n, 3, 3))], axis=-1)  # [N,3,6]

    # M J: project each of the 6 columns of J (project is row-batched over corrs)
    cols = jnp.moveaxis(j, -1, 0)  # [6, N, 3]
    mcols = jnp.stack([project(c) for c in cols], axis=0)  # [6, N, 3]
    md = project(d)  # [N, 3]

    ww = w[:, None]
    a = jnp.einsum("ind,jnd->ij", mcols * ww[None], mcols, precision=_HI)  # [6,6]
    b = -jnp.einsum("ind,nd->i", mcols * ww[None], md, precision=_HI)  # [6]
    if axis_name is not None:
        a = jax.lax.psum(a, axis_name)
        b = jax.lax.psum(b, axis_name)
    # Levenberg damping for rank-deficient corr sets
    a = a + 1e-6 * jnp.trace(a) / 6.0 * jnp.eye(6, dtype=a.dtype)
    x = jnp.linalg.solve(a, b)
    omega, trans = x[:3], x[3:]

    angle = jnp.linalg.norm(omega)
    axis = omega / jnp.maximum(angle, 1e-12)
    k = jnp.array([
        [0.0, -axis[2], axis[1]],
        [axis[2], 0.0, -axis[0]],
        [-axis[1], axis[0], 0.0],
    ])
    r = (jnp.eye(3) + jnp.sin(angle) * k
         + (1.0 - jnp.cos(angle)) * jnp.matmul(k, k, precision=_HI))

    out = jnp.zeros((4, 4), src.dtype)
    out = out.at[:3, :3].set(r)
    out = out.at[:3, 3].set(trans)
    out = out.at[3, 3].set(1.0)
    return out


def transform_points(t: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply [..., 4, 4] to [..., N, 3]."""
    return jnp.einsum("...ij,...nj->...ni", t[..., :3, :3], pts, precision=_HI) + t[..., None, :3, 3]


def invert_rigid(t: jax.Array) -> jax.Array:
    """Inverse of a rigid [..., 4, 4] (R^T, -R^T t)."""
    r = t[..., :3, :3]
    rt = jnp.swapaxes(r, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", rt, t[..., :3, 3], precision=_HI)
    out = jnp.zeros_like(t)
    out = out.at[..., :3, :3].set(rt)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out


def rotation_angle(r: jax.Array) -> jax.Array:
    """Rotation angle (radians) of [..., 3, 3] rotation matrices."""
    tr = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    c = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return jnp.arccos(c)


def pose_delta(t_a: jax.Array, t_b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(translation delta, rotation delta radians) between two rigid poses.

    The composition matmul MUST be exact: arccos((trace-1)/2) near identity
    amplifies a 1e-3 bf16 trace error into a phantom ~1.5 degree delta.
    """
    d = jnp.matmul(invert_rigid(t_a), t_b, precision=_HI)
    return jnp.linalg.norm(d[..., :3, 3], axis=-1), rotation_angle(d[..., :3, :3])
