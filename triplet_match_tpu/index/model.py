"""Model compilation: voxel LUT + sorted pair-feature table.

TPU-native replacement for ``model<Point>::init`` and its two query indexes
(/root/reference/include/impl/model.hpp:15-192):

* The dense **voxel LUT** mapping every voxel of the model bounding volume
  to its nearest model point (impl/model.hpp:41-94) is already TPU-shaped:
  one batched 1-NN of inverse-mapped voxel centers against the model cloud.
* The ``unordered_multimap<discrete_feature, (i,j)>`` (impl/model.hpp:124-149)
  becomes a **sorted key table**: discrete features pack losslessly into one
  uint32 key; valid pair keys are sorted together with their (i, j) payloads
  and queried by ``searchsorted`` + bounded gather (the reference itself caps
  bucket reads at query_limit=200, impl/scene.hpp:19, which justifies the
  fixed-width gather).

Model compilation is an offline step (the reference rebuilds per run; we
also support serialization — something the reference lacks, SURVEY §5).
Heavy math runs in JAX; the table assembly stays in jnp so compilation can
be jitted per (capacity, edge-cap) shape.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from triplet_match_tpu.config import (
    DEFAULT_DISCRETIZATION,
    DEFAULT_POLICY,
    DEFAULT_SAMPLE_PARAMS,
    DiscretizationParams,
    SampleParams,
    SearchPolicy,
)
from triplet_match_tpu.core import cloud as cl
from triplet_match_tpu.features import discretize as dz
from triplet_match_tpu.features import pairfeat as pf
from triplet_match_tpu.ops import knn as knn_ops
from triplet_match_tpu.ops.curvature import edge_mask as edge_mask_op
from triplet_match_tpu.ops.curvature import principal_curvatures

_INVALID_KEY = np.uint32(0xFFFFFFFF)

# voxel-count threshold above which the LUT builds by jump-flood (ops/jfa.py)
# instead of exact brute 1-NN over all voxel centers; ~2M voxels is where
# the O(V * N) brute term starts dominating model compilation
_LUT_JFA_THRESHOLD = 2_000_000

# Total-voxel budget for the LUT grid.  The reference sizes the grid purely
# from resolution (impl/model.hpp:41-65), so a densely sampled model (e.g. a
# 20k-point wireframe lattice: resolution ~ edge spacing) explodes the
# volume — measured 1088^3 = 1.29G voxels = a 5.2GB LUT whose jump-flood
# build needs ~40G of HBM temps (edge-dense study, ROADMAP).  Above this
# budget the per-axis extents shrink uniformly (voxels grow isotropically)
# until the volume fits.  Semantics: the LUT seeds finish_find/ICP
# correspondences and voxel_query; a coarser seed only loosens those
# starting points — the Pallas scorer's exact-NN ranking and the tight
# ICP polish are LUT-free, and voxel_query_exact re-ranks true distances.
# 2^27 voxels = 512MB LUT, ~4.2G JFA peak — fits one v5e chip comfortably.
_MAX_LUT_VOXELS = 134_217_728


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "cloud",
        "resolution",
        "diameter",
        "to_voxel",
        "lut",
        "edge",
        "bounds_min",
        "bounds_max",
        "keys",
        "pairs",
        "pair_count",
        "n_edge",
        "n_all",
    ],
    meta_fields=["margin"],
)
@dataclasses.dataclass(frozen=True)
class CompiledModel:
    """Compiled model index (a pytree; serializable as arrays).

    Attributes mirror the reference model state (impl/model.hpp:236-251):
      cloud:      the (finite-filtered) model cloud.
      resolution: mean 1-NN distance.
      diameter:   bbox diagonal.
      to_voxel:   [4,4] affine world->voxel (impl/model.hpp:52-61).
      lut:        [ex,ey,ez] int32 nearest model point per voxel.
      edge:       [N] bool edge-point mask (the ``subset_`` after filtering).
      bounds_min/bounds_max: [4] feature bounds (``feat_bounds_``).
      keys:       [P] uint32 sorted packed discrete-feature keys
                  (invalid-pair slots hold 0xFFFFFFFF at the tail).
      pairs:      [P,2] int32 (i, j) model point indices, co-sorted.
      pair_count: scalar int32 — number of valid table entries (the
                  reference's ``pair_count_`` is famously uninitialized,
                  impl/model.hpp:248; ours is real).
      n_edge:     scalar int32 — ``point_count()`` analog (subset size).
      n_all:      scalar int32 — valid cloud size.
      margin:     static voxel margin (= 5, impl/model.hpp:48).
    """

    cloud: cl.PointCloud
    resolution: jax.Array
    diameter: jax.Array
    to_voxel: jax.Array
    lut: jax.Array
    edge: jax.Array
    bounds_min: jax.Array
    bounds_max: jax.Array
    keys: jax.Array
    pairs: jax.Array
    pair_count: jax.Array
    n_edge: jax.Array
    n_all: jax.Array
    margin: int

    @property
    def extents(self) -> tuple[int, int, int]:
        return self.lut.shape


def _voxel_grid_setup(lower, upper, resolution_val: float, margin: int):
    """Voxel extents + world->voxel affine.

    Mirrors impl/model.hpp:41-65: ext = max(bbox_diag / (0.5*resolution), 1),
    extents = int(ext + 2*margin), per-axis scale ext/range (1 where range ~ 0),
    translation ``scale*(-lower) + margin - 0.5`` (the -0.5 is the reference's
    subvoxel shift).  Host-side: extents must be static (they size the LUT).
    """
    rng = upper - lower
    # clamp: a zero/denormal resolution would make ext inf, and the shrink
    # loop's inf/inf then poisons extents with NaN -> INT_MIN
    ext = np.minimum(np.maximum(rng / (0.5 * max(resolution_val, 1e-30)), 1.0), 1e9)
    # isotropic shrink when the resolution-derived volume exceeds the HBM
    # budget (dense models; see _MAX_LUT_VOXELS).  The correction exponent
    # counts only the axes that can still shrink — a near-1D model (one
    # long axis, two clamped at 1) would otherwise stall: the cube-root
    # factor under-corrects threefold per iteration and 8 rounds exit
    # still over budget, breaking the fits-one-chip contract below.
    for _ in range(40):  # fixed-point: the +2*margin term shifts the solve
        total = float(np.prod(ext + 2.0 * margin))
        if total <= _MAX_LUT_VOXELS:
            break
        shrinkable = ext > 1.0
        n_s = max(int(np.sum(shrinkable)), 1)
        f = (total / _MAX_LUT_VOXELS) ** (1.0 / n_s)
        ext = np.where(shrinkable, np.maximum(ext / f, 1.0), ext)
    extents = (ext + 2.0 * margin).astype(np.int32)
    eps = 1e-12
    scale = np.where(rng < 1e-5, 1.0, ext / np.maximum(rng, eps))
    to_voxel = np.eye(4, dtype=np.float32)
    to_voxel[0, 0], to_voxel[1, 1], to_voxel[2, 2] = scale
    to_voxel[:3, 3] = scale * (-lower) + margin - 0.5
    return tuple(int(e) for e in extents), to_voxel


def _pair_pass(exyz, etan, evalid, bounds, params, lower_bound, upper_bound,
               parallel_eps, block=256):
    """Tiled pass over the compacted edge-point pair square [E, E].

    Operates on edge-gathered arrays so memory scales with the edge subset,
    not the full cloud (the reference's pair passes also run on the filtered
    subset, impl/model.hpp:96-149).  When ``bounds`` is None returns the
    feature bounds (pass 1, impl/model.hpp:100-122); otherwise packed keys
    (pass 2, impl/model.hpp:124-149).
    """
    from jax import lax

    e = exyz.shape[0]
    nblocks = -(-e // block)
    pad = nblocks * block - e
    xyz = jnp.pad(exyz, ((0, pad), (0, 0)))
    tan = jnp.pad(etan, ((0, pad), (0, 0)))
    em = jnp.pad(evalid, (0, pad))

    def tile(i0):
        sl = lambda a: lax.dynamic_slice_in_dim(a, i0, block, axis=0)
        p0 = sl(xyz)[:, None, :]
        t0 = sl(tan)[:, None, :]
        e0 = sl(em)[:, None]
        p1 = xyz[None, :, :]
        t1 = tan[None, :, :]
        rows = i0 + jnp.arange(block)
        not_self = rows[:, None] != jnp.arange(e + pad)[None, :]
        gates = pf.pair_gates(p0, p1, t0, lower_bound, upper_bound, parallel_eps)
        valid = e0 & em[None, :] & not_self & gates
        f = pf.pair_feature(p0, p1, t0, t1)
        return valid, f

    starts = jnp.arange(nblocks) * block

    if bounds is None:

        def body(carry, i0):
            bmin, bmax, cnt = carry
            valid, f = tile(i0)
            v = valid[..., None]
            bmin = jnp.minimum(bmin, jnp.min(jnp.where(v, f, jnp.inf), axis=(0, 1)))
            bmax = jnp.maximum(bmax, jnp.max(jnp.where(v, f, -jnp.inf), axis=(0, 1)))
            return (bmin, bmax, cnt + jnp.sum(valid)), None

        init = (jnp.full((4,), jnp.inf), jnp.full((4,), -jnp.inf), jnp.int32(0))
        (bmin, bmax, cnt), _ = jax.lax.scan(body, init, starts)
        return bmin, bmax, cnt
    else:
        bmin, bmax = bounds

        def body(i0):
            valid, f = tile(i0)
            valid = valid & pf.feature_valid(f, bmin, bmax)
            df = dz.discretize_feature(f, bmin, bmax, params)
            key = jnp.where(valid, dz.pack_key(df), _INVALID_KEY)
            return key

        keys = jax.lax.map(body, starts)  # [nblocks, block, e+pad]
        return keys.reshape(-1, e + pad)[:e, :e]


@partial(jax.jit, static_argnames=("policy",))
def _measure(cloud: cl.PointCloud, policy: SearchPolicy):
    """Stage 1: finite filter, resolution, bbox, curvature -> edge mask."""
    cloud = cl.finite_filter(cloud)
    res = cl.resolution(cloud)
    lower, upper = cl.bbox(cloud)
    curv = principal_curvatures(cloud, k=policy.curvature_k)
    edge = edge_mask_op(
        cloud,
        curv,
        tangent_norm_threshold=policy.tangent_norm_threshold,
        curvature_ratio_threshold=policy.curvature_ratio_threshold,
    )
    return res, lower, upper, edge


@partial(
    jax.jit,
    static_argnames=("extents", "discretization", "policy", "pair_block", "margin"),
)
def _build(
    cloud: cl.PointCloud,
    edge: jax.Array,
    edge_idx: jax.Array,  # [E_pad] int32 indices of (subsampled) edge points
    edge_idx_valid: jax.Array,  # [E_pad] bool
    to_voxel: jax.Array,
    res: jax.Array,
    dia: jax.Array,
    lower_bound: jax.Array,
    upper_bound: jax.Array,
    *,
    extents: tuple[int, int, int],
    discretization: DiscretizationParams,
    policy: SearchPolicy,
    pair_block: int,
    margin: int,
) -> CompiledModel:
    """Stage 2: fused compile program — LUT + pair table over the edge subset."""
    cloud = cl.finite_filter(cloud)

    # --- voxel LUT: nearest model point per voxel center (impl/model.hpp:81-94)
    ex, ey, ez = extents
    if ex * ey * ez > _LUT_JFA_THRESHOLD:
        # big grids (dense models): jump-flood propagation — O(V log V)
        # dense shifts, no O(V * N) term (ops/jfa.py; almost-exact, see its
        # module docstring and the parity test)
        from triplet_match_tpu.ops.jfa import nearest_point_volume

        lut = nearest_point_volume(cloud.xyz, cloud.valid, to_voxel,
                                   extents=extents)
    else:
        inv = jnp.linalg.inv(to_voxel)
        ii, jj, kk = jnp.meshgrid(
            jnp.arange(ex, dtype=jnp.float32),
            jnp.arange(ey, dtype=jnp.float32),
            jnp.arange(ez, dtype=jnp.float32),
            indexing="ij",
        )
        centers = jnp.stack([ii, jj, kk], axis=-1).reshape(-1, 3)
        centers = centers @ inv[:3, :3].T + inv[:3, 3]
        lut_idx, _ = knn_ops.nn1(centers, cloud.xyz, cloud.valid)
        lut = lut_idx.reshape(ex, ey, ez)

    # --- pair passes over the compacted edge subset (impl/model.hpp:100-149)
    exyz = cloud.xyz[edge_idx]
    etan = cloud.tangent[edge_idx]
    evalid = edge_idx_valid & cloud.valid[edge_idx] & edge[edge_idx]

    bmin, bmax, _ = _pair_pass(
        exyz, etan, evalid, None, discretization, lower_bound, upper_bound,
        policy.pair_parallel_epsilon, block=pair_block,
    )
    # valid_bounds with the live-call args (0, 1) is the identity
    # (impl/model.hpp:122, impl/feature.hpp:90-114)
    bmin, bmax = pf.valid_bounds(bmin, bmax, 0.0, 1.0)

    key_sq = _pair_pass(
        exyz, etan, evalid, (bmin, bmax), discretization, lower_bound, upper_bound,
        policy.pair_parallel_epsilon, block=pair_block,
    )

    e = edge_idx.shape[0]
    keys_flat = key_sq.reshape(-1)
    order = jnp.argsort(keys_flat)  # invalid sentinel 0xFFFFFFFF sorts last
    keys_sorted = keys_flat[order]
    i_idx = edge_idx[(order // e).astype(jnp.int32)]
    j_idx = edge_idx[(order % e).astype(jnp.int32)]
    pairs = jnp.stack([i_idx, j_idx], axis=-1)
    pair_count = jnp.sum((keys_sorted != _INVALID_KEY).astype(jnp.int32))

    return CompiledModel(
        cloud=cloud,
        resolution=res,
        diameter=dia,
        to_voxel=to_voxel,
        lut=lut,
        edge=edge,
        bounds_min=bmin,
        bounds_max=bmax,
        keys=keys_sorted,
        pairs=pairs,
        pair_count=pair_count,
        n_edge=jnp.sum(edge.astype(jnp.int32)),
        n_all=cloud.count(),
        margin=margin,
    )


def compile_model(
    cloud: cl.PointCloud,
    discretization: DiscretizationParams = DEFAULT_DISCRETIZATION,
    sample_params: SampleParams = DEFAULT_SAMPLE_PARAMS,
    policy: SearchPolicy = DEFAULT_POLICY,
    *,
    margin: int = 5,
    pair_block: int = 256,
    max_pair_points: int = 4096,
    subset: np.ndarray | None = None,
) -> CompiledModel:
    """Compile a model cloud into its two query indexes.

    Analog of ``model::init`` (impl/model.hpp:15-167) in two jitted stages:
    a measurement pass (resolution/bbox/edge mask — bbox sizes the voxel
    grid, so extents must be concrete) and one fused build program over the
    compacted edge subset.

    ``subset`` (optional [N] bool mask) restricts the edge/pair-table
    eligibility ONLY — the voxel LUT and correspondence scoring still use
    the full cloud, matching the reference where ``init(subset)`` filters
    the pair-pass subset while ``voxel_query`` and scoring see everything
    (impl/model.hpp:17-30, 81-94).

    ``max_pair_points`` caps the pair-table subset for very large models:
    the reference enumerates ALL edge-point pairs (O(E^2) hash entries,
    impl/model.hpp:124-149); above the cap we evenly subsample edge points,
    which thins redundant pair entries without shrinking feature coverage.

    Both jitted stages resolve through the AOT executable disk cache
    (utils/aot.py): re-compiling a known model shape in a fresh process is
    a local file load instead of a trip through the (erratic) remote
    backend compile service — ``model::init`` upstream is a seconds-scale
    step every time (impl/model.hpp:15-167).
    """
    from triplet_match_tpu.utils import aot

    if aot.enabled():
        meas_fn = aot.get_or_compile(
            "model_measure",
            jax.jit(partial(_measure, policy=policy)),
            (cloud,), statics=repr(policy),
        )
        res_d, lower_d, upper_d, edge_d = meas_fn(cloud)
    else:
        res_d, lower_d, upper_d, edge_d = _measure(cloud, policy)
    if subset is not None:
        edge_d = edge_d & jnp.asarray(np.asarray(subset, bool))
    res = float(res_d)
    lower, upper = np.asarray(lower_d), np.asarray(upper_d)
    dia = float(np.linalg.norm(upper - lower))
    if not (res > 0.0) or not np.isfinite(res):
        # every point duplicated (merge artifact) drives the mean 1-NN
        # distance to exactly 0, which would blow the grid setup up to
        # inf/NaN extents AND collapse every resolution-scaled threshold
        # downstream.  Fall back to a bbox-derived scale and warn.
        import warnings

        res = max(dia / 100.0, 1e-9)
        warnings.warn(
            "model cloud resolution is 0 (exactly duplicated points?); "
            f"falling back to diameter/100 = {res:.3g}", stacklevel=2)
    extents, to_voxel = _voxel_grid_setup(lower, upper, res, margin)

    edge_np = np.asarray(edge_d)
    eidx = np.where(edge_np)[0]
    if eidx.size > max_pair_points:
        sel = np.linspace(0, eidx.size - 1, max_pair_points).astype(np.int64)
        eidx = eidx[sel]
    e_pad = max(-(-max(eidx.size, 1) // pair_block) * pair_block, pair_block)
    edge_idx = np.zeros(e_pad, np.int32)
    edge_idx[: eidx.size] = eidx
    edge_idx_valid = np.zeros(e_pad, bool)
    edge_idx_valid[: eidx.size] = True

    build_args = (
        cloud,
        edge_d,
        jnp.asarray(edge_idx),
        jnp.asarray(edge_idx_valid),
        jnp.asarray(to_voxel),
        jnp.float32(res),
        jnp.float32(dia),
        jnp.float32(dia * sample_params.min_diameter_factor),
        jnp.float32(dia * sample_params.max_diameter_factor),
    )
    build_statics = dict(
        extents=extents,
        discretization=discretization,
        policy=policy,
        pair_block=pair_block,
        margin=margin,
    )
    if aot.enabled():
        build_fn = aot.get_or_compile(
            "model_build",
            jax.jit(partial(_build, **build_statics)),
            build_args, statics=repr(tuple(sorted(build_statics.items()))),
        )
        return build_fn(*build_args)
    return _build(*build_args, **build_statics)


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------


def query_pairs(model: CompiledModel, features: jax.Array, params: DiscretizationParams,
                cap: int, limit: int | None = None) -> tuple[jax.Array, jax.Array]:
    """Model pairs matching each query feature (bounded-bucket gather).

    Analog of ``model::query`` (impl/model.hpp:169-178) + the caller-side
    ``query_limit`` cap (impl/scene.hpp:19,310).

    Buckets larger than ``cap``/``limit`` return ``min(bucket, cap,
    limit)`` entries sampled with an even stride over the WHOLE bucket
    instead of truncating to the bucket front: for symmetric/repetitive
    models a bucket can hold hundreds of pairs, and front-truncation would
    hide the same tail pairs from *every* query forever.  (The reference walks an unordered_multimap bucket, so
    its first ``query_limit`` entries are hash-order-arbitrary; an even
    stride is the deterministic batched equivalent with full-bucket reach.)

    Args:
      features: [..., 4] continuous pair features.
      cap: static max pairs returned per query.
      limit: optional dynamic cap on entries *considered* per bucket
        (``detail::query_limit`` = 200; <=0 or None means the whole bucket).

    Returns:
      (pairs [..., cap, 2] int32, valid [..., cap] bool).
    """
    df = dz.discretize_feature(features, model.bounds_min, model.bounds_max, params)
    keys = dz.pack_key(df)
    shape = keys.shape
    kf = keys.reshape(-1)
    left = jnp.searchsorted(model.keys, kf, side="left")
    right = jnp.searchsorted(model.keys, kf, side="right")
    blen = (right - left).astype(jnp.int32)
    # number of entries RETURNED per bucket (cap and query_limit both bound
    # it); the even stride below always spans the FULL bucket — clamping
    # blen itself before striding would reintroduce the deterministic
    # front-truncation bias this function exists to avoid (the tail pairs
    # of a >limit bucket would be hidden from every query forever)
    take = jnp.minimum(blen, cap)
    if limit is not None and limit > 0:
        take = jnp.minimum(take, limit)
    offs = jnp.arange(cap, dtype=jnp.int32)
    # even-stride positions: identity when the bucket fits (blen == take),
    # floor(i*len/take) when it overflows (covers [0, len) uniformly with
    # distinct positions; always < len)
    pos = jnp.where(
        blen[:, None] <= take[:, None],
        offs[None, :],
        (offs[None, :] * blen[:, None]) // jnp.maximum(take[:, None], 1),
    )
    gather_idx = left[:, None] + pos
    valid = offs[None, :] < take[:, None]
    gather_idx = jnp.minimum(gather_idx, model.keys.shape[0] - 1)
    pairs = model.pairs[gather_idx]
    return pairs.reshape(*shape, cap, 2), valid.reshape(*shape, cap)


def voxel_query(model: CompiledModel, pos: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Nearest-model-point lookup through the voxel LUT.

    Analog of ``model::voxel_query`` (impl/model.hpp:180-192).  ``pos`` is
    [..., 3] in model/world space; returns (index [...], in_bounds [...]).
    Out-of-grid positions return in_bounds=False (the nullopt branch).
    """
    v = jnp.matmul(pos, model.to_voxel[:3, :3].T,
                   precision=jax.lax.Precision.HIGHEST) + model.to_voxel[:3, 3]
    ijk = jnp.floor(v).astype(jnp.int32)
    ex, ey, ez = model.lut.shape
    in_bounds = (
        (ijk[..., 0] >= 0) & (ijk[..., 0] < ex)
        & (ijk[..., 1] >= 0) & (ijk[..., 1] < ey)
        & (ijk[..., 2] >= 0) & (ijk[..., 2] < ez)
    )
    cl_ijk = jnp.clip(ijk, 0, jnp.asarray([ex - 1, ey - 1, ez - 1], jnp.int32))
    idx = model.lut[cl_ijk[..., 0], cl_ijk[..., 1], cl_ijk[..., 2]]
    return idx, in_bounds


def voxel_query_exact(model: CompiledModel, pos: jax.Array) -> tuple[jax.Array, jax.Array]:
    """LUT-seeded *exact* nearest-model-point lookup.

    The plain LUT returns the nearest model point of the containing voxel's
    *center*, which quantizes correspondences by ~half a voxel.  This
    variant gathers the LUT entries of the 2x2x2 voxels surrounding the
    query position and picks the exact argmin among those candidates —
    an efficient implementation of the reference's ``naive_corrs`` exact-knn
    fallback (impl/scene.hpp:446-453) used by the tight ICP polish.

    Returns (index [...], in_bounds [...]).
    """
    v = jnp.matmul(pos, model.to_voxel[:3, :3].T,
                   precision=jax.lax.Precision.HIGHEST) + model.to_voxel[:3, 3]
    base = jnp.floor(v - 0.5).astype(jnp.int32)
    ex, ey, ez = model.lut.shape
    hi = jnp.asarray([ex - 1, ey - 1, ez - 1], jnp.int32)

    best_d2 = jnp.full(pos.shape[:-1], jnp.inf, jnp.float32)
    best_idx = jnp.zeros(pos.shape[:-1], jnp.int32)
    any_inb = jnp.zeros(pos.shape[:-1], bool)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ijk = base + jnp.asarray([dx, dy, dz], jnp.int32)
                inb = jnp.all((ijk >= 0) & (ijk <= hi), axis=-1)
                c = jnp.clip(ijk, 0, hi)
                idx = model.lut[c[..., 0], c[..., 1], c[..., 2]]
                d2 = jnp.sum(jnp.square(pos - model.cloud.xyz[idx]), axis=-1)
                d2 = jnp.where(inb, d2, jnp.inf)
                take = d2 < best_d2
                best_d2 = jnp.where(take, d2, best_d2)
                best_idx = jnp.where(take, idx, best_idx)
                any_inb = any_inb | inb
    return best_idx, any_inb
