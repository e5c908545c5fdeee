"""Public object API mirroring the reference's ``model``/``scene`` classes.

Thin OO façade over the functional core so a reference user finds the same
surface (/root/reference/include/model:31-61, include/scene:36-53):

    m = Model(cloud, DiscretizationParams(...))
    m.init(SampleParams(...))                    # model::init
    s = Scene(scene_cloud)
    matches = s.find_all_parallel(m, dist_thres, model_match_factor,
                                  early_out_factor, sample_params, max_icp)
    inst = s.instantiate(m, matches[0])

Differences from the reference, all deliberate (SURVEY §7 quirks list):
  * deterministic under ``seed`` (reference is clock-seeded),
  * ``pair_count()`` returns the real count (uninitialized upstream,
    impl/model.hpp:248),
  * ``instantiate`` defaults to the useful all-points behavior (upstream
    returns an empty cloud by default, impl/scene.hpp:515-519),
  * ``statistics`` is actually populated (declared-but-empty upstream,
    include/scene:31-33).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from triplet_match_tpu.config import (
    DEFAULT_DISCRETIZATION,
    DEFAULT_POLICY,
    DEFAULT_SAMPLE_PARAMS,
    DiscretizationParams,
    SampleParams,
    SearchPolicy,
)
from triplet_match_tpu.core.cloud import PointCloud
from triplet_match_tpu.index import model as model_index
from triplet_match_tpu.index.serialize import (
    load_discretization,
    load_model,
    save_model,
)
from triplet_match_tpu.search import driver


@dataclasses.dataclass
class Statistics:
    """Populated search statistics (include/scene:31-33, never filled there)."""

    rejection_rate: float = 0.0
    rounds: int = 0
    hypotheses_scored: int = 0
    matches_accepted: int = 0


class Model:
    """``model<Point>`` analog (include/model:31-61)."""

    def __init__(self, cloud: PointCloud, params: DiscretizationParams = DEFAULT_DISCRETIZATION,
                 policy: SearchPolicy = DEFAULT_POLICY):
        self._cloud = cloud
        self._params = params
        self._policy = policy
        self._compiled: model_index.CompiledModel | None = None

    # -- model::init (include/model:35-37).  The subset restricts only the
    # edge/pair-table eligibility; the voxel LUT and scoring keep the full
    # cloud (impl/model.hpp:17-30 — the reference's subset_ feeds the pair
    # passes while voxel_query/scoring see everything).
    def init(self, sample_params: SampleParams = DEFAULT_SAMPLE_PARAMS,
             subset: np.ndarray | None = None) -> "Model":
        mask = None
        if subset is not None:
            mask = np.zeros(self._cloud.capacity, bool)
            mask[np.asarray(subset)] = True
        self._compiled = model_index.compile_model(
            self._cloud, self._params, sample_params, self._policy, subset=mask
        )
        return self

    @property
    def compiled(self) -> model_index.CompiledModel:
        if self._compiled is None:
            raise RuntimeError("Cannot query uninitialized model")  # impl/model.hpp:172
        return self._compiled

    def query(self, feature, cap: int | None = None):
        """model::query (impl/model.hpp:169-178): pairs for a 4-D feature."""
        import jax.numpy as jnp

        cap = cap or self._policy.query_cap
        f = jnp.asarray(feature, jnp.float32)
        pairs, valid = model_index.query_pairs(
            self.compiled, f[None, :], self._params, cap, limit=self._policy.query_limit
        )
        v = np.asarray(valid[0])
        return np.asarray(pairs[0])[v]

    def voxel_query(self, pos):
        """model::voxel_query (impl/model.hpp:180-192): index or None."""
        import jax.numpy as jnp

        idx, ok = model_index.voxel_query(self.compiled, jnp.asarray(pos, jnp.float32)[None, :])
        return int(idx[0]) if bool(ok[0]) else None

    def diameter(self) -> float:
        return float(self.compiled.diameter)

    def resolution(self) -> float:
        return float(self.compiled.resolution)

    def point_count(self) -> int:
        return int(self.compiled.n_edge)  # subset size, model:point_count semantics

    def pair_count(self) -> int:
        return int(self.compiled.pair_count)

    def extents(self) -> tuple[int, int, int]:
        return self.compiled.extents

    def voxel_transform(self) -> np.ndarray:
        return np.asarray(self.compiled.to_voxel)

    def margin(self) -> int:
        return self.compiled.margin

    def feature_bounds(self) -> tuple[np.ndarray, np.ndarray]:
        return np.asarray(self.compiled.bounds_min), np.asarray(self.compiled.bounds_max)

    def cloud(self) -> PointCloud:
        return self._cloud

    def save(self, path: str):
        save_model(path, self.compiled, self._params)

    @staticmethod
    def load(path: str, params: DiscretizationParams = DEFAULT_DISCRETIZATION,
             policy: SearchPolicy = DEFAULT_POLICY) -> "Model":
        m = Model.__new__(Model)
        # prefer the params the model was COMPILED with (stored since r3):
        # the pair-table keys are quantized under them, so querying with
        # different params silently misses every bucket
        stored = load_discretization(path)
        if stored is not None and stored != params:
            if params != DEFAULT_DISCRETIZATION:
                import warnings

                warnings.warn(
                    f"{path} was compiled with {stored}; ignoring the "
                    f"mismatched DiscretizationParams passed to load()",
                    stacklevel=2)
            params = stored
        m._params = params
        m._policy = policy
        m._compiled = load_model(path)
        m._cloud = m._compiled.cloud
        return m


class Scene:
    """``scene<Point>`` analog (include/scene:36-53)."""

    def __init__(self, cloud: PointCloud, policy: SearchPolicy = DEFAULT_POLICY):
        self._cloud = cloud
        self._policy = policy
        self._prep = None
        self._prep_mesh = None
        self.statistics = Statistics()

    def _prepare(self, mesh=None):
        if self._prep is None or self._prep_mesh is not mesh:
            self._prep = driver.prepare_scene(self._cloud, self._policy, mesh=mesh)
            self._prep_mesh = mesh
        return self._prep

    def find_all_parallel(
        self,
        model: Model,
        dist_thres: float = 3.0,
        model_match_factor: float = 0.4,
        early_out_factor: float = 0.9,
        sample_params: SampleParams = DEFAULT_SAMPLE_PARAMS,
        max_icp_iterations: int = 10,
        seed: int = 13,
        mesh=None,
        progress=None,
    ) -> list[driver.Match]:
        """scene::find_all_parallel (include/scene:47-48).

        ``mesh``: optional ``jax.sharding.Mesh`` — 1-axis for hypothesis
        data parallelism across chips, 2-axis ("dp", "sp") to additionally
        shard the scene arrays (see driver.find_all).

        ``progress``: optional per-round callback (fraction of the current
        phase completed — see driver.find_all); pass
        ``utils.progress.ProgressBar(...).poll`` for a live terminal bar.
        """
        matches = driver.find_all(
            model.compiled,
            self._cloud,
            dist_thres=dist_thres,
            model_match_factor=model_match_factor,
            early_out_factor=early_out_factor,
            sample_params=sample_params,
            discretization=model._params,
            policy=self._policy,
            max_icp_iterations=max_icp_iterations,
            seed=seed,
            prep=self._prepare(mesh),
            mesh=mesh,
            progress=progress,
        )
        st = driver.LAST_SEARCH_STATS
        self.statistics = Statistics(
            rejection_rate=st.get("rejection_rate", 0.0),
            rounds=st.get("rounds", 0),
            hypotheses_scored=st.get("hypotheses_scored", 0),
            matches_accepted=len(matches),
        )
        return matches

    def find(self, model: Model, **kwargs) -> driver.Match | None:
        """Best single match or None (the reference's single-shot ``find``,
        commented out upstream at include/scene:606-610 — provided live)."""
        matches = self.find_all_parallel(model, **kwargs)
        return matches[0] if matches else None

    def instantiate(self, model: Model, match: driver.Match,
                    instantiate_all: bool = True) -> np.ndarray:
        return driver.instantiate(model.compiled, match, instantiate_all)

    def cloud(self) -> PointCloud:
        return self._cloud


class Matcher:
    """Serving session: one compiled model, a stream of scenes.

    Under jit every distinct scene capacity is a distinct program — the
    round-executable cache (search/driver.py) and the AOT disk cache
    (utils/aot.py) only pay off when capacities repeat.  ``Matcher`` pads
    every incoming cloud's capacity up to a power-of-two bucket (floor
    ``min_capacity``, aligned to the mesh's sp extent), so a stream of
    arbitrarily-sized scenes funnels into a handful of compiled programs
    instead of one per unique size.

    No reference analog — the reference's demo rebuilds everything per run;
    this is the deployment loop its library users would hand-roll::

        matcher = Matcher(model, policy=SearchPolicy(...))
        for cloud in scene_stream:
            matches = matcher.match(cloud)
    """

    def __init__(self, model: Model, policy: SearchPolicy = DEFAULT_POLICY, *,
                 mesh=None, min_capacity: int = 4096):
        self._model = model
        self._policy = policy
        self._mesh = mesh
        self._min_capacity = min_capacity
        self.statistics = Statistics()

    def bucket_capacity(self, n: int) -> int:
        """Capacity bucket for a cloud of ``n`` points (see
        :func:`_bucket_capacity`)."""
        return _bucket_capacity(n, self._min_capacity, self._mesh)

    def match(self, cloud: PointCloud, **kwargs) -> list[driver.Match]:
        """Search one scene; accepts any capacity, reuses bucketed programs.

        Keyword arguments pass through to :meth:`Scene.find_all_parallel`
        (``dist_thres``, ``model_match_factor``, ``seed``, ...).
        """
        from triplet_match_tpu.core.cloud import pad_capacity

        cloud = pad_capacity(cloud, self.bucket_capacity(cloud.capacity))
        scene = Scene(cloud, self._policy)
        matches = scene.find_all_parallel(self._model, mesh=self._mesh, **kwargs)
        self.statistics = scene.statistics
        return matches

    def warmup(self, scene_sizes, dense: bool = True, **kwargs) -> list[int]:
        """Precompile the round programs for the buckets covering
        ``scene_sizes`` before live traffic arrives.

        The compiled-program cache keys on the FULL policy, so a warmup
        must run the production search unchanged — it matches this
        matcher's own model against a synthetic scene of each bucket size
        (the model instance is planted, so each warm search accepts after
        its first rounds instead of exhausting the no-match budget).

        ``dense=True`` (default) additionally warms each bucket's DENSE
        executable flavor — a touching-fog scene that fires the
        fog-density switch and the max eff_b2 rung — so a dense production
        scene never pays its flavor's first compile at serve time (the
        round-4 serving p95 was exactly one such cold compile).  Returns
        the bucket capacities compiled.  Serving analog of the AOT disk
        cache (utils/aot.py): that removes the per-PROCESS cliff, this
        removes the per-BUCKET-and-FLAVOR one.
        """
        caps = sorted({self.bucket_capacity(int(s)) for s in scene_sizes})
        driver.reserve_round_cache(len(caps) * (2 if dense else 1))
        done = []
        for cap in caps:
            self.match(_warmup_scene([self._model], cap), **kwargs)
            if dense:
                self.match(_warmup_scene([self._model], cap, dense=True), **kwargs)
            done.append(cap)
        return done


def _bucket_capacity(n: int, min_capacity: int, mesh) -> int:
    """Smallest serving capacity bucket >= ``n``.

    Buckets are powers of two (floor ``min_capacity``), rounded up to the
    mesh sp extent when one is set (sp-sharded scene arrays need the
    capacity divisible by sp).  IDEMPOTENT by construction — a value the
    function returned maps to itself — so warmup scenes built at a bucket
    land in that bucket even when sp alignment makes it a non-power-of-two
    (the smallest-aligned-bucket search below; a naive next-pow2-of-n
    re-bucket would jump an aligned 8195 to 16385).
    """
    sp = 1
    if mesh is not None and "sp" in mesh.shape:
        sp = mesh.shape["sp"]
    align = lambda c: -(-c // sp) * sp  # noqa: E731
    p = 1 << max(int(min_capacity) - 1, 0).bit_length()
    while align(p) < n:
        p <<= 1
    return align(p)


def _warmup_scene(models: list[Model], capacity: int, dense: bool = False) -> PointCloud:
    """Synthetic warmup scene: one instance of EVERY library model planted
    (spread along x so they don't overlap) in clutter, sized to
    ``capacity`` so bucketing maps it exactly there.  Planting every model
    keeps each per-model warm search on the cheap accept path instead of
    exhausting the full no-match sample budget.

    ``dense=False`` scatters uniform clutter (random unit normals, no
    tangents) — the SPARSE executable flavor (fog switch off, default
    eff_b2).  ``dense=True`` concentrates touching fog patches around the
    instances so the fog-density switch fires and the adaptive inner bound
    raises eff_b2 to its max rung — the DENSE flavor (exact routing +
    widened funnel + prescreen + edge ranking + subset join).  With the
    two-rung eff_b2 ladder these two scenes cover every round executable a
    production scene of this bucket can resolve."""
    from triplet_match_tpu.io.synthetic import fog_patches

    parts = []
    offset = 0.0
    for m in models:
        mc = m.compiled.cloud
        mv = np.asarray(mc.valid)
        d = float(m.compiled.diameter)
        shift = np.array([offset + d, 0.0, 0.0], np.float32)
        parts.append((np.asarray(mc.xyz)[mv] + shift,
                      np.asarray(mc.normal)[mv],
                      np.asarray(mc.tangent)[mv]))
        offset += 2.5 * d
    xyz = np.concatenate([p[0] for p in parts])
    nrm = np.concatenate([p[1] for p in parts])
    tan = np.concatenate([p[2] for p in parts])
    n_clutter = max(int(capacity) - xyz.shape[0], 0)
    rng = np.random.default_rng(0)
    d0 = float(models[0].compiled.diameter)
    if dense:
        ext = max(0.8 * offset, 1.2 * d0)
        c_xyz, c_nrm = fog_patches(rng, n_clutter, seed_base=77,
                                   size=(d0, d0), extent=ext)
    else:
        ext = max(2.0 * offset, 4.0 * d0)
        c_xyz = rng.uniform(-ext, ext, (n_clutter, 3)).astype(np.float32)
        c_nrm = rng.normal(size=(n_clutter, 3)).astype(np.float32)
        c_nrm /= np.maximum(np.linalg.norm(c_nrm, axis=1, keepdims=True), 1e-9)
    return PointCloud.from_arrays(
        np.concatenate([xyz, c_xyz])[:capacity],
        np.concatenate([nrm, c_nrm])[:capacity],
        np.concatenate([tan, np.zeros_like(c_xyz)])[:capacity],
    )


class MultiMatcher:
    """Serving session over a model LIBRARY: N compiled models, a stream
    of scenes.

    The multi-model analog of :class:`Matcher` (BASELINE config 5's
    deployment shape: several part models searched in every incoming
    scene).  Scene preparation runs ONCE per scene and is shared by all
    models (driver.find_all_multi); matches claim scene points across
    models (a point matched by one model is unavailable to the rest —
    the multi-model extension of the masking protocol at
    /root/reference/include/impl/scene.hpp:87-93).  Capacity bucketing
    works as in :class:`Matcher`, so each (bucket, model) pair compiles
    once for the whole stream::

        mm = MultiMatcher([model_a, model_b], policy=SearchPolicy(...))
        for cloud in scene_stream:
            per_model = mm.match(cloud)       # list of match lists
    """

    def __init__(self, models: list[Model], policy: SearchPolicy = DEFAULT_POLICY, *,
                 mesh=None, min_capacity: int = 4096,
                 raycast_origins=None, min_cast_score: float | None = None):
        if not models:
            raise ValueError("MultiMatcher needs at least one model")
        # one discretization for the whole library: find_all quantizes its
        # query features under these params, which must match each model's
        # compile-time quantization or every pair-table lookup misses
        if any(m._params != models[0]._params for m in models[1:]):
            raise ValueError(
                "MultiMatcher models must share DiscretizationParams "
                f"(got {[m._params for m in models]}); compile them with "
                "one params set or serve them from separate Matchers")
        self._models = list(models)
        self._policy = policy
        self._mesh = mesh
        self._min_capacity = min_capacity
        self._raycast_origins = raycast_origins
        self._min_cast_score = min_cast_score
        self.statistics = Statistics()

    def bucket_capacity(self, n: int) -> int:
        return _bucket_capacity(n, self._min_capacity, self._mesh)

    def match(self, cloud: PointCloud, **kwargs) -> list[list[driver.Match]]:
        """Search one scene with every model; one match list per model.

        Keyword arguments pass through to ``driver.find_all``
        (``dist_thres``, ``model_match_factor``, ``seed``, ...).  All
        models share this Matcher's ``DiscretizationParams``-compiled
        indexes and one scene prep.
        """
        from triplet_match_tpu.core.cloud import pad_capacity

        cloud = pad_capacity(cloud, self.bucket_capacity(cloud.capacity))
        prep = driver.prepare_scene(cloud, self._policy, mesh=self._mesh)
        kwargs.setdefault("discretization", self._models[0]._params)
        results = driver.find_all_multi(
            [m.compiled for m in self._models],
            cloud,
            policy=self._policy,
            prep=prep,
            mesh=self._mesh,
            raycast_origins=self._raycast_origins,
            min_cast_score=self._min_cast_score,
            **kwargs,
        )
        # aggregate observability across the per-model searches (Matcher
        # parity); per-model snapshots stay in driver.LAST_MULTI_SEARCH_STATS
        per_model = driver.LAST_MULTI_SEARCH_STATS
        self.statistics = Statistics(
            rejection_rate=(sum(s.get("rejection_rate", 0.0) for s in per_model)
                            / max(len(per_model), 1)),
            rounds=sum(s.get("rounds", 0) for s in per_model),
            hypotheses_scored=sum(s.get("hypotheses_scored", 0) for s in per_model),
            matches_accepted=sum(len(r) for r in results),
        )
        return results

    def warmup(self, scene_sizes, dense: bool = True, **kwargs) -> list[int]:
        """Precompile bucket programs before traffic (see Matcher.warmup,
        including the ``dense`` executable-flavor coverage).  One instance
        of EVERY library model is planted per warmup scene, so all
        (bucket, model) programs compile on the cheap accept path.
        Grows the round-executable LRU to hold the whole warmed set first
        (driver.reserve_round_cache) — otherwise models x buckets x
        flavors > the default bound would evict the earliest programs
        before traffic."""
        caps = sorted({self.bucket_capacity(int(s)) for s in scene_sizes})
        driver.reserve_round_cache(
            len(caps) * len(self._models) * (2 if dense else 1))
        done = []
        for cap in caps:
            self.match(_warmup_scene(self._models, cap), **kwargs)
            if dense:
                self.match(_warmup_scene(self._models, cap, dense=True), **kwargs)
            done.append(cap)
        return done
