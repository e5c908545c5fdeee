"""Sequential reference-policy oracle (slow NumPy transliteration).

The batched TPU driver (search/driver.py) deliberately restructures the
reference's sequential RANSAC into exhaustive batched scoring + top-k.
Every parity claim about the *policy* (sampling bounds, early-out,
early-drop, greedy acceptance, ICP stopping) therefore needs behavioral
ground truth that actually EXECUTES the reference's control flow.  This
module is that oracle: a host-side NumPy transliteration of

    scene::find_all_parallel   /root/reference/include/impl/scene.hpp:39-98
    scene::find_parallel       impl/scene.hpp:108-240
    scene::find_in_subset      impl/scene.hpp:242-367
    scene::project_            impl/scene.hpp:411-510
    scene::icp_                impl/scene.hpp:369-404

with the reference's *deterministic* mode semantics (seed-13 rng,
impl/scene.hpp:122-128, 244-250).  It shares the compiled model index
(voxel LUT, sorted pair table, feature bounds) and the scene prep's edge
mask with the driver so that only the SEARCH POLICY differs — exactly the
thing under test (tests/test_policy_oracle.py).

Sequential quirks faithfully preserved (each is why the oracle exists):

* ``find_in_subset`` does NOT return the best-scoring hypothesis: a pose
  enters ``best_ts`` only while the deque is EMPTY and its correspondence
  count clears ``accept_prob * n_model_all`` — i.e. the *first sufficient*
  hypothesis in scan order wins the chunk (impl/scene.hpp:330-338).
* ``early_out`` fires when that first-sufficient pose's score reaches the
  threshold, aborting the whole chunk scan (impl/scene.hpp:341-347).
* ``early_drop`` aborts a pose's scoring pass at 5%-of-subset checkpoints
  when a hypergeometric upper confidence bound on its final correspondence
  count falls below the acceptance requirement (impl/scene.hpp:492-506).
  The per-point loop body has no cross-point dependence, so the
  transliteration vectorizes the per-point math and replays the checkpoint
  schedule on prefix sums — sequence-exact, just not slow.
* The per-first adaptive inner bound counts VALID samples (those that
  reach the model query), not loop iterations (impl/scene.hpp:276-282,
  305, 350-352).
* ``fp_mask`` marks the first ``cons`` entries of each chunk, where
  ``cons`` counts non-skipped firsts — if a first was skipped, the tail of
  the visited range goes unmarked (impl/scene.hpp:160-162, 268-271).
* Greedy acceptance walks ICP'd candidates in descending corr-count order,
  claims not-yet-used scene points, and accepts iff the NEW tangent corrs
  clear ``factor * n_model_edge`` AND new total corrs clear
  ``factor * n_model_all``; a rejected candidate returns its claims
  (impl/scene.hpp:193-237).

Documented deviations (shared with the driver, PARITY.md): numpy rng
instead of mt19937 (the stream is irrelevant — the reference defaults to
clock seeds); model-query candidate order is the sorted-table order
(upstream: implementation-defined unordered_multimap bucket order), with
a selectable over-limit bucket read (``bucket_read`` — "reference"
front-walk of up to ``query_limit`` entries, or "driver" = the batched
driver's even-stride ``min(query_cap, query_limit)`` set, see ``query``);
``n_model_all`` is the finite-valid count.
"""

from __future__ import annotations

import math

import numpy as np

from triplet_match_tpu.config import (
    DEFAULT_DISCRETIZATION,
    DEFAULT_POLICY,
    DEFAULT_SAMPLE_PARAMS,
    DiscretizationParams,
    SampleParams,
    SearchPolicy,
)
from triplet_match_tpu.search.driver import Match, ScenePrep


class _NpModel:
    """Host copies of the CompiledModel arrays the oracle reads."""

    def __init__(self, model):
        self.xyz = np.asarray(model.cloud.xyz, np.float32)
        self.normal = np.asarray(model.cloud.normal, np.float32)
        self.tangent = np.asarray(model.cloud.tangent, np.float32)
        self.valid = np.asarray(model.cloud.valid)
        self.lut = np.asarray(model.lut)
        self.to_voxel = np.asarray(model.to_voxel, np.float32)
        self.keys = np.asarray(model.keys)
        self.pairs = np.asarray(model.pairs)
        self.bmin = np.asarray(model.bounds_min, np.float32)
        self.bmax = np.asarray(model.bounds_max, np.float32)
        self.resolution = float(model.resolution)
        self.diameter = float(model.diameter)
        self.n_edge = int(model.n_edge)
        self.n_all = int(model.n_all)
        self.is_edge = np.linalg.norm(self.tangent, axis=-1) > 0.7


def _unsigned_angle(a, b):
    """atan2(||a x b||, |a . b|) (impl/feature.hpp:5-8), f32 like upstream."""
    cross = np.cross(a, b)
    return np.float32(math.atan2(np.linalg.norm(cross), abs(float(np.dot(a, b)))))


def _base_transform(src_i, src_j, src_t, tgt_i, tgt_j, tgt_t):
    """Pair-frame alignment (impl/scene.hpp:538-567), numpy."""

    def frame(o, j, t):
        u = j - o
        u = u / max(np.linalg.norm(u), 1e-12)
        v = t - np.dot(t, u) * u
        v = v / max(np.linalg.norm(v), 1e-12)
        w = np.cross(u, v)
        w = w / max(np.linalg.norm(w), 1e-12)
        return np.stack([u, v, w], axis=1)

    ba = frame(src_i, src_j, src_t)
    bb = frame(tgt_i, tgt_j, tgt_t)
    r = bb @ ba.T
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = r
    t[:3, 3] = tgt_i - r @ src_i
    return t


def _umeyama(src, dst):
    """Eigen::umeyama(src, dst, false) — rigid Kabsch (impl/scene.hpp:393)."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sigma = (dst - mu_d).T @ (src - mu_s) / src.shape[0]
    u, _, vt = np.linalg.svd(sigma)
    fix = np.eye(3)
    if np.linalg.det(u @ vt) < 0:
        fix[2, 2] = -1.0
    r = u @ fix @ vt
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = r
    t[:3, 3] = mu_d - r @ mu_s
    return t


class PolicyOracle:
    """One search session over a fixed scene (holds the mutable masks)."""

    def __init__(self, model, prep: ScenePrep, *,
                 discretization: DiscretizationParams = DEFAULT_DISCRETIZATION,
                 policy: SearchPolicy = DEFAULT_POLICY,
                 seed: int = 13, concurrency: int = 4,
                 bucket_read: str = "reference"):
        self.m = _NpModel(model)
        self.disc = discretization
        self.policy = policy
        self.seed = seed
        self.bucket_read = bucket_read  # over-limit bucket policy, see query()
        # the reference chunks the outer subset over hardware_concurrency()-1
        # std::async workers (impl/scene.hpp:146-157); each chunk returns its
        # own first-sufficient candidate, so the chunk count shapes behavior
        self.concurrency = max(concurrency, 1)

        self.sxyz = np.asarray(prep.cloud.xyz, np.float32)
        self.snormal = np.asarray(prep.cloud.normal, np.float32)
        self.stangent = np.asarray(prep.cloud.tangent, np.float32)
        self.svalid = np.asarray(prep.cloud.valid)
        self.tangent_mask = np.asarray(prep.tangent_mask) & self.svalid
        n = self.sxyz.shape[0]
        self.mask = np.zeros(n, bool)  # mask_ (consumed)
        self.fp_mask = np.zeros(n, bool)  # fp_mask_ (used-up firsts)
        self.stan_norm = np.linalg.norm(self.stangent, axis=-1)

    # -- project_ (impl/scene.hpp:411-510), vectorized per-point math with a
    # sequential replay of the early-drop checkpoint schedule on prefix sums
    def project(self, subset, t, accept_prob, dist_thres, early_out=False,
                allow_all=False):
        m, pol = self.m, self.policy
        thres = dist_thres * m.resolution

        pts = self.sxyz[subset]
        r3 = t[:3, :3]
        tpos = pts @ r3.T + t[:3, 3]

        elig = ~self.mask[subset] & self.svalid[subset]
        if not (allow_all or pol.samples_on_all):
            elig &= self.stan_norm[subset] > 0.7  # considered_correspondence_

        v = tpos @ m.to_voxel[:3, :3].T + m.to_voxel[:3, 3]
        ijk = np.floor(v).astype(np.int64)
        ex, ey, ez = m.lut.shape
        inb = ((ijk[:, 0] >= 0) & (ijk[:, 0] < ex)
               & (ijk[:, 1] >= 0) & (ijk[:, 1] < ey)
               & (ijk[:, 2] >= 0) & (ijk[:, 2] < ez))
        cl = np.clip(ijk, 0, [ex - 1, ey - 1, ez - 1])
        midx = m.lut[cl[:, 0], cl[:, 1], cl[:, 2]]

        dist = np.linalg.norm(tpos - m.xyz[midx], axis=-1)
        within = dist <= thres
        use_tangent = self.tangent_mask[subset]
        is_tangent = m.is_edge[midx]
        kind_ok = use_tangent == is_tangent
        reach = elig & inb & within  # reached the dist gate (impl/scene.hpp:463-467)
        corr = reach & kind_ok

        if pol.weighted_distance:
            weight = np.exp(-dist * dist / (2.0 * thres))  # denominator is thres (:430)
        else:
            weight = np.ones_like(dist)
        ref = np.where(use_tangent[:, None], self.stangent[subset],
                       self.snormal[subset])
        tref = ref @ r3.T
        ref_n = np.where(is_tangent[:, None], m.tangent[midx], m.normal[midx])
        w_orient = np.abs(np.sum(tref * ref_n, axis=-1))
        per_point = np.where(corr, weight * w_orient, 0.0)
        if pol.negative_scores:
            per_point = per_point - np.where(reach & ~kind_ok, weight, 0.0)

        score_prefix = np.concatenate([[0.0], np.cumsum(per_point)])
        corr_prefix = np.concatenate([[0], np.cumsum(corr.astype(np.int64))])

        cut = len(subset)
        saved = 0
        if pol.early_drop and early_out:
            # checkpoint schedule: tests[i] = 0.05*(i+1)*|subset|, 18 slots
            # (impl/scene.hpp:421-425); replayed sequentially on the prefix
            size = len(subset)
            tests = [int(0.05 * (i + 1) * size) for i in range(18)]
            next_test = 0
            for tried in range(1, size + 1):
                if next_test < 18 and tried >= tests[next_test]:
                    # hypergeometric upper bound via the negative trick
                    # (impl/scene.hpp:493-498); the double->uint32 wraps
                    # cancel to upper = -1 - trunc((x*n + tmp)/N)
                    bign = -2.0 - tried
                    x = -2.0 - size
                    nn = -1.0 - float(corr_prefix[tried])
                    tmp = math.sqrt(max(
                        (x * nn * (bign - x) * (bign - nn)) / (bign - 1.0), 0.0))
                    upper = -1.0 - float(math.trunc((x * nn + tmp) / bign))
                    if upper < accept_prob * m.n_all:
                        cut = tried
                        saved = size - tried
                        break
                    next_test += 1

        sc = np.asarray(subset)[:cut][corr[:cut]]
        mc = midx[:cut][corr[:cut]]
        score = float(score_prefix[cut])
        if saved == 0:
            score = score / max(m.n_all, 1)  # normalize_score (:406-409);
            # the early-drop return skips normalization (:502) — preserved
        return sc, mc.astype(np.int64), score, saved

    def finish_find(self, t, accept_prob, dist_thres):
        """project_ over ALL points, no early-out (impl/scene.hpp:100-106)."""
        all_idx = np.arange(self.sxyz.shape[0])
        sc, mc, score, _ = self.project(all_idx, t, accept_prob, dist_thres)
        return (t, sc, mc, score)

    def icp(self, match, max_iterations, dist_thres, accept_prob):
        """Correspondence ICP (impl/scene.hpp:369-404)."""
        if max_iterations == 0:
            return match
        best = self.finish_find(match[0], accept_prob, 2.0 * dist_thres)
        it = 0
        while True:
            t, sc, mc, _ = best
            if len(sc) < 3:
                return best
            trans = _umeyama(self.sxyz[sc], self.m.xyz[mc])
            proj = self.finish_find(trans, accept_prob, 2.0 * dist_thres)
            if len(proj[1]) < len(best[1]):
                return best
            best = proj
            it += 1
            if it == max_iterations:
                return best

    def query(self, f):
        """Sorted-table bucket read with a selectable over-limit policy.

        Reference: model query = unordered_multimap equal_range
        (impl/model.hpp:169-178) walked by the caller up to ``query_limit``
        entries (impl/scene.hpp:19,310) — i.e. a hash-order-ARBITRARY
        subset of over-limit buckets.  Two deterministic instances of that
        arbitrary order are supported (``bucket_read``):

        * ``"reference"`` (default): the first ``query_limit`` entries in
          table order — preserves the reference's candidate *richness*
          (up to 200 per query), the faithful policy-oracle mode.
        * ``"driver"``: ``min(bucket, query_cap, query_limit)`` entries at
          even-stride positions spanning the whole bucket — the EXACT set
          index.model.query_pairs returns (scan order = table order, which
          the stride preserves), for A/Bs that must rule out
          pair-visibility differences entirely.
        """
        from triplet_match_tpu.features import discretize as dz

        m, disc = self.m, self.disc
        bmin, brange = m.bmin[0], m.bmax[0] - m.bmin[0]
        nval = (f[0] - bmin) / brange
        d0 = min(max(int(math.floor(nval * disc.distance_step_count)), 0),
                 disc.distance_step_count - 1)
        a1 = int(f[1] / disc.angle_step)
        a2 = int(f[2] / disc.angle_step)
        key = (d0 << (2 * dz._ANG_BITS)) | (a1 << dz._ANG_BITS) | a2
        left = int(np.searchsorted(m.keys, key, side="left"))
        right = int(np.searchsorted(m.keys, key, side="right"))
        blen = right - left
        take = blen
        limit = self.policy.query_limit
        if limit and limit > 0:
            take = min(take, limit)
        if getattr(self, "bucket_read", "reference") == "driver":
            take = min(take, self.policy.query_cap)
            if take < blen:
                pos = (np.arange(take, dtype=np.int64) * blen) // max(take, 1)
                return m.pairs[left + pos]
        return m.pairs[left:left + take]

    def find_in_subset(self, firsts, lower2, upper2, dist_thres, accept_prob,
                       early_out_threshold, force_up, rng):
        """impl/scene.hpp:242-367 — returns (matches, cons)."""
        m, pol = self.m, self.policy
        best_score = 0.0
        best_ts = []
        out = False
        cons = 0

        for i in firsts:
            if out:
                break
            if self.fp_mask[i] or self.mask[i]:
                continue
            cons += 1
            p1 = self.sxyz[i]
            t1 = self.stangent[i]

            # radius_search_inclusive: all valid points within the model
            # diameter, sorted by distance (PCL kd-tree order,
            # impl/pointcloud.hpp:180-198)
            d = np.linalg.norm(self.sxyz - p1, axis=-1)
            ball = np.where((d <= m.diameter) & self.svalid)[0]
            if ball.size == 0:
                continue
            nn = ball[np.argsort(d[ball], kind="stable")]

            # per-first adaptive inner bound (impl/scene.hpp:276-282)
            prob = float(m.n_all) / nn.size
            inner_bound = int(-math.log(1.0 - pol.match_probability) / prob)
            inner_bound = max(inner_bound, pol.min_sample_count)
            inner_bound = min(inner_bound, nn.size)
            if pol.force_exhaustive:
                inner_bound = nn.size

            inner0 = nn.copy()
            rng.shuffle(inner0)

            valid_samples = 0
            for j in inner0:
                if out:
                    break
                if not self.tangent_mask[j] or self.mask[j] or i == j:
                    continue
                p2 = self.sxyz[j]
                d0 = p2 - p1
                sqn0 = float(np.dot(d0, d0))
                if sqn0 < lower2 or sqn0 > upper2:
                    continue
                dhat = d0 / max(math.sqrt(sqn0), 1e-30)
                if 1.0 - abs(float(np.dot(dhat, t1))) < pol.pair_parallel_epsilon:
                    continue

                f0 = math.sqrt(sqn0)
                f = (f0, _unsigned_angle(d0, t1),
                     _unsigned_angle(d0, self.stangent[j]), f0)
                # valid() vs model bounds (impl/feature.hpp:48-88)
                if not (m.bmin[0] <= f[0] <= m.bmax[0]):
                    continue

                pairs = self.query(f)
                valid_samples += 1

                for (m_i, m_j) in pairs:
                    if out:
                        break
                    t = _base_transform(p1, p2, t1, m.xyz[m_i], m.xyz[m_j],
                                        m.tangent[m_i])
                    if force_up and abs(1.0 - t[2, 2]) > 0.01:
                        continue

                    sc, mc, score, _ = self.project(
                        nn, t, accept_prob, dist_thres, early_out=True)
                    if score > best_score:
                        # first-sufficient wins the chunk (impl/scene.hpp:330-338)
                        if not best_ts and len(sc) > accept_prob * m.n_all:
                            best_score = score
                            best_ts.insert(0, t)
                        if pol.early_out and best_score >= early_out_threshold:
                            out = True

                if valid_samples > inner_bound:
                    break

        matches = [self.finish_find(t, accept_prob, dist_thres)
                   for t in best_ts[:5]]
        return matches, cons

    def find_parallel(self, dist_thres, max_icp_iterations, accept_prob,
                      early_out_threshold, params: SampleParams):
        """impl/scene.hpp:108-240 — one phase."""
        m, pol = self.m, self.policy
        n_model = m.n_edge
        min_points = int(accept_prob * n_model)
        min_points_all = int(accept_prob * m.n_all)
        lower = m.diameter * params.min_diameter_factor
        upper = m.diameter * params.max_diameter_factor
        lower2, upper2 = lower * lower, upper * upper

        rng = np.random.default_rng(self.seed)

        tangent_indices = np.where(self.tangent_mask)[0]
        n_scene = tangent_indices.size
        left = tangent_indices[~self.fp_mask[tangent_indices]
                               & ~self.mask[tangent_indices]]
        if left.size == 0:
            return []

        # adaptive outer bound (impl/scene.hpp:131-141)
        outer_prob = min(n_model / left.size, 1.0)
        if outer_prob >= 1.0:
            outer_bound = pol.min_sample_count
        else:
            outer_bound = int(math.log(1.0 - pol.match_probability)
                              / math.log(1.0 - outer_prob))
        outer_bound = max(outer_bound, pol.min_sample_count)
        outer_bound = min(outer_bound, max(n_scene, 1))
        if pol.force_exhaustive:
            outer_bound = n_scene

        take = min(outer_bound, left.size)
        outer_subset = rng.choice(left, size=take, replace=False)
        rng.shuffle(outer_subset)

        batch = -(-take // self.concurrency)
        cands = []
        for c0 in range(0, take, batch):
            chunk = outer_subset[c0:c0 + batch]
            # each async worker re-seeds deterministically (impl/scene.hpp:244-250)
            chunk_rng = np.random.default_rng(self.seed)
            matches, cons = self.find_in_subset(
                chunk, lower2, upper2, dist_thres, accept_prob,
                early_out_threshold, params.force_up, chunk_rng)
            self.fp_mask[chunk[:cons]] = True  # impl/scene.hpp:160-162
            for match in matches:
                cands.append(self.icp(match, max_icp_iterations, dist_thres,
                                      accept_prob))

        cands.sort(key=lambda c: -len(c[1]))

        result = []
        used: set[int] = set()
        for t, is_, im_, sscore in cands:
            used_copy = set(used)
            isres, imres = [], []
            for si, mi in zip(is_, im_):
                if si not in used:
                    isres.append(si)
                    imres.append(mi)
                used.add(si)
            score = sum(1 for si in isres if self.tangent_mask[si])
            score_all = len(isres)
            if score < min_points or score_all < min_points_all:
                used = used_copy
                continue
            result.append((t, np.asarray(isres, np.int64),
                           np.asarray(imres, np.int64), sscore))
        return result

    def find_all(self, dist_thres=None, model_match_factor=0.4,
                 early_out_factor=0.9,
                 sample_params: SampleParams = DEFAULT_SAMPLE_PARAMS,
                 max_icp_iterations: int = 10,
                 max_phases: int = 16) -> list[Match]:
        """impl/scene.hpp:39-98 (the while(true) multi-instance loop)."""
        if dist_thres is None:
            dist_thres = self.policy.corr_dist_factor
        possible_model = self.m.n_all if self.policy.samples_on_all else int(
            (self.m.is_edge & self.m.valid).sum())
        results: list[Match] = []
        for _ in range(max_phases):
            matches = self.find_parallel(
                dist_thres, max_icp_iterations, model_match_factor,
                early_out_factor * possible_model, sample_params)
            if not matches:
                break
            for t, sc, mc, score in matches:
                self.mask[sc] = True
                results.append(Match(
                    transform=np.linalg.inv(t).astype(np.float32),
                    scene_corrs=sc.astype(np.int32),
                    model_corrs=mc.astype(np.int32),
                    signed_score=float(score),
                ))
        return results


def find_all_oracle(model, prep: ScenePrep, *,
                    dist_thres=None, model_match_factor=0.4,
                    early_out_factor=0.9,
                    sample_params: SampleParams = DEFAULT_SAMPLE_PARAMS,
                    discretization: DiscretizationParams = DEFAULT_DISCRETIZATION,
                    policy: SearchPolicy = DEFAULT_POLICY,
                    max_icp_iterations: int = 10, seed: int = 13,
                    concurrency: int = 4,
                    bucket_read: str = "reference") -> list[Match]:
    """Run the sequential reference policy end to end.  Same signature
    shape as driver.find_all; same Match output type."""
    o = PolicyOracle(model, prep, discretization=discretization, policy=policy,
                     seed=seed, concurrency=concurrency,
                     bucket_read=bucket_read)
    return o.find_all(
        dist_thres=dist_thres, model_match_factor=model_match_factor,
        early_out_factor=early_out_factor, sample_params=sample_params,
        max_icp_iterations=max_icp_iterations,
    )
