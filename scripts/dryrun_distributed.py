"""Multi-controller dryrun: 2 CPU processes x 4 virtual devices, one round.

Validates the multi-host entry (triplet_match_tpu/parallel/distributed.py):
each process joins via ``jax.distributed.initialize``, the two processes
form one 8-device ("dp", "sp") mesh (dp crosses the process boundary, sp
stays within a process — the DCN/ICI layout), scene preparation runs
mesh-sharded, the scene arrays become global sp-sharded Arrays, and one
``search_round_2d`` accepts the planted instance on BOTH controllers.

Usage:  python scripts/dryrun_distributed.py            # parent: spawns 2 procs
        python scripts/dryrun_distributed.py --serving  # serving-surface mode
        (child mode is internal: --child --process-id N --coordinator H:P)

``--serving`` exercises the SERVING surface under process_count > 1
(VERDICT r3 #6): a 2-model ``find_all_multi`` library (api.MultiMatcher,
shared scene prep + cross-model point claiming) and a 3-scene
``api.Matcher`` stream with capacity bucketing + warmup — all host-side
state that had only ever run single-controller (pack caches, capacity
buckets, shared-prep masking).  The parent asserts both controllers emit
IDENTICAL acceptance digests.

The reference has no multi-node story at all (single process + std::async,
/root/reference/include/impl/scene.hpp:146-166); this is the SURVEY §7.11
"multi-host via standard JAX distributed init" capability.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(coordinator: str, process_id: int, num_processes: int) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")  # before backend init

    from triplet_match_tpu.parallel import distributed as dist

    dist.initialize(coordinator, num_processes, process_id,
                    local_device_ids=list(range(4)))
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    from functools import partial

    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.core.transforms import invert_rigid, pose_delta
    from triplet_match_tpu.index.model import compile_model
    from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model
    from triplet_match_tpu.parallel.search2d import SP_AXIS, search_round_2d
    from triplet_match_tpu.search import score_pallas as sp
    from triplet_match_tpu.search.driver import prepare_scene
    from jax.sharding import PartitionSpec as P

    policy = SearchPolicy(
        num_first_samples=32, num_second_samples=8, query_cap=8,
        score_neighbors=256, second_pool=64, finalists=4, max_rounds=2,
        scorer="pallas", pallas_interpret=True,
    )
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    disc = DiscretizationParams()

    # identical on every process (same seeds)
    xyz, nrm, tan = make_box_model(n_edge=240, n_face=720, size=(1.0, 0.8, 0.6), seed=0)
    model = compile_model(PointCloud.from_arrays(xyz, nrm, tan), disc, sample,
                          policy, pair_block=128)
    scene, t_gt, _ = embed_in_scene(
        xyz, nrm, tan, noise=0.001, n_clutter=400, clutter_extent=5.0, seed=11,
        capacity=-(-(960 + 400) // 8) * 8,
    )
    mpack = sp.pack_model(model)

    mesh = dist.make_global_mesh({"dp": 2, "sp": 4})

    # mesh-sharded scene preparation (all 8 devices across both processes)
    prep = prepare_scene(scene, policy, grid_threshold=0, mesh=mesh)

    # scene-length arrays -> global sp-sharded Arrays
    cloud_g = dist.make_global_cloud(mesh, prep.cloud)
    tm_g = dist.make_global_array(mesh, P(SP_AXIS), prep.tangent_mask)
    n = scene.capacity
    consumed = dist.make_global_array(mesh, P(SP_AXIS), np.zeros(n, bool))
    fp = dist.make_global_array(mesh, P(SP_AXIS), np.zeros(n, bool))

    round_fn = jax.jit(partial(
        search_round_2d, mesh,
        discretization=disc, sample_params=sample, policy=policy,
        max_icp_iterations=5,
    ))
    res, consumed2, fp2 = round_fn(
        model, cloud_g, tm_g, consumed, fp, jax.random.PRNGKey(7),
        jnp.float32(3.0), jnp.float32(0.5), mpack,
    )
    jax.block_until_ready(res.accept)
    accept = np.asarray(res.accept)  # replicated
    counts = np.asarray(res.count)
    assert accept.any(), "no instance accepted in the distributed round"
    f = int(np.argmax(counts * accept))
    t_inv = np.asarray(invert_rigid(res.transform[f]))
    dt, dr = pose_delta(jnp.asarray(t_inv), jnp.asarray(t_gt))
    row = {
        "process": process_id,
        "devices_global": jax.device_count(),
        "accepted": int(accept.sum()),
        "best_count": int(counts[f]),
        "dt_mm": round(float(dt) * 1000, 4),
        "dr_deg": round(float(np.degrees(float(dr))), 4),
    }
    assert float(dt) < 6e-3 and float(np.degrees(float(dr))) < 0.5, row

    # --- full find_all host loop on the same global mesh (VERDICT r2 #5 /
    # round-3 review: the multi-instance loop reads consumed/fp/new_corr
    # with np.asarray, which requires replicate_outputs under
    # process_count > 1 — this exercises exactly that path) ---
    from triplet_match_tpu.search.driver import find_all

    matches = find_all(
        model, scene, policy=policy, sample_params=sample, discretization=disc,
        model_match_factor=0.5, seed=7, prep=prep, mesh=mesh,
    )
    assert matches, "find_all accepted nothing on the multi-controller mesh"
    dt2, dr2 = pose_delta(jnp.asarray(matches[0].transform), jnp.asarray(t_gt))
    row["find_all_matches"] = len(matches)
    row["find_all_dt_mm"] = round(float(dt2) * 1000, 4)
    assert float(dt2) < 6e-3, row

    print(json.dumps(row), flush=True)
    jax.distributed.shutdown()
    return 0


def child_serving(coordinator: str, process_id: int, num_processes: int) -> int:
    """Serving surface under 2 controllers: MultiMatcher library search +
    bucketed Matcher stream with warmup (see module docstring)."""
    import jax

    jax.config.update("jax_platforms", "cpu")  # before backend init

    from triplet_match_tpu.parallel import distributed as dist

    dist.initialize(coordinator, num_processes, process_id,
                    local_device_ids=list(range(4)))
    assert jax.device_count() == 8, jax.device_count()

    import numpy as np

    from triplet_match_tpu.api import Matcher, Model, MultiMatcher
    from triplet_match_tpu.config import DiscretizationParams, SampleParams, SearchPolicy
    from triplet_match_tpu.core.cloud import PointCloud
    from triplet_match_tpu.io.synthetic import embed_in_scene, make_box_model, rotation_matrix

    policy = SearchPolicy(
        num_first_samples=32, num_second_samples=8, query_cap=8,
        score_neighbors=256, second_pool=64, finalists=4, max_rounds=2,
        scorer="pallas", pallas_interpret=True,
    )
    sample = SampleParams(min_diameter_factor=0.3, max_diameter_factor=0.95)
    disc = DiscretizationParams()

    # a 2-model library (identical on every process: fixed seeds), one
    # DiscretizationParams for both (the MultiMatcher contract)
    xa = make_box_model(n_edge=240, n_face=720, size=(1.0, 0.8, 0.6), seed=0)
    xb = make_box_model(n_edge=240, n_face=720, size=(0.5, 0.45, 1.2), seed=4)
    model_a = Model(PointCloud.from_arrays(*xa), disc, policy).init(sample)
    model_b = Model(PointCloud.from_arrays(*xb), disc, policy).init(sample)

    mesh = dist.make_global_mesh({"dp": 2, "sp": 4})

    # 3-scene stream with VARYING sizes (distinct capacity buckets): scene 0
    # holds model A, scene 1 holds model B, scene 2 holds both
    def scene_with(parts, n_clutter, seed):
        rng = np.random.default_rng(seed)
        xs, ns, ts = [], [], []
        for (x, n, t), rot, trans in parts:
            r = rotation_matrix(*rot).astype(np.float32)
            xs.append(x @ r.T + np.asarray(trans, np.float32))
            ns.append(n @ r.T)
            ts.append(t @ r.T)
        cx = rng.uniform(-4, 4, (n_clutter, 3)).astype(np.float32)
        cn = rng.normal(size=(n_clutter, 3)).astype(np.float32)
        cn /= np.linalg.norm(cn, axis=1, keepdims=True)
        xs.append(cx)
        ns.append(cn)
        ts.append(np.zeros_like(cx))
        return PointCloud.from_arrays(
            np.concatenate(xs), np.concatenate(ns), np.concatenate(ts))

    scenes = [
        scene_with([(xa, ([0, 0, 1], 0.4), [1.5, 0, 0])], 300, seed=21),
        scene_with([(xb, ([1, 1, 0], 1.1), [-1.0, 0.5, 0])], 900, seed=22),
        scene_with([(xa, ([0, 1, 0], 2.0), [2.5, 0, 0]),
                    (xb, ([1, 0, 0], 0.8), [-2.5, 0, 0])], 2400, seed=23),
    ]

    digest = {"process": process_id, "multi": [], "stream": []}

    # --- 2-model library search over the stream (find_all_multi under a
    # multi-controller mesh: shared prep, cross-model claiming) ---
    mm = MultiMatcher([model_a, model_b], policy, mesh=mesh, min_capacity=1024)
    for cloud in scenes:
        per_model = mm.match(cloud, sample_params=sample, dist_thres=3.0,
                             model_match_factor=0.5, seed=7,
                             max_icp_iterations=5)
        digest["multi"].append([
            [
                [len(r.scene_corrs)] +
                [round(float(v), 3) for v in np.asarray(r.transform)[:3, 3]]
                for r in res
            ]
            for res in per_model
        ])
    expect = [[1, 0], [0, 1], [1, 1]]
    got = [[len(res) for res in row] for row in digest["multi"]]
    assert got == expect, (got, expect)

    # --- bucketed single-model Matcher stream with warmup ---
    matcher = Matcher(model_a, policy, mesh=mesh, min_capacity=1024)
    warmed = matcher.warmup([len(np.asarray(s.xyz)) for s in scenes[:2]],
                            sample_params=sample, dist_thres=3.0,
                            model_match_factor=0.5, seed=7,
                            max_icp_iterations=5)
    digest["warmed_buckets"] = warmed
    for cloud in scenes:
        ms = matcher.match(cloud, sample_params=sample, dist_thres=3.0,
                           model_match_factor=0.5, seed=7,
                           max_icp_iterations=5)
        digest["stream"].append([
            [len(r.scene_corrs)] +
            [round(float(v), 3) for v in np.asarray(r.transform)[:3, 3]]
            for r in ms
        ])
    # model A is planted in scenes 0 and 2 only
    assert [len(s) for s in digest["stream"]] == [1, 0, 1], digest["stream"]

    print(json.dumps(digest), flush=True)
    jax.distributed.shutdown()
    return 0


def parent(serving: bool = False) -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=4").strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--coordinator", coord, "--process-id", str(pid),
             "--num-processes", "2"] + (["--serving"] if serving else []),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    rc = 0
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=2400 if serving else 900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            print(f"process {pid}: TIMEOUT", flush=True)
            rc = 1
            continue
        sys.stdout.write(out)
        outs.append(out)
        if p.returncode != 0:
            print(f"process {pid} failed (rc={p.returncode}):\n{err[-3000:]}",
                  flush=True)
            rc = 1
    if serving and rc == 0:
        # both controllers must emit IDENTICAL acceptance digests
        digests = []
        for out in outs:
            row = json.loads([ln for ln in out.splitlines() if ln.startswith("{")][-1])
            row.pop("process")
            digests.append(row)
        if digests[0] != digests[1]:
            print("CONTROLLER DIGESTS DIVERGE:", digests, flush=True)
            return 1
    if rc == 0:
        print(json.dumps({
            "dryrun_distributed": "serving_ok" if serving else "ok",
            "processes": 2, "devices": 8,
            "mesh": "dp=2 (cross-process) x sp=4",
            **({"surface": "MultiMatcher(2 models) x 3 scenes + "
                           "Matcher stream w/ warmup, digests identical"}
               if serving else {}),
        }), flush=True)
    return rc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--serving", action="store_true")
    ap.add_argument("--coordinator")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=2)
    args = ap.parse_args()
    if args.child and args.serving:
        return child_serving(args.coordinator, args.process_id, args.num_processes)
    if args.child:
        return child(args.coordinator, args.process_id, args.num_processes)
    return parent(serving=args.serving)


if __name__ == "__main__":
    sys.exit(main())
