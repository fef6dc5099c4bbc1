"""Device-mesh scaling harness — the multi-chip measurement protocol.

    python -m rivslam_tpu.eval.scaling [--devices 1,2,4,8] [--json OUT]
        [--frames 40] [--capacity 512] [--graph-k 512] [--repeats 3]

Measures, for each device count n (prefixes of `jax.devices()`):

1. **Fleet replay, weak scaling** (`Engine.replay_fleet`): n independent
   sequences sharded one-per-device over a `data` mesh — the production
   batch-processing form (dist/dist_gn.py's data axis). Reports aggregate
   frames/s and efficiency vs n=1.
2. **Model-parallel registration, strong scaling**
   (`dist_gn.sharded_register`): ONE registration problem with its source
   points sharded over the `model` axis, H/b psum'd per LM iteration — the
   reference's OpenMP point loop (fast_apdgicp_impl.hpp:146,221) as a
   collective. Reports ms/solve vs the single-device local path.
3. **Distributed global pose-graph solvers** at keyframe capacity:
   edge-sharded PCG (`dist_graph.solve_pose_graph_sharded`) and
   submap-partitioned block-Schur (`block_schur.solve_pose_graph_schur_sharded`,
   interior eliminations sharded over submaps, reduced system psum'd).
   Reports ms/solve vs the local solvers and checks the results agree.

Environment honesty: this container exposes ONE real TPU chip, so multi-chip
runs here use the virtual host-CPU mesh (`--virtual N`, the same mechanism
as the test suite / driver dryrun). Virtual devices SHARE the host cores —
aggregate throughput is bounded by the machine, so weak-scaling efficiency
on a virtual mesh mostly measures partitioning + collective overhead, not
speedup. The point of this harness is (a) those overheads, (b) end-to-end
validation that every sharded path executes and matches its local twin, and
(c) being the exact command to run on a real TPU slice, where the same
meshes ride ICI. Results land in BENCHMARKS.md either way.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time


def _min_time(fn, repeats: int) -> float:
    """Best-of-N wall time of fn() (fn must block on its outputs)."""
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def _drifted_loop_graph(K: int, L: int, n_active: int, dtype):
    """A drifted circular trajectory with one exact loop edge (the
    test_dist.py problem, sized to capacity): odometry chain with 1%
    relative-pose noise accumulating drift, loop 0 <-> n-1 pulling it back."""
    import jax.numpy as jnp
    import numpy as np

    from rivslam_tpu.core import lie
    from rivslam_tpu.loop import global_graph

    g = global_graph.PoseGraph.create(K, L, dtype=dtype)
    rng = np.random.default_rng(0)
    gt = [np.eye(4)]
    step = np.eye(4)
    step[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray([0, 0, 2 * np.pi / n_active])))
    step[0, 3] = 1.0
    for _ in range(1, n_active):
        gt.append(gt[-1] @ step)
    gt = np.stack(gt)
    est = [np.eye(4)]
    rels = [np.eye(4)]
    for k in range(1, n_active):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        rel = rel @ np.asarray(lie.se3_exp(jnp.asarray(rng.normal(size=6) * 0.01)))
        rels.append(rel)
        est.append(est[-1] @ rel)
    est = np.stack(est)
    rels = np.stack(rels)
    true_rel = np.linalg.inv(gt[0]) @ gt[n_active - 1]
    g = dataclasses.replace(
        g,
        R=g.R.at[:n_active].set(jnp.asarray(est[:, :3, :3], dtype)),
        p=g.p.at[:n_active].set(jnp.asarray(est[:, :3, 3], dtype)),
        node_mask=g.node_mask.at[:n_active].set(True),
        odom_rel_R=g.odom_rel_R.at[:n_active].set(jnp.asarray(rels[:, :3, :3], dtype)),
        odom_rel_p=g.odom_rel_p.at[:n_active].set(jnp.asarray(rels[:, :3, 3], dtype)),
        odom_info=g.odom_info.at[:n_active].set(jnp.eye(6, dtype=dtype) * 100.0),
        loop_i=g.loop_i.at[0].set(0),
        loop_j=g.loop_j.at[0].set(n_active - 1),
        loop_rel_R=g.loop_rel_R.at[0].set(jnp.asarray(true_rel[:3, :3], dtype)),
        loop_rel_p=g.loop_rel_p.at[0].set(jnp.asarray(true_rel[:3, 3], dtype)),
        loop_info=g.loop_info.at[0].set(jnp.eye(6, dtype=dtype) * 400.0),
        loop_mask=g.loop_mask.at[0].set(True),
    )
    return g


def run_scaling(
    device_counts,
    frames: int = 40,
    capacity: int = 512,
    graph_k: int = 512,
    repeats: int = 3,
    gn_iters: int = 6,
    imu_capacity: int = 16,
) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from rivslam_tpu import pipeline
    from rivslam_tpu.core.config import EngineConfig, RegistrationConfig
    from rivslam_tpu.dist import dist_gn, dist_graph, mesh as mesh_mod
    from rivslam_tpu.frontend import apdgicp
    from rivslam_tpu.io import datasets, synthetic
    from rivslam_tpu.loop import block_schur, global_graph

    devs = jax.devices()
    device_counts = [n for n in device_counts if n <= len(devs)]
    out: dict = {
        "platform": devs[0].platform,
        "device_kind": devs[0].device_kind,
        "available_devices": len(devs),
        "device_counts": device_counts,
        "frames": frames,
        "capacity": capacity,
        "graph_k": graph_k,
        "virtual_mesh": devs[0].platform == "cpu",
    }

    # ---- shared inputs -------------------------------------------------
    reg_cfg = RegistrationConfig()
    max_n = max(device_counts)
    seqs = [
        synthetic.simulate_sequence(
            n_frames=frames, seed=100 + i, radius=10.0, capacity=capacity
        )[0]
        for i in range(max_n)
    ]
    stacked = [
        datasets.stack_sequence(s, capacity=capacity, imu_capacity=imu_capacity)
        for s in seqs
    ]

    # one registration problem for model-parallel strong scaling
    rng = np.random.default_rng(7)
    world = synthetic.make_world(rng, n_points=8000)
    T0 = np.eye(4)
    T0[:3, 3] = [0, 0, 2.0]
    T1 = T0.copy()
    T1[:3, 3] += [0.4, -0.2, 0.05]
    tgt_c = synthetic.observe(world, T0, rng, capacity=capacity, noise=0.01)
    src_c = synthetic.observe(world, T1, rng, capacity=capacity, noise=0.01)
    src_p = apdgicp.estimate_covariances(src_c.xyz, src_c.mask, reg_cfg)
    tgt_p = apdgicp.estimate_covariances(tgt_c.xyz, tgt_c.mask, reg_cfg)
    eye4 = jnp.eye(4, dtype=src_p.xyz.dtype)

    # pose graph at capacity
    g = _drifted_loop_graph(graph_k, 8, graph_k - graph_k // 8, jnp.float32)
    chi2_init0 = float(global_graph.linearize(g, 1.0)[-1])
    out["graph_chi2_initial"] = round(chi2_init0, 2)

    # ---- local (single-device) references ------------------------------
    local_reg = jax.jit(lambda s, t, gu: apdgicp.register(s, t, gu, reg_cfg))
    local_reg(src_p, tgt_p, eye4).T.block_until_ready()
    t_reg_local = _min_time(
        lambda: local_reg(src_p, tgt_p, eye4).T.block_until_ready(), repeats
    )

    g_loc, chi2_loc = global_graph.solve_pose_graph(g, gn_iters=gn_iters)
    t_pcg_local = _min_time(
        lambda: global_graph.solve_pose_graph(g, gn_iters=gn_iters)[1]
        .block_until_ready(),
        repeats,
    )
    sblocks = block_schur.effective_blocks(graph_k, 16)
    g_sch, chi2_sch = block_schur.solve_pose_graph_schur(
        g, num_blocks=sblocks, gn_iters=gn_iters
    )
    t_schur_local = _min_time(
        lambda: block_schur.solve_pose_graph_schur(
            g, num_blocks=sblocks, gn_iters=gn_iters
        )[1].block_until_ready(),
        repeats,
    )
    out["local"] = {
        "register_ms": round(1e3 * t_reg_local, 2),
        "pcg_solve_ms": round(1e3 * t_pcg_local, 2),
        "schur_solve_ms": round(1e3 * t_schur_local, 2),
        "schur_blocks": sblocks,
    }
    print(json.dumps({"local": out["local"]}))

    results = []
    fleet_base = None
    for n in device_counts:
        row: dict = {"devices": n}

        # 1) fleet replay weak scaling: n sequences over a data mesh
        fleet_mesh = Mesh(np.asarray(devs[:n]), axis_names=("data",))
        batch = {k: np.stack([st[k] for st in stacked[:n]]) for k in stacked[0]}
        eng = pipeline.Engine(EngineConfig(registration=reg_cfg), seed=0)
        eng.replay_fleet(batch, mesh=fleet_mesh, axis="data")  # warm
        t_fleet = _min_time(
            lambda: eng.replay_fleet(batch, mesh=fleet_mesh, axis="data"), repeats
        )
        agg_fps = n * frames / t_fleet
        if fleet_base is None:
            fleet_base = agg_fps
        row["fleet"] = {
            "sequences": n,
            "aggregate_fps": round(agg_fps, 1),
            "ms_per_frame_per_seq": round(1e3 * t_fleet / frames, 3),
            "weak_scaling_efficiency": round(agg_fps / (fleet_base * n), 3),
        }

        # 2) model-parallel registration strong scaling (needs capacity % n == 0)
        if capacity % n == 0:
            m = mesh_mod.make_mesh(1, n)
            res = dist_gn.sharded_register(src_p, tgt_p, eye4, reg_cfg, m)
            res.T.block_until_ready()
            t_reg = _min_time(
                lambda: dist_gn.sharded_register(
                    src_p, tgt_p, eye4, reg_cfg, m
                ).T.block_until_ready(),
                repeats,
            )
            row["sharded_register"] = {
                "ms": round(1e3 * t_reg, 2),
                "speedup_vs_local": round(t_reg_local / t_reg, 2),
            }

        # 3) distributed pose-graph solvers
        m = mesh_mod.make_mesh(1, n)
        gd, chi2_d = dist_graph.solve_pose_graph_sharded(g, m, gn_iters=gn_iters)
        chi2_d.block_until_ready()
        t_pcg = _min_time(
            lambda: dist_graph.solve_pose_graph_sharded(g, m, gn_iters=gn_iters)[1]
            .block_until_ready(),
            repeats,
        )
        row["dist_pcg"] = {
            "ms": round(1e3 * t_pcg, 2),
            "speedup_vs_local": round(t_pcg_local / t_pcg, 2),
            "chi2_matches_local": bool(
                np.isclose(float(chi2_d), float(chi2_loc), rtol=1e-3)
            ),
        }

        # largest divisor of graph_k that is a multiple of n (ADVICE r2: the
        # old (sblocks//n)*n fallback yielded 0 or non-divisors for
        # non-dividing counts and silently skipped the measurement)
        nb = next(
            (
                b
                for b in range(min(2 * sblocks, graph_k), 0, -1)
                if graph_k % b == 0 and b % n == 0
            ),
            None,
        )
        if nb is None:
            print(f"dist_schur: no valid submap count for {n} devices "
                  f"(graph_k={graph_k}) — skipped")
            row["dist_schur"] = {"skipped": f"no divisor of {graph_k} % {n}"}
        else:
            gs, chi2_s = block_schur.solve_pose_graph_schur_sharded(
                g, m, num_blocks=nb, gn_iters=gn_iters
            )
            chi2_s.block_until_ready()
            t_sch = _min_time(
                lambda: block_schur.solve_pose_graph_schur_sharded(
                    g, m, num_blocks=nb, gn_iters=gn_iters
                )[1].block_until_ready(),
                repeats,
            )
            # equivalence is asserted at solution quality: the dogleg
            # trajectory is chaotic in f32 (see tests/test_block_schur.py::
            # test_capacity_scale_f32_sharded_equivalence), so the bound is
            # |chi2_s - chi2_l| <= 5e-3 * chi2_init with both reduced >99%.
            nb_l = nb if graph_k % nb == 0 else sblocks
            g_l2, chi2_l2 = block_schur.solve_pose_graph_schur(
                g, num_blocks=nb_l, gn_iters=gn_iters
            )
            row["dist_schur"] = {
                "ms": round(1e3 * t_sch, 2),
                "blocks": nb,
                "speedup_vs_local": round(t_schur_local / t_sch, 2),
                "chi2": round(float(chi2_s), 4),
                "chi2_local_same_blocks": round(float(chi2_l2), 4),
                "chi2_rel_reduction": round(1 - float(chi2_s) / chi2_init0, 6),
                "chi2_matches_local": bool(
                    abs(float(chi2_s) - float(chi2_l2)) <= 5e-3 * chi2_init0
                ),
            }

        results.append(row)
        print(json.dumps(row))

    out["scaling"] = results
    # ADVICE r2: a mismatch must be LOUD, not a quiet JSON field
    mismatches = [
        (row["devices"], key)
        for row in results
        for key in ("dist_pcg", "dist_schur")
        if isinstance(row.get(key), dict)
        and row[key].get("chi2_matches_local") is False
    ]
    out["chi2_mismatches"] = [f"{k}@{n}dev" for n, k in mismatches]
    for n, key in mismatches:
        print(f"WARNING: {key} chi2 does NOT match its local twin at "
              f"{n} devices — distributed solver divergence, investigate")
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default=None,
                    help="comma list of device counts (default: powers of 2 "
                    "up to the available count)")
    ap.add_argument("--virtual", type=int, default=0, metavar="N",
                    help="force an N-device virtual host-CPU mesh (the only "
                    "multi-device option in this container)")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--capacity", type=int, default=512)
    ap.add_argument("--graph-k", type=int, default=512)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.virtual}"
            )
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    n_dev = len(jax.devices())
    if args.devices:
        counts = [int(x) for x in args.devices.split(",")]
    else:
        counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev]

    out = run_scaling(
        counts,
        frames=args.frames,
        capacity=args.capacity,
        graph_k=args.graph_k,
        repeats=args.repeats,
    )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 1 if out.get("chi2_mismatches") else 0


if __name__ == "__main__":
    raise SystemExit(main())
