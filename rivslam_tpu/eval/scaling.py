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


def _schur_phase_probe(g, S: int, n: int, gn_iters: int, repeats: int) -> dict:
    """Per-device phase decomposition of the SPMD block-Schur solve at n
    devices (VERDICT r4 #1): times ONE device's shard of each per-iteration
    phase — chain-edge linearization (K/n edges), block assembly (S/n
    submaps), interior elimination + back-substitution (S/n submaps) — as
    single-device jitted programs at the shard's true shapes, plus the
    replicated separator solve. Together with the psum microbenchmark
    (collective row) these sum to the predicted per-iteration cost on a real
    mesh: per_device(n) + replicated + comm(n). The sharded wall time on the
    VIRTUAL mesh cannot show this (devices share host cores; total work /
    total cores is constant in n) — this probe is the per-device-compute
    measurement the virtual wall time hides."""
    import jax
    import jax.numpy as jnp

    from rivslam_tpu.loop import block_schur as bs

    K = g.R.shape[0]
    L = g.loop_i.shape[0]
    B = K // S
    Sn = S // n
    Kn = K // n
    P = 2 * S + 2 * L
    Pdim = 6 * (P + 1)
    dtype = g.p.dtype

    # device-0 shard bookkeeping (cost model only — slot VALUES don't change
    # the phase costs, so loop-endpoint slot special-casing is skipped)
    jg = jnp.arange(Kn)
    ei = jnp.maximum(jg - 1, 0).astype(jnp.int32)
    ej = jg.astype(jnp.int32)
    emask = g.node_mask[ei] & g.node_mask[ej] & (jg > 0)
    cross = jg % B == 0
    edge_blk = jnp.where(emask & ~cross, jg // B, Sn)
    loc_i = (ei % B).astype(jnp.int32)
    loc_j = (ej % B).astype(jnp.int32)
    node_loc = jnp.arange(Kn)
    sep_local = ((node_loc % B == 0) | (node_loc % B == B - 1)).reshape(Sn, B)
    D = jnp.repeat(~sep_local, 6, axis=1).astype(dtype)
    blk_loc = node_loc // B
    slot_local = jnp.where(
        node_loc % B == 0, 2 * blk_loc,
        jnp.where(node_loc % B == B - 1, 2 * blk_loc + 1, P),
    ).reshape(Sn, B)
    sdim = ((slot_local * 6)[:, :, None] + jnp.arange(6)[None, None, :]).reshape(
        Sn, 6 * B
    )
    rel_R, rel_p, info = g.odom_rel_R[:Kn], g.odom_rel_p[:Kn], g.odom_info[:Kn]
    no_loop = jnp.zeros(Kn, bool)

    def scanned(body):
        @jax.jit
        def f(R, p):
            out, _ = jax.lax.scan(
                lambda c, _: (c + 0e0 * body(R, p + c), None),
                jnp.zeros((), dtype), None, length=gn_iters,
            )
            return out
        return f

    with jax.default_matmul_precision("float32"):
        lin = scanned(
            lambda R, p: sum(
                jnp.sum(v) for v in bs._edge_terms(
                    R, p, ei, ej, rel_R, rel_p, info, emask, no_loop, 1.0
                ).values()
            )
        )
        ch0 = bs._edge_terms(
            g.R, g.p, ei, ej, rel_R, rel_p, info, emask, no_loop, 1.0
        )

        @jax.jit
        def assemble(chHii, chHij, chHjj, chgi, chgj):
            ch = dict(Hii=chHii, Hij=chHij, Hjj=chHjj, gi=chgi, gj=chgj)
            def body(c, _):
                Hb, gb = bs._assemble_chain_blocks(
                    {k: v + c for k, v in ch.items()}, loc_i, loc_j,
                    edge_blk, Sn, B, dtype,
                )
                return c + 0e0 * (jnp.sum(Hb) + jnp.sum(gb)), None
            out, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=gn_iters)
            return out

        Hb0, gb0 = bs._assemble_chain_blocks(ch0, loc_i, loc_j, edge_blk, Sn, B, dtype)
        Hb0 = Hb0 + jnp.eye(6 * B, dtype=dtype) * 1e-6

        @jax.jit
        def elim(Hb, gb):
            def body(c, _):
                H_sep, g_sep, A, b = bs._eliminate_local(
                    Hb + c, gb, D, sdim, Pdim, dtype
                )
                d_loc = bs._back_substitute(A, b, jnp.zeros(Pdim, dtype), sdim, D)
                return c + 0e0 * (H_sep[0, 0] + g_sep[0] + jnp.sum(d_loc)), None
            out, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=gn_iters)
            return out

        H_sep0, g_sep0, _, _ = bs._eliminate_local(Hb0, gb0, D, sdim, Pdim, dtype)
        H_sep0 = H_sep0 + jnp.eye(Pdim, dtype=dtype)

        @jax.jit
        def sep(H, gs):
            def body(c, _):
                d = bs._sep_solve(H + c, -gs[:, None])[:, 0]
                return c + 0e0 * d[0], None
            out, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=gn_iters)
            return out

        lin(g.R, g.p).block_until_ready()
        t_lin = _min_time(lambda: lin(g.R, g.p).block_until_ready(), repeats)
        args = (ch0["Hii"], ch0["Hij"], ch0["Hjj"], ch0["gi"], ch0["gj"])
        assemble(*args).block_until_ready()
        t_asm = _min_time(lambda: assemble(*args).block_until_ready(), repeats)
        elim(Hb0, gb0).block_until_ready()
        t_elim = _min_time(lambda: elim(Hb0, gb0).block_until_ready(), repeats)
        sep(H_sep0, g_sep0).block_until_ready()
        t_sep = _min_time(lambda: sep(H_sep0, g_sep0).block_until_ready(), repeats)

    return {
        "devices": n,
        "blocks_per_device": Sn,
        "edges_per_device": Kn,
        "chain_linearize_ms": round(1e3 * t_lin, 2),
        "block_assembly_ms": round(1e3 * t_asm, 2),
        "eliminate_backsub_ms": round(1e3 * t_elim, 2),
        "sep_solve_replicated_ms": round(1e3 * t_sep, 2),
        "per_device_total_ms": round(1e3 * (t_lin + t_asm + t_elim), 2),
    }


def _fleet_probe(n: int, frames: int, capacity: int, imu_capacity: int,
                 repeats: int) -> dict:
    """Measure ONE fleet weak-scaling point at n virtual devices (invoked as
    a pinned subprocess — see run_scaling). Prints a JSON line."""
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the container's sitecustomize pre-imports jax pinned to the axon
        # TPU relay; flip the live config before any backend initializes
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh

    from rivslam_tpu import pipeline
    from rivslam_tpu.core.config import EngineConfig
    from rivslam_tpu.io import datasets, synthetic

    devs = jax.devices()[:n]
    seqs = [
        synthetic.simulate_sequence(
            n_frames=frames, seed=100 + i, radius=10.0, capacity=capacity
        )[0]
        for i in range(n)
    ]
    stacked = [
        datasets.stack_sequence(s, capacity=capacity, imu_capacity=imu_capacity)
        for s in seqs
    ]
    batch = {k: np.stack([st[k] for st in stacked]) for k in stacked[0]}
    mesh = Mesh(np.asarray(devs), axis_names=("data",))
    eng = pipeline.Engine(EngineConfig(), seed=0)
    eng.replay_fleet(batch, mesh=mesh, axis="data")  # warm/compile
    t = _min_time(lambda: eng.replay_fleet(batch, mesh=mesh, axis="data"), repeats)
    return {
        "sequences": n,
        "aggregate_fps": round(n * frames / t, 1),
        "ms_per_frame_per_seq": round(1e3 * t / frames, 3),
    }


def _fleet_pinned(n: int, cores: int, frames: int, capacity: int,
                  imu_capacity: int, repeats: int,
                  cores_per_device: int = 1) -> dict | None:
    """Fleet point measured in a subprocess pinned to min(n·cpd, cores) cores.

    A virtual host-CPU device is NOT a chip: XLA's CPU runtime runs one
    device's ops across the WHOLE core pool (measured 95% 4-core busy at
    n=1), so an unpinned n=1 baseline gets every core and weak-scaling
    "efficiency" collapses by construction as devices start sharing them —
    the round-2 0.226@8dev number measured exactly this artifact. Pinning
    each point to one core per device makes the points comparable: the
    honest virtual-mesh analogue of one chip per sequence.

    cores_per_device (r5 attribution, VERDICT r4 #3): at 1 core/device the
    in-process fleet loses ~30-40% (0.706 eff at n=2, WORSE for compute-
    light frames — i.e. fixed runtime overhead + thread starvation, not
    compute contention: the XLA:CPU runtime runs ~2 runnable host threads
    per virtual device, so cores == devices timeslices them against each
    other). At 2 cores/device the same fleet reaches 0.939 at n=2 —
    the loss is a virtual-mesh artifact, not the fleet path. Falsify on
    real hardware with: python -m rivslam_tpu.eval.scaling on an N-chip
    slice, comparing fleet per-chip fps at N chips vs 1."""
    import subprocess
    import sys

    use_cores = min(n * cores_per_device, cores)
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = flags + f" --xla_force_host_platform_device_count={n}"
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        "taskset", "-c", ",".join(str(c) for c in range(use_cores)),
        sys.executable, "-m", "rivslam_tpu.eval.scaling",
        "--fleet-probe", str(n), "--frames", str(frames),
        "--capacity", str(capacity), "--repeats", str(repeats),
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=900)
    if r.returncode != 0:
        print(f"fleet probe n={n} failed: {r.stderr[-400:]}")
        return None
    row = json.loads(r.stdout.strip().splitlines()[-1])
    row["pinned_cores"] = use_cores
    row["oversubscribed"] = n > cores
    return row


def _fleet_processes(n: int, cores: int, frames: int, capacity: int,
                     repeats: int) -> dict | None:
    """n CONCURRENT single-device engine processes, one pinned core each —
    the process-isolated fleet, i.e. the virtual-mesh analogue of one
    host/chip per sequence (and of production multi-host batch processing,
    where independent sequences never share a runtime).

    Diagnostic value (VERDICT r2 weak #2): the in-process virtual-mesh fleet
    (_fleet_pinned) routes every virtual device through ONE shared XLA CPU
    runtime, whose dispatch serialization costs ~3x at 4 devices on this box
    — an artifact real per-chip runtimes don't have. Measured side by side,
    the pair separates that runtime-sharing loss from true per-core compute
    scaling."""
    import subprocess
    import sys

    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    for i in range(n):
        cmd = [
            "taskset", "-c", str(i % cores),
            sys.executable, "-m", "rivslam_tpu.eval.scaling",
            "--fleet-probe", "1", "--frames", str(frames),
            "--capacity", str(capacity), "--repeats", str(repeats),
        ]
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env,
        ))
    rows = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            return None
        if p.returncode != 0:
            print(f"process-fleet member failed: {stderr[-300:]}")
            return None
        rows.append(json.loads(stdout.strip().splitlines()[-1]))
    return {
        "processes": n,
        "aggregate_fps": round(sum(r["aggregate_fps"] for r in rows), 1),
        "per_process_fps": [r["aggregate_fps"] for r in rows],
        "oversubscribed": n > cores,
    }


def run_scaling(
    device_counts,
    frames: int = 40,
    capacity: int = 512,
    graph_k: int = 512,
    repeats: int = 3,
    gn_iters: int = 6,
    imu_capacity: int = 16,
    pin_fleet: bool = True,
    fleet_cores_per_device: int = 1,
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

    # collective-cost microbenchmark payloads (comm vs compute decomposition):
    # the block-Schur reduced system is the largest per-iteration collective
    ncores = os.cpu_count() or 1
    pinned = (
        pin_fleet
        and devs[0].platform == "cpu"
        and os.path.exists("/usr/bin/taskset")
    )
    out["fleet_pinned_per_core"] = pinned

    results = []
    fleet_base = None
    procfleet_base = None
    for n in device_counts:
        row: dict = {"devices": n}

        # 1) fleet replay weak scaling: n sequences over a data mesh.
        # On the virtual mesh each point runs in a subprocess pinned to
        # min(n, cores) cores — one core per device — because an unpinned
        # n=1 baseline spreads over every core and the efficiency ratio
        # then measures core sharing, not the fleet path (see _fleet_pinned)
        if pinned:
            fl = _fleet_pinned(n, ncores, frames, capacity, imu_capacity,
                               repeats, fleet_cores_per_device)
        else:
            fl = None
        if fl is None:
            fleet_mesh = Mesh(np.asarray(devs[:n]), axis_names=("data",))
            batch = {
                k: np.stack([st[k] for st in stacked[:n]]) for k in stacked[0]
            }
            eng = pipeline.Engine(EngineConfig(registration=reg_cfg), seed=0)
            eng.replay_fleet(batch, mesh=fleet_mesh, axis="data")  # warm
            t_fleet = _min_time(
                lambda: eng.replay_fleet(batch, mesh=fleet_mesh, axis="data"),
                repeats,
            )
            fl = {
                "sequences": n,
                "aggregate_fps": round(n * frames / t_fleet, 1),
                "ms_per_frame_per_seq": round(1e3 * t_fleet / frames, 3),
            }
        if fleet_base is None:
            fleet_base = fl["aggregate_fps"]
        fl["weak_scaling_efficiency"] = round(
            fl["aggregate_fps"] / (fleet_base * n), 3
        )
        row["fleet"] = fl

        # 1a) process-isolated fleet: n single-device engines, one core
        # each — separates shared-runtime dispatch serialization (an
        # in-process virtual-mesh artifact) from true per-core scaling
        if pinned:
            pf = _fleet_processes(n, ncores, frames, capacity, repeats)
            if pf is not None:
                if procfleet_base is None:
                    procfleet_base = pf["aggregate_fps"] / n
                pf["weak_scaling_efficiency"] = round(
                    pf["aggregate_fps"] / (procfleet_base * n), 3
                )
                row["process_fleet"] = pf

        # 1b) collective cost at this device count: one psum of the block-
        # Schur reduced system (the dominant per-iteration collective) and
        # one of the registration H/b — comm-vs-compute decomposition for
        # the dist rows below (comm_estimate = psum_ms x iterations)
        if n > 1:
            from functools import partial as _partial

            from jax.sharding import PartitionSpec as _P

            m_c = mesh_mod.make_mesh(1, n)
            L_slots = int(g.loop_i.shape[0])
            nb_c = min(
                (
                    b
                    for b in range(1, min(4 * sblocks, graph_k) + 1)
                    if graph_k % b == 0 and b % n == 0
                ),
                key=lambda b: abs(b - sblocks),
                default=sblocks,
            )
            pdim = 6 * (2 * nb_c + 2 * L_slots + 1)

            @jax.jit
            @_partial(
                jax.shard_map, mesh=m_c, in_specs=_P("model"),
                out_specs=_P(), check_vma=False,
            )
            def _psum_payload(x):
                return jax.lax.psum(jnp.sum(x, axis=0), "model")

            payload = jnp.zeros((n, pdim, pdim + 1), jnp.float32)
            _psum_payload(payload).block_until_ready()
            t_psum = _min_time(
                lambda: _psum_payload(payload).block_until_ready(), repeats
            )
            row["collective"] = {
                "schur_reduced_psum_ms": round(1e3 * t_psum, 3),
                "payload_mb": round(pdim * (pdim + 1) * 4 / 1e6, 3),
                "per_solve_comm_estimate_ms": round(1e3 * t_psum * gn_iters, 2),
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

        # valid submap count: divisor of graph_k that is a multiple of n,
        # preferring the one closest to the local baseline's sblocks so the
        # speedup ratio compares like partitions (ADVICE r2: the old
        # (sblocks//n)*n fallback yielded 0 or non-divisors for non-dividing
        # counts and silently skipped the measurement)
        nb = min(
            (
                b
                for b in range(1, min(4 * sblocks, graph_k) + 1)
                if graph_k % b == 0 and b % n == 0
            ),
            key=lambda b: abs(b - sblocks),
            default=None,
        )
        if nb is not None:
            row["schur_phases"] = _schur_phase_probe(g, nb, n, gn_iters, repeats)
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
            # equivalence is asserted at solution quality AT CONVERGENCE
            # (12+ dogleg iterations): the trust-region trajectory is
            # chaotic in f32 mid-descent — a last-bit fusion-order
            # difference flips an accept decision and the two paths walk
            # different gauge-sloppy routes through the same basin (see
            # tests/test_block_schur.py::test_capacity_scale_f32_sharded_
            # equivalence) — so comparing at the timing iteration count
            # scores descent chaos, not solver correctness. The bound:
            # both reduce chi2 >99% and agree to 5e-3 of the initial
            # objective.
            conv_iters = max(gn_iters, 12)
            _, chi2_s_c = block_schur.solve_pose_graph_schur_sharded(
                g, m, num_blocks=nb, gn_iters=conv_iters
            )
            _, chi2_l_c = block_schur.solve_pose_graph_schur(
                g, num_blocks=nb, gn_iters=conv_iters
            )
            row["dist_schur"] = {
                "ms": round(1e3 * t_sch, 2),
                "blocks": nb,
                "speedup_vs_local": round(t_schur_local / t_sch, 2),
                "chi2_at_convergence": round(float(chi2_s_c), 4),
                "chi2_local_at_convergence": round(float(chi2_l_c), 4),
                "convergence_iters": conv_iters,
                "chi2_rel_reduction": round(
                    1 - float(chi2_s_c) / chi2_init0, 6
                ),
                "chi2_matches_local": bool(
                    abs(float(chi2_s_c) - float(chi2_l_c)) <= 5e-3 * chi2_init0
                    and float(chi2_s_c) < 1e-2 * chi2_init0
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
    ap.add_argument("--no-pin", action="store_true",
                    help="disable per-core pinning of virtual-mesh fleet "
                    "points (see _fleet_pinned)")
    ap.add_argument("--fleet-cores-per-device", type=int, default=1,
                    help="host cores pinned per virtual device for the "
                    "in-process fleet points (2 isolates the XLA:CPU "
                    "thread-starvation artifact — see _fleet_pinned)")
    ap.add_argument("--fleet-probe", type=int, default=0, metavar="N",
                    help=argparse.SUPPRESS)  # internal: pinned subprocess
    args = ap.parse_args(argv)

    if args.fleet_probe:
        row = _fleet_probe(
            args.fleet_probe, args.frames, args.capacity, 16, args.repeats
        )
        print(json.dumps(row))
        return 0

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
        pin_fleet=not args.no_pin,
        fleet_cores_per_device=args.fleet_cores_per_device,
    )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 1 if out.get("chi2_mismatches") else 0


if __name__ == "__main__":
    raise SystemExit(main())
