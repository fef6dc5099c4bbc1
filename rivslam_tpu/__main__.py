"""Command-line entry point — the roslaunch/bag_player replacement.

    python -m rivslam_tpu --seq seq.npz --out traj.txt [--map map.pcd]
        [--ckpt dir] [--resume dir] [--capacity 1024] [--f64]

Replays a radar sequence (io/datasets.RadarSequence .npz, or a .rivbin
native container) through the full engine, writes the TUM trajectory
(rpg_trajectory_evaluation input), optionally the aggregated map PCD and a
checkpoint, and prints the per-stage timing table the reference exposes via
`/command "time"`.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="rivslam_tpu")
    ap.add_argument("--seq", required=True,
                    help=".npz (rivseq), .rivbin, or ROS1 .bag sequence "
                    "(bags auto-convert to .rivseq.npz next to the file)")
    ap.add_argument("--radar-topic", default="/radar_enhanced_pcl",
                    help="bag ingest: radar topic (params.yaml:4)")
    ap.add_argument("--imu-topic", default="/vectornav/imu",
                    help="bag ingest: IMU topic (params.yaml:5)")
    ap.add_argument("--baro-topic", default="/barometer")
    ap.add_argument("--gps-topic", default="/ublox/fix")
    ap.add_argument("--out", default=None, help="output TUM trajectory file "
                    "(required unless --to-rivbin/--histogram)")
    ap.add_argument("--map", default=None, help="optional output map PCD")
    ap.add_argument("--map-utm", action="store_true",
                    help="shift map points into absolute UTM using the GPS "
                         "zero_utm origin (SaveMap req.utm parity)")
    ap.add_argument("--preset", default=None,
                    help="dataset preset (ntu4dradlm|cp|nyl|garden|mine|hugin|sjtu|long)")
    ap.add_argument("--async-loop", action="store_true",
                    help="run loop detection + the global solve on a "
                    "background thread (the reference's wall-timer "
                    "architecture); corrections merge at the next frame")
    ap.add_argument("--loop-candidates", type=int, default=None,
                    help="verify top-k scan-context candidates per keyframe in one batched dispatch (default 1)")
    ap.add_argument("--histogram", action="store_true",
                    help="print per-meter point-density histogram of the sequence "
                         "(preprocessing command_callback diagnostic) and exit")
    ap.add_argument("--ckpt", default=None, help="optional checkpoint dir to dump")
    ap.add_argument("--resume", default=None, help="checkpoint dir to resume from")
    ap.add_argument("--capacity", type=int, default=1024)
    ap.add_argument("--imu-capacity", type=int, default=64)
    ap.add_argument("--f64", action="store_true", help="run in float64 (CPU debugging)")
    ap.add_argument("--method", default=None, help="override registration method")
    ap.add_argument("--cov-method", default=None, choices=("KNN", "RBF"),
                    help="covariance neighborhood method: KNN (reference "
                    "pipeline default) or RBF (GPU_RBF_KERNEL parity, "
                    "top-k-free prepare — fastest on TPU)")
    ap.add_argument("--eval-gt", default=None, help="TUM ground truth for ATE report")
    ap.add_argument("--viz", default=None, help="prefix for PLY/JSON visualization export")
    ap.add_argument("--outlier-removal", default=None,
                    help="override outlier filter: NONE|RADIUS|STATISTICAL|BILATERAL")
    ap.add_argument("--no-deskew", action="store_true")
    ap.add_argument("--no-dynamic-removal", action="store_true")
    ap.add_argument("--use-ego-vel", action="store_true",
                    help="enable the ego-velocity motion prior (enable_frontend_ego_vel)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture an xprof/TensorBoard device trace of the "
                    "replay into DIR (jax.profiler; view with xprof or "
                    "tensorboard --logdir DIR)")
    ap.add_argument("--to-rivbin", default=None, metavar="OUT",
                    help="convert the input .npz sequence to the native "
                    ".rivbin container and exit")
    ap.add_argument("--device-replay", action="store_true",
                    help="run the whole sequence as ONE on-device lax.scan "
                    "(preprocess+odometry+window backend; no loop closure) — "
                    "the sequential real-time-factor protocol")
    ap.add_argument("--compress-rivbin", action="store_true",
                    help="with --to-rivbin: write the LZ4-chunked v2 "
                    "container (decoded on the prefetch workers)")
    args = ap.parse_args(argv)
    if not args.out and not (args.to_rivbin or args.histogram):
        ap.error("--out is required unless --to-rivbin/--histogram")
    if args.device_replay and args.resume:
        ap.error("--device-replay re-runs the sequence from frame 0 and "
                 "cannot continue a --resume'd session")

    if os.environ.get("RIVSLAM_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rivslam_tpu import pipeline
    from rivslam_tpu.core.config import EngineConfig, RegistrationConfig
    from rivslam_tpu.io import checkpoint, datasets, tum

    import dataclasses

    if args.seq.endswith(".bag"):
        # ROS1 bag ingest in one command (the fire-drill path for the
        # reference datasets: params.yaml:4-5 topic layout): convert to the
        # rivseq container next to the bag, then replay that. Reconverts
        # when the bag is newer than a previous conversion.
        from rivslam_tpu.io import rosbag1

        conv = args.seq[:-4] + ".rivseq.npz"
        if (
            not os.path.exists(conv)
            or os.path.getmtime(conv) < os.path.getmtime(args.seq)
        ):
            rosbag1.convert_bag(
                args.seq, conv,
                radar_topic=args.radar_topic, imu_topic=args.imu_topic,
                baro_topic=args.baro_topic, gps_topic=args.gps_topic,
            )
            print(f"converted {args.seq} -> {conv}")
        else:
            print(f"using cached conversion {conv}")
        args.seq = conv

    if args.to_rivbin:
        from rivslam_tpu.runtime import native

        seq = datasets.RadarSequence.load(args.seq)
        native.write_rivbin(args.to_rivbin, seq, compress=args.compress_rivbin)
        v = "v2 (LZ4-chunked)" if args.compress_rivbin else "v1 (raw mmap)"
        print(f"wrote {args.to_rivbin} [{v}], {seq.num_frames} frames")
        return 0

    if args.preset:
        from rivslam_tpu import presets

        cfg = presets.get(args.preset)
    else:
        cfg = EngineConfig()
    if args.cov_method:
        cfg = dataclasses.replace(
            cfg, registration=dataclasses.replace(
                cfg.registration, covariance_method=args.cov_method
            ),
        )
    if args.method:
        cfg = dataclasses.replace(
            cfg, registration=dataclasses.replace(cfg.registration, method=args.method)
        )
    pp = cfg.preprocess
    if args.outlier_removal:
        pp = dataclasses.replace(pp, outlier_removal_method=args.outlier_removal)
    if args.no_deskew:
        pp = dataclasses.replace(pp, enable_deskew=False)
    if args.no_dynamic_removal:
        pp = dataclasses.replace(pp, enable_dynamic_object_removal=False)
    cfg = dataclasses.replace(cfg, preprocess=pp)
    if args.loop_candidates is not None:
        cfg = dataclasses.replace(
            cfg, loop=dataclasses.replace(cfg.loop, verify_candidates=args.loop_candidates)
        )
    if args.async_loop:
        cfg = dataclasses.replace(
            cfg, loop=dataclasses.replace(cfg.loop, async_loop=True)
        )
    if args.use_ego_vel:
        cfg = dataclasses.replace(
            cfg, odometry=dataclasses.replace(cfg.odometry, use_ego_vel=True)
        )
    eng = pipeline.Engine(cfg, dtype=jnp.float64 if args.f64 else jnp.float32)
    if args.resume:
        checkpoint.load(eng, args.resume)

    if args.histogram:
        import jax.numpy as _jnp

        from rivslam_tpu.core.pointcloud import RadarCloud
        from rivslam_tpu.ops import filters

        if args.seq.endswith(".rivbin"):
            from rivslam_tpu.runtime import native

            ns = native.NativeSequence(args.seq)
            n = ns.num_frames
            # slice off the fixed-capacity padding: only real targets count
            get = lambda i: ns.read_frame(
                i, max(args.capacity, ns.frame_count(i))
            )[0][: ns.frame_count(i)]
        else:
            sq = datasets.RadarSequence.load(args.seq)
            n = sq.num_frames
            get = lambda i: sq.frame(i)["xyz"]
        hist = np.zeros(100, dtype=np.int64)
        step = max(1, n // 50)
        for i in range(0, n, step):
            xyz = np.asarray(get(i), dtype=np.float64)
            cl = RadarCloud.from_numpy(xyz, max(len(xyz), args.capacity), dtype=_jnp.float64)
            hist += np.asarray(filters.distance_histogram(cl))
        total = hist.sum()
        print("# per-meter point density (sampled every", step, "frames)")
        for lo in range(0, 100, 10):
            cnt = int(hist[lo:lo+10].sum())
            bar = "#" * int(60 * cnt / max(1, hist.max() * 10))
            print(f"{lo:3d}-{lo+10:3d} m: {cnt:8d} ({100.0*cnt/max(1,total):5.1f}%) {bar}")
        print(f"total sampled points: {total}")
        return

    import contextlib

    import jax

    profile_cm = (
        jax.profiler.trace(args.profile) if args.profile
        else contextlib.nullcontext()
    )
    if args.device_replay:
        # whole-sequence device-resident scan: preprocess -> odometry ->
        # window backend for EVERY frame in ONE dispatch (no loop closure;
        # see Engine.replay_sequence). The sequential real-time-factor
        # protocol — per-frame host dispatch measures the link, not the SLAM.
        import time as _time

        if args.seq.endswith(".rivbin"):
            from rivslam_tpu.runtime import native

            ns = native.NativeSequence(args.seq)
            stacked = datasets.stack_native_sequence(
                ns, capacity=args.capacity, imu_capacity=args.imu_capacity
            )
        else:
            seq = datasets.RadarSequence.load(args.seq)
            stacked = datasets.stack_sequence(
                seq, capacity=args.capacity, imu_capacity=args.imu_capacity
            )
        with profile_cm:
            t0 = _time.perf_counter()
            rep = eng.replay_sequence(stacked)
            dt = _time.perf_counter() - t0
        F = len(stacked["stamps"])
        print(f"device replay: {F} frames in {dt:.3f} s "
              f"({F/dt:.1f} frames/s, {1e3*dt/F:.2f} ms/frame; first "
              "dispatch includes JIT compile — re-run for steady-state "
              "timing)", file=sys.stderr)
        for t, pose in zip(stacked["stamps"], rep["pose"]):
            eng.state.trajectory.append((float(t), np.asarray(pose)))
        if args.map:
            # MapCloudGenerator role from the replay outputs: keyframe-flagged
            # frames' clouds under their window-backend poses (no loop
            # correction — device replay has no loop stage)
            import jax.numpy as jnp2

            from rivslam_tpu.backend import map as map_mod

            kf = np.asarray(rep["is_keyframe"], bool)
            map_xyz, valid = map_mod.assemble_map(
                jnp2.asarray(stacked["xyz"][kf], eng.dtype),
                jnp2.asarray(stacked["mask"][kf]),
                jnp2.asarray(rep["pose"][kf], eng.dtype),
            )
            pts = np.asarray(map_xyz)[np.asarray(valid)]
            map_mod.save_map_pcd(args.map, pts, zero_utm=None,
                                 apply_utm_offset=False)
            print(f"wrote {len(pts)} map points to {args.map}")
        for flag in ("ckpt", "viz"):
            if getattr(args, flag):
                print(f"--{flag} needs keyframe state; not available under "
                      "--device-replay", file=sys.stderr)
        ts, poses = eng.trajectory()
        tum.save_tum(args.out, ts, poses)
        print(f"wrote {len(ts)} poses to {args.out}")
        if args.eval_gt:
            _eval_gt(args, ts, poses)
        return 0

    if args.seq.endswith(".rivbin"):
        from rivslam_tpu.runtime import native

        ns = native.NativeSequence(args.seq)
        loader = native.PrefetchLoader(ns, capacity=args.capacity)
        from rivslam_tpu.core.pointcloud import RadarCloud

        with profile_cm:
            while True:
                item = loader.next_aligned(args.imu_capacity)
                if item is None:
                    break
                idx, stamp, xyz, dop, inten, mask, dts, acc, gyr, m = item
                cloud = RadarCloud(
                    xyz=jnp.asarray(xyz, eng.dtype),
                    doppler=jnp.asarray(dop, eng.dtype),
                    intensity=jnp.asarray(inten, eng.dtype),
                    mask=jnp.asarray(mask),
                )
                eng.process_frame(cloud, stamp, dts, acc, gyr, m)
                if idx % 50 == 0:
                    print(f"frame {idx}/{ns.num_frames}", file=sys.stderr)
            eng.finalize()
    else:
        seq = datasets.RadarSequence.load(args.seq)
        with profile_cm:
            datasets.replay(
                eng, seq, capacity=args.capacity, imu_capacity=args.imu_capacity,
                progress=lambda i, n: (
                    print(f"frame {i}/{n}", file=sys.stderr) if i % 50 == 0 else None
                ),
            )
    if args.profile:
        print(f"xprof trace written to {args.profile}", file=sys.stderr)

    ts, poses = eng.trajectory()
    tum.save_tum(args.out, ts, poses)
    print(f"wrote {len(ts)} poses to {args.out}")

    if args.map:
        import jax.numpy as jnp2

        from rivslam_tpu.backend import map as map_mod

        st = eng.state
        if st.kf_clouds:
            kf_xyz = jnp2.stack([x for x, _ in st.kf_clouds])
            kf_mask = jnp2.stack([m for _, m in st.kf_clouds])
            kf_poses = jnp2.asarray(eng.optimized_keyframe_poses())
            map_xyz, valid = map_mod.assemble_map(kf_xyz, kf_mask, kf_poses)
            pts = np.asarray(map_xyz)[np.asarray(valid)]
            map_mod.save_map_pcd(
                args.map, pts, zero_utm=st.zero_utm,
                apply_utm_offset=args.map_utm,
            )
            print(f"wrote {len(pts)} map points to {args.map}")

    if args.ckpt:
        checkpoint.dump(eng, args.ckpt)
        print(f"checkpoint -> {args.ckpt}")

    if args.viz:
        from rivslam_tpu.eval import viz

        written = viz.export_session(eng, args.viz)
        print("viz:", ", ".join(written.values()))

    if args.eval_gt:
        _eval_gt(args, ts, poses)

    print(eng.timers.report())
    if eng.cfg.loop.enable and eng.loop_stats["detections_run"] + eng.loop_stats[
        "skipped_worker_busy"
    ] > 0:
        s = eng.loop_stats
        print(
            f"loop closure: {s['accepted']} accepted / "
            f"{s['detections_run']} detections "
            f"(no-candidate {s['no_candidate']}, verify-rejected "
            f"{s['rejected_verify']}, odom-check {s['rejected_odom_check']}, "
            f"pairwise {s['rejected_pairwise']}); "
            f"{s['skipped_worker_busy']} keyframes skipped (worker busy)"
        )
        if s["skipped_worker_busy"] > s["detections_run"]:
            print(
                "WARNING: async loop worker overran on most keyframes — "
                "loop recall is degraded; consider sync mode or a larger "
                "detection interval"
            )
    return 0


def _eval_gt(args, ts, poses) -> None:
    from rivslam_tpu.eval import ate as ate_mod
    from rivslam_tpu.io import tum
    from rivslam_tpu.tools import associate_by_stamp

    gt_ts, gt_poses = tum.load_tum(args.eval_gt)
    pairs = associate_by_stamp(ts, gt_ts, max_dt=0.05)
    if len(pairs) >= 3:
        est_p = np.stack([poses[i][:3, 3] for i, _ in pairs])
        gt_p = np.stack([gt_poses[j][:3, 3] for _, j in pairs])
        stats = ate_mod.ate(est_p, gt_p)
        print("ATE:", stats)


if __name__ == "__main__":
    raise SystemExit(main())
