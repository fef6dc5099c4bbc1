"""Sequential-latency harness: the device-replay real-time-factor numbers.

    python -m rivslam_tpu.eval.latency [--frames 200] [--capacity 1024]
        [--optimizer LM|GN] [--fleet B] [--host-ab] [--json OUT]

Times `Engine.replay_sequence` (full pipeline: preprocess -> REVE -> floor
-> odometry -> window backend, ONE lax.scan dispatch) on a radar-realistic
synthetic course: compile once, then report steady-state ms/frame over
repeated dispatches. With --fleet B it also times `Engine.replay_fleet`
(B sequences vmapped in one dispatch) and reports per-sequence throughput
scaling. Run on the TPU for the BENCHMARKS.md numbers; runs anywhere.

`--host-ab` instead measures the PER-FRAME HOST DRIVER with loop closure
active on the validation cp course, sync vs async loop worker
(LoopConfig.async_loop): per-frame wall-time percentiles + the worst frame.
Sync mode pays scan-context match + registration verify + the global graph
solve inside process_frame on keyframes; async moves them to the worker
thread (the reference's wall-timer architecture). Each mode runs twice —
first pass warms the persistent compile cache, second is measured.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def _host_ab(course: str, seed: int, json_path: str | None) -> int:
    """Per-frame host-driver latency, sync vs async loop closure."""
    import jax
    import jax.numpy as jnp

    from rivslam_tpu import pipeline
    from rivslam_tpu.core.pointcloud import RadarCloud
    from rivslam_tpu.eval import validation
    from rivslam_tpu.io import synthetic

    jax.config.update("jax_compilation_cache_dir", "/tmp/rivslam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})")
    # 3.6 laps in ONE engine session: the first lap warms every program
    # (trace + compile, including the first loop event's detection/solve
    # programs — per-session constants, not steady-state latency); stats are
    # taken over the remaining laps, where 2+ further loop events land on
    # fully warm code. One pass per mode.
    params = dict(validation.COURSES[course])
    params["n_frames"] = 3 * params["n_frames"]
    seq, _ = synthetic.simulate_sequence(seed=seed, **params)
    warm = params["n_frames"] // 3
    out: dict = {"device": dev.platform, "course": course, "frames": int(seq.num_frames)}

    for mode in ("sync", "async"):
        cfg = validation.build_course_cfg(course, "FAST_APDGICP", True)
        cfg = dataclasses.replace(
            cfg, loop=dataclasses.replace(cfg.loop, async_loop=(mode == "async"))
        )
        eng = pipeline.Engine(cfg, dtype=jnp.float32)
        frame_ms: list[float] = []
        kf_flags: list[bool] = []
        loop_flags: list[bool] = []
        prev_t = None
        for i in range(seq.num_frames):
            f = seq.frame(i)
            cloud = RadarCloud.from_numpy(
                f["xyz"], params["capacity"], doppler=f["doppler"],
                intensity=f["intensity"], dtype=eng.dtype,
            )
            t0 = prev_t if prev_t is not None else f["stamp"] - 0.1
            dts, acc, gyr, m = seq.imu_between(t0, f["stamp"], 64)
            t_start = time.perf_counter()
            o = eng.process_frame(
                cloud, f["stamp"], dts, acc, gyr, m,
                altitude=seq.baro_at(f["stamp"]),
            )
            frame_ms.append(1e3 * (time.perf_counter() - t_start))
            kf_flags.append(bool(o["is_keyframe"]))
            loop_flags.append(bool(o["loop_found"]))
            prev_t = f["stamp"]
        eng.finalize()
        n_loops = (
            int(np.asarray(eng.state.graph.loop_mask).sum())
            if eng.state.graph is not None else 0
        )
        a = np.asarray(frame_ms[warm:])
        kf = np.asarray(kf_flags[warm:])
        lf = np.asarray(loop_flags[warm:])
        n_loops_measured = int(lf.sum())
        res = {
            "median_ms": round(float(np.median(a)), 2),
            "p95_ms": round(float(np.percentile(a, 95)), 2),
            "max_ms": round(float(a.max()), 2),
            "max_keyframe_ms": round(float(a[kf].max()), 2) if kf.any() else None,
            # the stall this mode exists to remove: the frame where the loop
            # event lands (sync: detect+verify+global solve inline; async:
            # only the merge)
            "loop_event_max_ms": round(float(a[lf].max()), 2) if lf.any() else None,
            "loop_events_measured": n_loops_measured,
            "loops_closed": n_loops,
            "loop_detections_skipped": getattr(eng, "_loop_skipped", 0),
        }
        # engine stage timers: where the loop work actually ran (inline
        # "loop"/"graph_opt" vs worker-thread "*_async")
        stages = {}
        for name, s in eng.timers.summary().items():
            if name in ("frame_step", "loop", "graph_opt",
                        "loop_detect_async", "graph_opt_async"):
                stages[name] = {
                    "median_ms": round(s["median_ms"], 1),
                    "max_ms": round(s["max_ms"], 1),
                }
        res["stages"] = stages
        out[mode] = res
        print(json.dumps({mode: res}))

    if json_path:
        with open(json_path, "w") as fp:
            json.dump(out, fp, indent=1)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--capacity", type=int, default=1024)
    ap.add_argument("--imu-capacity", type=int, default=32)
    ap.add_argument("--optimizer", default="LM", choices=["LM", "GN"])
    ap.add_argument("--fleet", type=int, default=0, metavar="B",
                    help="also time a B-sequence fleet replay")
    ap.add_argument("--host-ab", action="store_true",
                    help="per-frame host driver with loop closure, "
                    "sync vs async loop worker")
    ap.add_argument("--course", default="cp")
    ap.add_argument("--seed", type=int, default=21)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the host CPU backend (the container pins a "
                    "TPU relay; host-driver latency through a ~100 ms/dispatch "
                    "tunnel measures the link, not the SLAM)")
    ap.add_argument("--cov", default="KNN", choices=("KNN", "RBF"),
                    help="covariance neighborhood method A/B "
                    "(RegistrationConfig.covariance_method)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.host_ab:
        return _host_ab(args.course, args.seed, args.json)

    import jax.numpy as jnp

    from rivslam_tpu import pipeline
    from rivslam_tpu.core.config import EngineConfig
    from rivslam_tpu.io import datasets, synthetic

    import jax

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})")

    seq, _ = synthetic.simulate_sequence(
        n_frames=args.frames, seed=11, radius=10.0, capacity=args.capacity
    )
    stacked = datasets.stack_sequence(
        seq, capacity=args.capacity, imu_capacity=args.imu_capacity
    )
    cfg = EngineConfig()
    cfg = dataclasses.replace(
        cfg, backend=dataclasses.replace(cfg.backend, optimizer=args.optimizer)
    )
    if args.cov != "KNN":
        cfg = dataclasses.replace(
            cfg, registration=dataclasses.replace(
                cfg.registration, covariance_method=args.cov
            ),
        )
    eng = pipeline.Engine(cfg, dtype=jnp.float32, seed=0)

    t0 = time.perf_counter()
    eng.replay_sequence(stacked)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        rep = eng.replay_sequence(stacked)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    ms_frame = 1e3 * dt / args.frames
    out = {
        "device": dev.platform,
        "frames": args.frames,
        "capacity": args.capacity,
        "optimizer": args.optimizer,
        "covariance_method": args.cov,
        "compile_s": round(compile_s, 2),
        "ms_per_frame": round(ms_frame, 3),
        "frames_per_s": round(args.frames / dt, 1),
        "real_time_factor_10hz": round(100.0 / ms_frame, 1),
        "mean_solver_iterations": round(float(rep["solver_iterations"][1:].mean()), 2),
    }
    print(json.dumps(out))

    if args.fleet:
        B = args.fleet
        batch = {
            k: np.stack([v] * B)
            for k, v in stacked.items()
            if not k.startswith("_")  # skip replay's device-prep cache
        }
        t0 = time.perf_counter()
        eng.replay_fleet(batch)
        fleet_compile = time.perf_counter() - t0
        ftimes = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            eng.replay_fleet(batch)
            ftimes.append(time.perf_counter() - t0)
        fdt = min(ftimes)
        fleet = {
            "fleet_B": B,
            "compile_s": round(fleet_compile, 2),
            "ms_per_frame_per_seq": round(1e3 * fdt / args.frames / B, 3),
            "aggregate_frames_per_s": round(B * args.frames / fdt, 1),
            "scaling_vs_single": round(dt * B / fdt, 2),
        }
        out["fleet"] = fleet
        print(json.dumps(fleet))

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
