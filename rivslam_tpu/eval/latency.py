"""Sequential-latency harness: the device-replay real-time-factor numbers.

    python -m rivslam_tpu.eval.latency [--frames 200] [--capacity 1024]
        [--optimizer LM|GN] [--fleet B] [--json OUT]

Times `Engine.replay_sequence` (full pipeline: preprocess -> REVE -> floor
-> odometry -> window backend, ONE lax.scan dispatch) on a radar-realistic
synthetic course: compile once, then report steady-state ms/frame over
repeated dispatches. With --fleet B it also times `Engine.replay_fleet`
(B sequences vmapped in one dispatch) and reports per-sequence throughput
scaling. Run on the TPU for the BENCHMARKS.md numbers; runs anywhere.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--capacity", type=int, default=1024)
    ap.add_argument("--imu-capacity", type=int, default=32)
    ap.add_argument("--optimizer", default="LM", choices=["LM", "GN"])
    ap.add_argument("--fleet", type=int, default=0, metavar="B",
                    help="also time a B-sequence fleet replay")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

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
        "compile_s": round(compile_s, 2),
        "ms_per_frame": round(ms_frame, 3),
        "frames_per_s": round(args.frames / dt, 1),
        "real_time_factor_10hz": round(100.0 / ms_frame, 1),
        "mean_solver_iterations": round(float(rep["solver_iterations"][1:].mean()), 2),
    }
    print(json.dumps(out))

    if args.fleet:
        B = args.fleet
        batch = {k: np.stack([v] * B) for k, v in stacked.items()}
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
