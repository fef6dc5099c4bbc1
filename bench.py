"""Headline benchmark: APDGICP scan-matching throughput per chip.

Prints ONE JSON line:
  {"metric": "apdgicp_scan_match", "value": <frames/s>, "unit": "frames/s",
   "vs_baseline": <ratio>}

Protocol: batched full scan-matching steps (covariance estimation + NN
correspondences + LM to convergence) on synthetic radar-scale clouds
(N=1024 points — the post-filter density regime of NTU4DRadLM, see
SURVEY.md §7). To measure device-resident throughput independent of the
host/tunnel dispatch latency, ROUNDS successive batched registrations are
chained inside one jitted `lax.scan` (each round's input is perturbed by the
previous round's output, forcing true serialization on device), and the
whole dispatch is timed synchronously.

Baseline: the reference publishes no numbers (BASELINE.md). Its own timing
instrumentation (scan_matching_odometry_nodelet.cpp:467-471) with OpenMP
FastAPDGICP runs a scan match in ~30 ms at this point count on a desktop
CPU (align.cpp microbenchmark regime), i.e. ~33 frames/s. vs_baseline is
measured frames/s over that 33 fps estimate; BASELINE.json targets >= 10x.
"""

import json
import time

import numpy as np

BASELINE_FPS = 33.0
BATCH = 256
ROUNDS = 4
CAPACITY = 1024


def main():
    import jax
    import jax.numpy as jnp

    from rivslam_tpu.core.config import RegistrationConfig
    from rivslam_tpu.frontend import apdgicp
    from rivslam_tpu.io import synthetic

    import os

    cfg = RegistrationConfig(
        optimizer=os.environ.get("RIVSLAM_BENCH_OPT", "LM"),
    )  # launch-file runtime params (eps=0.1 etc.)

    rng = np.random.default_rng(0)
    world = synthetic.make_world(rng, n_points=20000)
    srcs, tgts = [], []
    T0 = np.eye(4)
    T0[:3, 3] = [0.0, 0.0, 2.0]
    for _ in range(BATCH):
        T1 = T0.copy()
        # guess-error regime of the real pipeline (const-velocity prior)
        T1[:3, 3] += rng.normal(size=3) * np.array([0.1, 0.1, 0.02])
        tgts.append(synthetic.observe(world, T0, rng, capacity=CAPACITY, noise=0.01))
        srcs.append(synthetic.observe(world, T1, rng, capacity=CAPACITY, noise=0.01))
    stack = lambda clouds, f: jnp.stack([getattr(c, f) for c in clouds])
    src_xyz, src_mask = stack(srcs, "xyz"), stack(srcs, "mask")
    tgt_xyz, tgt_mask = stack(tgts, "xyz"), stack(tgts, "mask")
    guess = jnp.stack([jnp.eye(4, dtype=jnp.float32)] * BATCH)

    @jax.jit
    def chained(sx, sm, tx, tm, g):
        # target covariances are estimated ONCE and cached across frames,
        # exactly like the pipeline (the keyframe's PreparedCloud is reused
        # until swapped, odometry.py); per-frame work = source covariance
        # estimation + LM registration.
        tgt = jax.vmap(lambda a, b: apdgicp.prepare(a, b, cfg))(tx, tm)

        def body(carry, _):
            eps = carry
            src = jax.vmap(lambda a, b: apdgicp.prepare(a, b, cfg))(sx + eps, sm)
            res = jax.vmap(
                lambda a, b, c: apdgicp.register_dispatch(a, b, c, cfg)
            )(src, tgt, g)
            # next round's input depends on this round's output: serialized
            return jnp.sum(res.error) * 1e-12 + eps + 1e-6, (res.converged, res.T)

        eps0 = jnp.asarray(0.0, jnp.float32)
        _, (conv, Ts) = jax.lax.scan(body, eps0, None, length=ROUNDS)
        return conv, Ts

    conv, Ts = chained(src_xyz, src_mask, tgt_xyz, tgt_mask, guess)  # compile
    jax.block_until_ready((conv, Ts))

    times = []
    for i in range(3):
        sx = src_xyz + np.float32((i + 1) * 1e-5)
        t0 = time.perf_counter()
        conv, Ts = chained(sx, src_mask, tgt_xyz, tgt_mask, guess)
        np.asarray(Ts)  # host fetch — the only reliable completion barrier
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    fps = BATCH * ROUNDS / dt
    print(
        json.dumps(
            {
                "metric": "apdgicp_scan_match",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
