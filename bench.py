"""Headline benchmark: APDGICP scan-matching throughput per chip.

Prints ONE JSON line:
  {"metric": "apdgicp_scan_match", "value": <frames/s>, "unit": "frames/s",
   "vs_baseline": <ratio>}

Protocol: batched full scan-matching steps (covariance estimation + NN
correspondences + LM to convergence) on synthetic radar-scale clouds
(N=1024 points — the post-filter density regime of NTU4DRadLM, see
SURVEY.md §7), vmapped over a batch of independent frame pairs, timed over
repeated dispatches on one chip.

Baseline: the reference publishes no numbers (BASELINE.md). Its own timing
instrumentation (scan_matching_odometry_nodelet.cpp:467-471) on a desktop
CPU with OpenMP FastAPDGICP runs a scan match in ~30 ms at this point count
(align.cpp-style microbenchmark regime), i.e. ~33 frames/s. vs_baseline is
measured frames/s divided by that 33 fps estimate; BASELINE.json's target is
>= 10x.
"""

import json
import sys
import time

import numpy as np

BASELINE_FPS = 33.0


def main():
    import jax
    import jax.numpy as jnp

    from rivslam_tpu.core.config import RegistrationConfig
    from rivslam_tpu.frontend import apdgicp
    from rivslam_tpu.io import synthetic

    cfg = RegistrationConfig()  # launch-file runtime params (eps=0.1 etc.)
    capacity = 1024
    batch = 32

    rng = np.random.default_rng(0)
    world = synthetic.make_world(rng, n_points=20000)
    srcs, tgts, guesses = [], [], []
    T0 = np.eye(4)
    T0[:3, 3] = [0.0, 0.0, 2.0]
    for b in range(batch):
        T1 = T0.copy()
        T1[:3, 3] += rng.normal(size=3) * np.array([0.4, 0.4, 0.05])
        ang = rng.normal() * 0.03
        c, s = np.cos(ang), np.sin(ang)
        T1[:2, :2] = T1[:2, :2] @ np.array([[c, -s], [s, c]])
        tgts.append(synthetic.observe(world, T0, rng, capacity=capacity, noise=0.01))
        srcs.append(synthetic.observe(world, T1, rng, capacity=capacity, noise=0.01))
        guesses.append(np.eye(4, dtype=np.float32))
    stack = lambda clouds, f: jnp.stack([getattr(c, f) for c in clouds])
    src_xyz, src_mask = stack(srcs, "xyz"), stack(srcs, "mask")
    tgt_xyz, tgt_mask = stack(tgts, "xyz"), stack(tgts, "mask")
    guess = jnp.asarray(np.stack(guesses))

    @jax.jit
    def step(sx, sm, tx, tm, g):
        return jax.vmap(
            lambda a, b, c, d, e: apdgicp.prepare_and_register(a, b, c, d, e, cfg)
        )(sx, sm, tx, tm, g)

    # warmup / compile
    out = step(src_xyz, src_mask, tgt_xyz, tgt_mask, guess)
    out.T.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(src_xyz, src_mask, tgt_xyz, tgt_mask, guess)
    out.T.block_until_ready()
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
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
