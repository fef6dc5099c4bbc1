"""Device-resident sequential replay matches the host-driven odometry loop."""

import jax
import jax.numpy as jnp
import numpy as np

from rivslam_tpu.core.config import OdometryConfig, RegistrationConfig
from rivslam_tpu.frontend import apdgicp, odometry, replay_device
from rivslam_tpu.io import synthetic

REG = RegistrationConfig(method="FAST_GICP", transformation_epsilon=5e-4)
ODO = OdometryConfig(use_ego_vel=True)


def test_scan_replay_matches_host_loop():
    rng = np.random.default_rng(7)
    world = synthetic.make_world(rng, n_points=8000)
    n = 8
    times, poses, vels = synthetic.circular_trajectory(n, radius=10.0, dt=0.25, omega=0.3)
    clouds = [
        synthetic.observe(world, poses[i], rng, capacity=384, noise=0.01,
                          sensor_vel_world=vels[i], dtype=jnp.float64)
        for i in range(n)
    ]
    xyz = jnp.stack([c.xyz for c in clouds])
    mask = jnp.stack([c.mask for c in clouds])
    ego = jnp.stack([jnp.asarray(poses[i][:3, :3].T @ vels[i]) for i in range(n)])
    ts = jnp.asarray(times)

    dev_poses, kf, conv = jax.jit(
        lambda a, b, c, d: replay_device.replay_odometry(a, b, c, d, ODO, REG)
    )(xyz, mask, ego, ts)

    # host loop
    st = odometry.init_state(apdgicp.prepare(xyz[0], mask[0], REG), times[0], dtype=jnp.float64)
    host = [np.eye(4)]
    for i in range(1, n):
        st, out = odometry.step(st, apdgicp.prepare(xyz[i], mask[i], REG), ego[i], ts[i], ODO, REG)
        host.append(np.asarray(out.odom))
    np.testing.assert_allclose(np.asarray(dev_poses), np.stack(host), atol=1e-8)
