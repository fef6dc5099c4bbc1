"""IMU preintegration (Forster-style, midpoint) as a lax.scan.

Math parity with the reference IMUPreintegrator
(src/radar_graph_slam/imu_preintegration.cpp:14-95): midpoint integration of
dR/dv/dp, bias Jacobians dR/dbg, dV/dbg, dV/dba, dP/dbg, dP/dba, 9x9
covariance propagation cov = A cov A^T + B Sigma B^T, first-order bias
correction getters, and gravity-aware predict. The per-IMU-sample C++ loop
becomes one `lax.scan` over a fixed-capacity masked sample buffer, so a whole
window of preintegrations batches with `vmap`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rivslam_tpu.core import lie
from rivslam_tpu.core.navstate import GRAVITY, NavState


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Preintegration:
    """Integrated IMU delta between two frames (+ bias Jacobians, covariance).

    All fields optionally carry leading batch dims (window stacking).
    """

    dt: jax.Array  # [] total integration time
    dR: jax.Array  # [3,3]
    dv: jax.Array  # [3]
    dp: jax.Array  # [3]
    dR_dbg: jax.Array  # [3,3]
    dV_dbg: jax.Array  # [3,3]
    dV_dba: jax.Array  # [3,3]
    dP_dbg: jax.Array  # [3,3]
    dP_dba: jax.Array  # [3,3]
    cov: jax.Array  # [9,9] order (theta, v, p) like the reference
    bg: jax.Array  # [3] reference gyro bias used during integration
    ba: jax.Array  # [3] reference accel bias

    @staticmethod
    def identity(dtype=jnp.float32) -> "Preintegration":
        z3 = jnp.zeros(3, dtype=dtype)
        z33 = jnp.zeros((3, 3), dtype=dtype)
        return Preintegration(
            dt=jnp.zeros((), dtype=dtype),
            dR=jnp.eye(3, dtype=dtype),
            dv=z3,
            dp=z3,
            dR_dbg=z33,
            dV_dbg=z33,
            dV_dba=z33,
            dP_dbg=z33,
            dP_dba=z33,
            cov=jnp.zeros((9, 9), dtype=dtype),
            bg=z3,
            ba=z3,
        )


def preintegrate(
    dts: jax.Array,  # [K] per-sample dt (seconds); masked samples ignored
    acc: jax.Array,  # [K, 3] accelerometer
    gyr: jax.Array,  # [K, 3] gyroscope
    mask: jax.Array,  # [K] valid samples
    bg: jax.Array,  # [3] gyro bias at integration start
    ba: jax.Array,  # [3] accel bias
    noise_gyro: float,
    noise_acc: float,
) -> Preintegration:
    """Integrate a masked IMU buffer. Exactly reproduces the reference's
    midpoint scheme including the first-sample `last = current` convention
    (imu_preintegration.cpp:15-18)."""
    dtype = acc.dtype
    ng2 = noise_gyro * noise_gyro
    na2 = noise_acc * noise_acc
    noise_diag = jnp.asarray([ng2, ng2, ng2, na2, na2, na2], dtype=dtype)

    init = Preintegration.identity(dtype)
    init = dataclasses.replace(init, bg=bg, ba=ba)
    # carry also tracks last (acc, gyr) and whether we've seen a sample
    carry0 = (init, acc[0] * 0, gyr[0] * 0, jnp.asarray(False))

    def step(carry, x):
        p, last_acc, last_gyr, started = carry
        dt, a, g, m = x
        last_a = jnp.where(started, last_acc, a)
        last_g = jnp.where(started, last_gyr, g)
        gyr_m = 0.5 * (last_g + g) - bg
        acc_m = 0.5 * (last_a + a) - ba

        dt2 = dt * dt
        dR = p.dR
        dp_new = p.dp + p.dv * dt + 0.5 * dR @ acc_m * dt2
        dv_new = p.dv + dR @ acc_m * dt
        acc_hat = lie.hat(acc_m)

        omega = gyr_m * dt
        rightJ = lie.so3_right_jacobian(omega)
        deltaR = lie.so3_exp(omega)

        # A (9x9), order (theta, v, p)  — imu_preintegration.cpp:25-37,63-64
        A = jnp.eye(9, dtype=dtype)
        A = A.at[0:3, 0:3].set(deltaR.T)
        A = A.at[3:6, 0:3].set(-dR @ acc_hat * dt)
        A = A.at[6:9, 0:3].set(-0.5 * dR @ acc_hat * dt2)
        A = A.at[6:9, 3:6].set(jnp.eye(3, dtype=dtype) * dt)
        B = jnp.zeros((9, 6), dtype=dtype)
        B = B.at[0:3, 0:3].set(rightJ * dt)
        B = B.at[3:6, 3:6].set(dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * dR * dt2)

        dP_dba = p.dP_dba + p.dV_dba * dt - 0.5 * dR * dt2
        dP_dbg = p.dP_dbg + p.dV_dbg * dt - 0.5 * dR @ acc_hat @ p.dR_dbg * dt2
        dV_dba = p.dV_dba - dR * dt
        dV_dbg = p.dV_dbg - dR @ acc_hat @ p.dR_dbg * dt

        cov = A @ p.cov @ A.T + (B * noise_diag[None, :]) @ B.T
        dR_new = dR @ deltaR
        dR_dbg = deltaR.T @ p.dR_dbg - rightJ * dt

        p_new = Preintegration(
            dt=p.dt + dt,
            dR=dR_new,
            dv=dv_new,
            dp=dp_new,
            dR_dbg=dR_dbg,
            dV_dbg=dV_dbg,
            dV_dba=dV_dba,
            dP_dbg=dP_dbg,
            dP_dba=dP_dba,
            cov=cov,
            bg=p.bg,
            ba=p.ba,
        )
        p_out = jax.tree.map(lambda new, old: jnp.where(m, new, old), p_new, p)
        return (p_out, jnp.where(m, a, last_a), jnp.where(m, g, last_g), started | m), None

    (out, _, _, _), _ = jax.lax.scan(step, carry0, (dts, acc, gyr, mask))
    return out


def delta_rotation(p: Preintegration, bg: jax.Array) -> jax.Array:
    """dR corrected to bias bg (imu_preintegration.cpp:74)."""
    return p.dR @ lie.so3_exp(p.dR_dbg @ (bg - p.bg))


def delta_velocity(p: Preintegration, bg: jax.Array, ba: jax.Array) -> jax.Array:
    return p.dv + p.dV_dbg @ (bg - p.bg) + p.dV_dba @ (ba - p.ba)


def delta_position(p: Preintegration, bg: jax.Array, ba: jax.Array) -> jax.Array:
    return p.dp + p.dP_dbg @ (bg - p.bg) + p.dP_dba @ (ba - p.ba)


def predict(start: NavState, p: Preintegration, gravity: float = GRAVITY) -> NavState:
    """Propagate a NavState through the preintegrated delta
    (imu_preintegration.cpp:83-95)."""
    g = jnp.asarray([0.0, 0.0, gravity], dtype=start.p.dtype)
    R = start.R @ p.dR
    v = start.R @ p.dv + start.v - g * p.dt
    pos = start.R @ p.dp + start.p + start.v * p.dt - 0.5 * g * p.dt * p.dt
    return NavState(t=start.t + p.dt, R=R, p=pos, v=v, bg=p.bg, ba=p.ba)
