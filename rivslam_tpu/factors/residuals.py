"""Residual functions for the live factor library.

Re-expression of the reference's g2o vertex/edge types (include/g2o/*.hpp,
SURVEY.md §2.2) as pure functions state -> residual. Jacobians come from
autodiff through the window retraction (solver/lm.py) — exact, and consistent
with the retraction by construction (the reference's hand-written
EdgeSE3Interial Jacobians assume a (theta, t) tangent while g2o::VertexSE3
updates with a (t, q) tangent; we do not reproduce that inconsistency).

Edges in the live pipeline (radar_graph_slam_nodelet.cpp:415-462):
EdgeGyroRW / EdgeAccRW, EdgeSE3 (relative odometry), EdgePose (unary
scan-match prior), EdgeSE3Interial (IMU preintegration), EdgeRadar3DVelocity,
EdgeSE3Plane (vs fixed plane node). Plus GPS priors (EdgeSE3PriorXY/XYZ) used
by the loop/GPS path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rivslam_tpu.core import lie
from rivslam_tpu.core.navstate import GRAVITY
from rivslam_tpu.factors import preintegration as pre


def bias_rw(b1: jax.Array, b2: jax.Array) -> jax.Array:
    """EdgeGyroRW / EdgeAccRW (g2o_types.hpp:102-161): b2 - b1."""
    return b2 - b1


def relative_se3(R1, p1, R2, p2, R_meas, p_meas) -> jax.Array:
    """EdgeSE3 with measurement T12 = T1^-1 T2:
    [log(R_meas^T R1^T R2); R1^T (p2 - p1) - p_meas]."""
    er = lie.so3_log(R_meas.T @ R1.T @ R2)
    ep = R1.T @ (p2 - p1) - p_meas
    return jnp.concatenate([er, ep])


def pose_prior(R, p, R_meas, p_meas) -> jax.Array:
    """EdgePose unary prior (g2o_types.hpp:243-296): [log(R_m^T R); p - p_m]."""
    er = lie.so3_log(R_meas.T @ R)
    ep = p - p_meas
    return jnp.concatenate([er, ep])


def imu_preintegration(
    R1, p1, v1, bg1, ba1, R2, p2, v2, p_int: pre.Preintegration, gravity: float = GRAVITY
) -> jax.Array:
    """EdgeSE3Interial (edge_se3_interial.hpp:44-68), 9-dim (er, ev, ep)."""
    g = jnp.asarray([0.0, 0.0, gravity], dtype=p1.dtype)
    dt = p_int.dt
    dR = pre.delta_rotation(p_int, bg1)
    dv = pre.delta_velocity(p_int, bg1, ba1)
    dp = pre.delta_position(p_int, bg1, ba1)
    er = lie.so3_log(dR.T @ R1.T @ R2)
    ev = R1.T @ (v2 - v1 + g * dt) - dv
    ep = R1.T @ (p2 - p1 - v1 * dt + 0.5 * g * dt * dt) - dp
    return jnp.concatenate([er, ev, ep])


def velocity_prior(v, v_meas) -> jax.Array:
    """EdgeRadar3DVelocity (edge_3d_velocity.hpp:26-54): v - v_meas (world)."""
    return v - v_meas


def transform_plane(R, p, plane_w: jax.Array) -> jax.Array:
    """World plane (n, d) with n.x + d = 0 into the sensor frame of pose
    (R, p): n_s = R^T n, d_s = d + n . p."""
    n = plane_w[:3]
    d = plane_w[3]
    n_s = R.T @ n
    return jnp.concatenate([n_s, (d + jnp.dot(n, p))[None]])


def _tangent_basis(n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Smooth orthonormal basis of the plane orthogonal to unit n (Frisvad
    construction; smooth for n_z > -1, which holds for +z-pointing floor
    normals)."""
    nx, ny, nz = n[0], n[1], n[2]
    a = -1.0 / (1.0 + jnp.maximum(nz, -1.0 + 1e-6))
    b = nx * ny * a
    t1 = jnp.stack([1.0 + nx * nx * a, b, -nx])
    t2 = jnp.stack([b, 1.0 + ny * ny * a, -ny])
    return t1, t2


def se3_plane(R, p, plane_node_w: jax.Array, plane_meas_s: jax.Array) -> jax.Array:
    """EdgeSE3Plane (edge_se3_plane.hpp:41-48): transform the (fixed) world
    plane node into the pose frame, compare against the measured local plane
    as a minimal 3-dim difference (normal deviation in the measured plane's
    tangent basis + signed distance).

    Divergence from the reference, by design: g2o's Plane3D ominus uses
    (azimuth, elevation) angles, whose derivative is singular exactly at
    vertical normals — the dominant floor case — which g2o survives only
    because EdgeSE3Plane falls back to numeric differentiation. The tangent-
    basis parameterization is first-order equivalent (up to an orthogonal
    reparam the isotropic information is invariant to) and smooth.
    """
    local = transform_plane(R, p, plane_node_w)
    n_est = local[:3] / jnp.maximum(jnp.linalg.norm(local[:3]), 1e-12)
    n_meas = plane_meas_s[:3] / jnp.maximum(jnp.linalg.norm(plane_meas_s[:3]), 1e-12)
    t1, t2 = _tangent_basis(n_meas)
    return jnp.stack(
        [jnp.dot(t1, n_est), jnp.dot(t2, n_est), local[3] - plane_meas_s[3]]
    )


def prior_xy(p, xy_meas) -> jax.Array:
    """EdgeSE3PriorXY (GPS)."""
    return p[:2] - xy_meas


def prior_xyz(p, xyz_meas) -> jax.Array:
    """EdgeSE3PriorXYZ (GPS + altitude)."""
    return p - xyz_meas


def prior_z(p, z_meas) -> jax.Array:
    """EdgeSE3PriorZ (barometer altitude anchor, edge_se3_priorz.hpp:1-76;
    EdgeSE3Z is the same residual between two poses, edge_se3_z.hpp). The
    engine applies it as a z-only row of the per-axis diagonal translation
    prior (LoopConfig.baro_z_prior) — this scalar form is the unit-testable
    equivalent."""
    return p[2:3] - z_meas


def prior_quat(R, R_meas) -> jax.Array:
    """EdgeSE3PriorQuat: orientation prior."""
    return lie.so3_log(R_meas.T @ R)


def prior_vec(R, v_dir, v_meas) -> jax.Array:
    """EdgeSE3PriorVec: direction prior (e.g. gravity in IMU frame)."""
    return R.T @ v_dir - v_meas


def prior_navstate(
    R, p, v, bg, ba, R0, p0, v0, bg0, ba0
) -> jax.Array:
    """EdgePriorPoseNavState (g2o_types.hpp:165-239), 15-dim."""
    er = lie.so3_log(R0.T @ R)
    return jnp.concatenate([er, p - p0, v - v0, bg - bg0, ba - ba0])
