"""Map cloud generation — MapCloudGenerator parity.

Reference (src/radar_graph_slam/map_cloud_generator.cpp:22-52): concatenate
keyframe clouds under their optimized poses with a <50 m range filter, then
octree occupied-voxel-center downsampling. TPU form: one batched transform
of stacked keyframe clouds + the voxel-grid machinery from ops/voxel (voxel
CENTERS, matching the octree's occupied-center semantics rather than
centroids).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MAX_KEYFRAME_RANGE = 50.0  # map_cloud_generator.cpp:25


def assemble_map(
    kf_xyz: jax.Array,  # [K, N, 3] keyframe clouds (sensor frame)
    kf_mask: jax.Array,  # [K, N]
    poses: jax.Array,  # [K, 4, 4] optimized poses
    resolution: float = 0.05,
    out_capacity: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Returns (map_xyz [V,3] voxel centers, valid [V]); V = out_capacity."""
    K, N, _ = kf_xyz.shape
    rng_ok = jnp.linalg.norm(kf_xyz, axis=-1) < MAX_KEYFRAME_RANGE
    mask = kf_mask & rng_ok
    world = jnp.einsum("kij,knj->kni", poses[:, :3, :3], kf_xyz) + poses[:, None, :3, 3]
    flat_xyz = world.reshape(K * N, 3)
    flat_mask = mask.reshape(K * N)
    if out_capacity is None:
        out_capacity = K * N
    from rivslam_tpu.core.pointcloud import RadarCloud
    from rivslam_tpu.ops import voxel

    cloud = RadarCloud(
        xyz=flat_xyz,
        doppler=jnp.zeros(K * N, dtype=flat_xyz.dtype),
        intensity=jnp.zeros(K * N, dtype=flat_xyz.dtype),
        mask=flat_mask,
    )
    ds = voxel.voxel_downsample(cloud, resolution, out_capacity)
    # occupied-voxel-CENTER semantics (octree), not centroid
    centers = (jnp.floor(ds.xyz / resolution) + 0.5) * resolution
    return jnp.where(ds.mask[:, None], centers, 0.0), ds.mask


def save_map_pcd(
    path: str, xyz: np.ndarray, zero_utm: np.ndarray | None = None,
    apply_utm_offset: bool = False,
) -> None:
    """Write an ASCII PCD (SaveMap service output format parity).

    `zero_utm` + `apply_utm_offset` mirror the SaveMap service's UTM handling
    (radar_graph_slam_nodelet.cpp:1252-1263): with req.utm and a known
    zero_utm the points are shifted into absolute UTM coordinates, and a
    `<dest>.utm` sidecar records the origin either way."""
    xyz = np.asarray(xyz, np.float64)
    if zero_utm is not None and apply_utm_offset:
        xyz = xyz + np.asarray(zero_utm, np.float64)[None, :]
    if zero_utm is not None:
        with open(path + ".utm", "w") as f:
            f.write("%.6f %.6f %.6f\n" % tuple(np.asarray(zero_utm, np.float64)))
    n = xyz.shape[0]
    with open(path, "w") as f:
        f.write(
            "# .PCD v0.7 - Point Cloud Data file format\n"
            "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
            f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA ascii\n"
        )
        for p in xyz:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")


def load_pcd(path: str) -> np.ndarray:
    """Read an ASCII xyz PCD back."""
    pts = []
    with open(path) as f:
        in_data = False
        for line in f:
            if in_data:
                pts.append([float(v) for v in line.split()[:3]])
            elif line.startswith("DATA"):
                in_data = True
    return np.asarray(pts)
