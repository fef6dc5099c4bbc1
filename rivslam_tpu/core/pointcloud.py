"""Fixed-capacity masked point clouds — the array-native replacement for
pcl::PointCloud throughout the engine.

Radar scans are small (10^2..10^4 points post-filter; cf. the per-distance
histogram machinery in reference preprocessing_nodelet.cpp:818-828), so we pad
every cloud to a static capacity and carry a validity mask. All downstream
kernels (filters, knn, APDGICP) are written against (data, mask) pairs so XLA
sees only static shapes.

Field layout parity: reference RadarPointCloudType / EaglePointXYZIVRAB /
HuginPointCloudType (include/rio_utils/radar_point_cloud.h:36-102).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RadarCloud:
    """Masked radar point cloud. Leading batch dims allowed on all fields.

    xyz:       [..., N, 3] cartesian points in sensor frame
    doppler:   [..., N]    radial (doppler) velocity, m/s, sign: + receding
    intensity: [..., N]    SNR / power (dataset dependent, 'intensity' in ref)
    mask:      [..., N]    bool validity
    """

    xyz: jax.Array
    doppler: jax.Array
    intensity: jax.Array
    mask: jax.Array

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask, axis=-1)

    def replace(self, **kw) -> "RadarCloud":
        return dataclasses.replace(self, **kw)

    def and_mask(self, keep: jax.Array) -> "RadarCloud":
        return self.replace(mask=self.mask & keep)

    @staticmethod
    def zeros(capacity: int, dtype=jnp.float32, batch: tuple = ()) -> "RadarCloud":
        return RadarCloud(
            xyz=jnp.zeros(batch + (capacity, 3), dtype=dtype),
            doppler=jnp.zeros(batch + (capacity,), dtype=dtype),
            intensity=jnp.zeros(batch + (capacity,), dtype=dtype),
            mask=jnp.zeros(batch + (capacity,), dtype=bool),
        )

    @staticmethod
    def from_numpy(
        xyz: np.ndarray,
        capacity: int,
        doppler: np.ndarray | None = None,
        intensity: np.ndarray | None = None,
        dtype=jnp.float32,
    ) -> "RadarCloud":
        """Host-side ingest: pad/truncate a variable-length scan to capacity."""
        n = min(xyz.shape[0], capacity)
        out_xyz = np.zeros((capacity, 3), dtype=np.float64)
        out_dop = np.zeros((capacity,), dtype=np.float64)
        out_int = np.zeros((capacity,), dtype=np.float64)
        out_mask = np.zeros((capacity,), dtype=bool)
        out_xyz[:n] = xyz[:n]
        if doppler is not None:
            out_dop[:n] = doppler[:n]
        if intensity is not None:
            out_int[:n] = intensity[:n]
        out_mask[:n] = True
        return RadarCloud(
            xyz=jnp.asarray(out_xyz, dtype=dtype),
            doppler=jnp.asarray(out_dop, dtype=dtype),
            intensity=jnp.asarray(out_int, dtype=dtype),
            mask=jnp.asarray(out_mask),
        )

    def to_numpy_valid(self) -> np.ndarray:
        """Host-side: extract valid xyz rows as a dense numpy array."""
        m = np.asarray(self.mask)
        return np.asarray(self.xyz)[m]


def compact(cloud: RadarCloud) -> RadarCloud:
    """Move valid points to the front (stable), keeping capacity static.

    Invalid slots are filled with a sentinel far point so masked kernels that
    forget the mask still see garbage far from the data.
    """
    order = jnp.argsort(~cloud.mask, stable=True)  # valid first
    return RadarCloud(
        xyz=jnp.take(cloud.xyz, order, axis=-2),
        doppler=jnp.take(cloud.doppler, order, axis=-1),
        intensity=jnp.take(cloud.intensity, order, axis=-1),
        mask=jnp.take(cloud.mask, order, axis=-1),
    )


SENTINEL = 1.0e6  # coordinate assigned to invalid points where useful


def masked_xyz(cloud: RadarCloud, sentinel: float = SENTINEL) -> jax.Array:
    """xyz with invalid rows pushed to a far sentinel (keeps NN searches honest)."""
    return jnp.where(cloud.mask[..., None], cloud.xyz, sentinel)
