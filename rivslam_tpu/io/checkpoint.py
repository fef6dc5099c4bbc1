"""Checkpoint / resume — DumpGraph/LoadGraph service parity.

The reference serializes the g2o text graph + per-keyframe directories
(data file + cloud.pcd) + robust-kernel sidecar (radar_graph_slam_nodelet
:1078-1231, keyframe.cpp:22-146, robust_kernel_io.cpp). Here the whole
engine session state is pytrees of arrays, so a checkpoint is one npz per
component + a JSON manifest — same resume-and-continue semantics, loadable
into a fresh Engine.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _save_pytree(path: str, tree) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    np.savez(path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def _load_pytree(path: str, template):
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    new_leaves = [
        jnp.asarray(data[f"leaf_{i}"], dtype=leaves[i].dtype) for i in range(len(leaves))
    ]
    return jax.tree.unflatten(treedef, new_leaves)


def dump(engine, directory: str) -> None:
    """Serialize an Engine session (DumpGraph analogue)."""
    os.makedirs(directory, exist_ok=True)
    st = engine.state
    manifest = {
        "version": 1,
        "frame_idx": st.frame_idx,
        "kf_count": st.kf_count,
        "last_loop_accum": st.last_loop_accum,
        "kf_stamps": list(map(float, st.kf_stamps)),
        "kf_accum": list(map(float, st.kf_accum)),
        # nan (absent baro) is not valid JSON — encode as None
        "kf_alt": [None if np.isnan(a) else float(a) for a in st.kf_alt],
        # SaveMap/dump zero_utm sidecar parity (nodelet:1219-1221)
        "zero_utm": None if st.zero_utm is None else list(map(float, st.zero_utm)),
        "baro_zero": None if st.baro_zero is None else float(st.baro_zero),
        "gps_kf_since_solve": st.gps_kf_since_solve,
        "n_traj": len(st.trajectory),
        "has_odo": st.odo is not None,
        "has_backend": st.backend is not None,
        "has_graph": st.graph is not None,
        "has_prev_loop": st.prev_loop is not None,
    }
    with open(os.path.join(directory, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    if st.odo is not None:
        _save_pytree(os.path.join(directory, "odometry.npz"), st.odo)
    if st.backend is not None:
        _save_pytree(os.path.join(directory, "backend.npz"), st.backend)
    if st.graph is not None:
        _save_pytree(os.path.join(directory, "graph.npz"), st.graph)
        _save_pytree(os.path.join(directory, "scdb.npz"), st.scdb)
        # interop sidecar: the same graph as standard g2o text (+ robust
        # kernel file), loadable by external g2o tooling — the reference's
        # DumpGraph output format (graph_slam.cpp:512-538)
        from rivslam_tpu.io import g2o_io

        g2o_io.export_g2o(st.graph, os.path.join(directory, "graph.g2o"))
    if st.kf_clouds:
        np.savez(
            os.path.join(directory, "keyframes.npz"),
            xyz=np.stack([np.asarray(x) for x, _ in st.kf_clouds]),
            mask=np.stack([np.asarray(m) for _, m in st.kf_clouds]),
            odom=np.stack([np.asarray(T) for T in st.kf_odom]),
        )
    if st.trajectory:
        np.savez(
            os.path.join(directory, "trajectory.npz"),
            t=np.asarray([t for t, _ in st.trajectory]),
            poses=np.stack([T for _, T in st.trajectory]),
        )
    if st.prev_loop is not None:
        np.savez(
            os.path.join(directory, "prev_loop.npz"),
            odom_i=np.asarray(st.prev_loop["odom_i"]),
            odom_j=np.asarray(st.prev_loop["odom_j"]),
            T_lc=np.asarray(st.prev_loop["T_lc"]),
        )


def load(engine, directory: str) -> None:
    """Restore a dumped session into an Engine (LoadGraph analogue).

    The engine must be constructed with the same config/dtype; templates for
    unflattening come from freshly-initialized states.
    """
    from rivslam_tpu.backend import slam
    from rivslam_tpu.frontend import apdgicp, odometry
    from rivslam_tpu.loop import global_graph, scancontext

    with open(os.path.join(directory, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest.get("version") != 1:
        raise ValueError(
            f"unsupported checkpoint version {manifest.get('version')!r}"
        )
    st = engine.state
    st.frame_idx = manifest["frame_idx"]
    st.kf_count = manifest["kf_count"]
    st.last_loop_accum = manifest["last_loop_accum"]
    st.kf_stamps = manifest["kf_stamps"]
    st.kf_accum = manifest["kf_accum"]
    # absent in pre-GPS manifests (golden ckpt_v1): default baro to nan,
    # UTM origin to unset
    st.kf_alt = [
        float("nan") if a is None else float(a)
        for a in manifest.get("kf_alt", [None] * st.kf_count)
    ]
    zu = manifest.get("zero_utm")
    st.zero_utm = None if zu is None else np.asarray(zu, np.float64)
    st.baro_zero = manifest.get("baro_zero")
    st.gps_kf_since_solve = manifest.get("gps_kf_since_solve", 0)
    c = engine.cfg
    dtype = engine.dtype

    if manifest["has_odo"]:
        data = np.load(os.path.join(directory, "odometry.npz"))
        cap = data["leaf_0"].shape[0]  # leaf_0 = target.xyz [N,3]
        template = odometry.init_state(
            apdgicp.PreparedCloud(
                xyz=jnp.zeros((cap, 3), dtype=dtype),
                mask=jnp.zeros(cap, dtype=bool),
                cov=jnp.zeros((cap, 3, 3), dtype=dtype),
            ),
            0.0,
            dtype=dtype,
        )
        st.odo = _load_pytree(os.path.join(directory, "odometry.npz"), template)
    if manifest["has_backend"]:
        data = np.load(os.path.join(directory, "backend.npz"))
        # cloud capacity from the stored xyz leaf
        probe = slam.init_state(c.backend, c.imu, cloud_capacity=8, dtype=dtype)
        leaves, treedef = jax.tree.flatten(probe)
        new_leaves = [
            jnp.asarray(data[f"leaf_{i}"], dtype=leaves[i].dtype)
            for i in range(len(leaves))
        ]
        st.backend = jax.tree.unflatten(treedef, new_leaves)
    if manifest["has_graph"]:
        gt = global_graph.PoseGraph.create(
            c.loop.keyframe_capacity, c.loop.loop_capacity, dtype=dtype
        )
        st.graph = _load_pytree(os.path.join(directory, "graph.npz"), gt)
        dbt = scancontext.ScanContextDB.create(c.loop, dtype=dtype)
        st.scdb = _load_pytree(os.path.join(directory, "scdb.npz"), dbt)
    kf_path = os.path.join(directory, "keyframes.npz")
    if os.path.exists(kf_path):
        data = np.load(kf_path)
        st.kf_clouds = [
            (jnp.asarray(data["xyz"][i], dtype=dtype), jnp.asarray(data["mask"][i]))
            for i in range(data["xyz"].shape[0])
        ]
        st.kf_odom = [jnp.asarray(T, dtype=dtype) for T in data["odom"]]
    traj_path = os.path.join(directory, "trajectory.npz")
    if os.path.exists(traj_path):
        data = np.load(traj_path)
        st.trajectory = [(float(t), P) for t, P in zip(data["t"], data["poses"])]
    pl_path = os.path.join(directory, "prev_loop.npz")
    if os.path.exists(pl_path):
        data = np.load(pl_path)
        st.prev_loop = {
            "odom_i": jnp.asarray(data["odom_i"], dtype=dtype),
            "odom_j": jnp.asarray(data["odom_j"], dtype=dtype),
            "T_lc": jnp.asarray(data["T_lc"], dtype=dtype),
        }
