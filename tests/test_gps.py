"""GPS/UTM ingest end-to-end (VERDICT round-1 item #6).

Covers: WGS-84 -> UTM conversion (io/geo.py, the geodesy::fromMsg role),
NavSatFix parsing + covariance gating in the bag converter (the
gps_traj_align.cpp:104,158-170 protocol), per-keyframe UTM priors in the
engine's global graph (keyframe.hpp:52 utm_coord + EdgeSE3PriorXYZ), the
zero_utm origin (radar_graph_slam_nodelet.cpp:1453), SaveMap's UTM sidecar
(nodelet:1252-1263), and the headline behavior: GPS priors bound odometry
drift on a synthetic drifting course.
"""

import struct

import numpy as np
import jax.numpy as jnp

from rivslam_tpu import pipeline
from rivslam_tpu.backend import map as map_mod
from rivslam_tpu.core.config import (
    EngineConfig, GpsConfig, LoopConfig, PreprocessConfig, RegistrationConfig,
)
from rivslam_tpu.io import checkpoint, datasets, geo, rosbag1, synthetic

from test_datasets import make_sequence
from test_rosbag1 import _ros_header, make_messages, write_bag


# ---------------------------------------------------------------------------
# UTM conversion
# ---------------------------------------------------------------------------


def test_utm_known_point():
    # CN Tower, a standard published UTM test vector: 17N 630084 E 4833439 N
    e, n, z = geo.latlon_to_utm(43.642566, -79.387139)
    assert z == 17
    assert abs(e - 630084.3) < 1.0
    assert abs(n - 4833438.5) < 1.0


def test_utm_southern_hemisphere_false_northing():
    _, n, _ = geo.latlon_to_utm(-33.8568, 151.2153)
    assert 0 < n < 10_000_000  # false northing applied


def test_utm_local_metric_consistency():
    """Small lat/lon displacements map to metric displacements (NTU campus,
    zone 48 — the NTU4DRadLM region)."""
    lat0, lon0 = 1.3483, 103.6831
    e0, n0, z = geo.latlon_to_utm(lat0, lon0)
    assert z == 48
    # 1e-4 deg latitude ~ 11.057 m north; longitude scaled by cos(lat)
    e1, n1, _ = geo.latlon_to_utm(lat0 + 1e-4, lon0, zone=z)
    assert abs((n1 - n0) - 11.057) < 0.05
    e2, n2, _ = geo.latlon_to_utm(lat0, lon0 + 1e-4, zone=z)
    assert abs((e2 - e0) - 11.13 * np.cos(np.radians(lat0))) < 0.05


def test_utm_zone_pinning():
    """All fixes of one run must share the first fix's zone even across a
    boundary, so relative coordinates stay consistent."""
    lats = np.array([1.0, 1.0])
    lons = np.array([107.9, 108.1])  # straddles the 48/49 boundary
    e, n, zz = geo.latlon_to_utm(lats, lons)
    assert zz[0] == zz[1] == 48
    # ~0.2 deg apart -> ~22 km, continuous across the boundary
    assert 20_000 < abs(e[1] - e[0]) < 25_000


# ---------------------------------------------------------------------------
# NavSatFix parsing + bag conversion
# ---------------------------------------------------------------------------


def ser_navsatfix(stamp, lat, lon, alt, cov_diag=(0.5, 0.5, 1.0), status=0,
                  cov_type=2):
    b = _ros_header(stamp, "gps")
    b += struct.pack("<b", status)  # status.status (0 = STATUS_FIX)
    b += struct.pack("<H", 1)  # status.service (GPS)
    b += struct.pack("<3d", lat, lon, alt)
    cov = np.zeros(9)
    cov[0], cov[4], cov[8] = cov_diag
    b += struct.pack("<9d", *cov)
    b += struct.pack("<B", cov_type)  # 2 = DIAGONAL_KNOWN, 0 = UNKNOWN
    return b


def test_parse_navsatfix():
    body = ser_navsatfix(100.5, 1.3483, 103.6831, 32.0, (0.25, 0.3, 2.0))
    m = rosbag1.parse_navsatfix(body)
    assert abs(m["header"]["stamp"].to_sec() - 100.5) < 1e-6
    assert m["latitude"] == 1.3483 and m["longitude"] == 103.6831
    assert m["altitude"] == 32.0
    np.testing.assert_allclose(
        m["position_covariance"][[0, 4, 8]], [0.25, 0.3, 2.0]
    )
    assert m["position_covariance_type"] == 2


def test_convert_bag_with_gps(tmp_path, rng):
    msgs = make_messages(rng)
    lat0, lon0 = 1.3483, 103.6831
    for i in range(3):
        t = 100.0 + i * 0.1
        msgs.append(("/ublox/fix", "sensor_msgs/NavSatFix", t,
                     ser_navsatfix(t, lat0 + 1e-5 * i, lon0, 30.0 + i)))
    # a fix failing the covariance gate (gps_traj_align.cpp:158: cov_xx > 3)
    msgs.append(("/ublox/fix", "sensor_msgs/NavSatFix", 100.35,
                 ser_navsatfix(100.35, lat0, lon0, 30.0, (9.0, 9.0, 9.0))))
    path = str(tmp_path / "gps.bag")
    write_bag(path, msgs)
    out = str(tmp_path / "seq.npz")
    seq = rosbag1.convert_bag(path, out)
    assert seq.gps_stamps is not None and len(seq.gps_stamps) == 3  # gated
    assert seq.gps_utm.shape == (3, 3)
    # ~1.1057 m northing per 1e-5 deg latitude
    assert abs((seq.gps_utm[1, 1] - seq.gps_utm[0, 1]) - 1.1057) < 0.01
    np.testing.assert_allclose(seq.gps_utm[:, 2], [30.0, 31.0, 32.0])
    # survives save/load
    seq2 = datasets.RadarSequence.load(out)
    np.testing.assert_allclose(seq2.gps_utm, seq.gps_utm)
    utm, cov = seq2.gps_at(100.1)
    assert utm is not None and cov is not None
    assert seq2.gps_at(99.0) == (None, None)


def test_convert_bag_gps_quality_gates(tmp_path, rng):
    """No-fix, NaN-coordinate, and unknown-covariance NavSatFix handling:
    the first two are dropped (a NaN lat/lon would poison zero_utm and
    every rel_utm after it; all-zero 'unknown' covariance would read as a
    maximal-strength prior), the third is kept with NaN covariance so the
    engine falls back to GpsConfig.stddev_xy/_z."""
    msgs = make_messages(rng)
    lat0, lon0 = 1.3483, 103.6831
    # STATUS_NO_FIX at startup (common for cold GPS drivers): dropped
    msgs.append(("/ublox/fix", "sensor_msgs/NavSatFix", 100.0,
                 ser_navsatfix(100.0, float("nan"), float("nan"), 0.0,
                               (0.0, 0.0, 0.0), status=-1, cov_type=0)))
    # fix with NaN coordinates but claiming STATUS_FIX: dropped
    msgs.append(("/ublox/fix", "sensor_msgs/NavSatFix", 100.1,
                 ser_navsatfix(100.1, float("nan"), lon0, 30.0)))
    # valid fix with COVARIANCE_TYPE_UNKNOWN (all-zero matrix): kept,
    # covariance marked NaN
    msgs.append(("/ublox/fix", "sensor_msgs/NavSatFix", 100.2,
                 ser_navsatfix(100.2, lat0, lon0, 30.0, (0.0, 0.0, 0.0),
                               cov_type=0)))
    # plain good fix
    msgs.append(("/ublox/fix", "sensor_msgs/NavSatFix", 100.3,
                 ser_navsatfix(100.3, lat0 + 1e-5, lon0, 31.0)))
    path = str(tmp_path / "gate.bag")
    write_bag(path, msgs)
    seq = rosbag1.convert_bag(path, str(tmp_path / "gate.npz"))
    assert len(seq.gps_stamps) == 2
    np.testing.assert_allclose(seq.gps_stamps, [100.2, 100.3])
    assert np.isfinite(seq.gps_utm).all()  # zero_utm anchored on a real fix
    assert np.isnan(seq.gps_cov[0]).all()  # UNKNOWN -> stddev fallback
    assert np.isfinite(seq.gps_cov[1]).all()


def test_engine_nan_gps_cov_falls_back_to_stddev():
    """A NaN-covariance fix (COVARIANCE_TYPE_UNKNOWN sentinel) must use the
    configured stddev prior, not 1/max(nan, eps)."""
    cfg = _gps_engine_cfg()
    eng = pipeline.Engine(cfg)
    rng_ = np.random.default_rng(5)
    world = synthetic.make_world(rng_, n_points=4000)
    for i in range(3):
        T = np.eye(4)
        T[:3, 3] = [0.4 * i, 0.0, 2.0]
        cloud = synthetic.observe(world, T, rng_, capacity=256, noise=0.01)
        eng.process_frame(
            cloud, 100.0 + 0.1 * i,
            np.zeros(4), np.zeros((4, 3)), np.zeros((4, 3)),
            np.zeros(4, np.bool_),
            gps_utm=np.array([0.4 * i, 0.0, 30.0]),
            gps_cov=np.array([np.nan, np.nan, np.nan]),
        )
    g = eng.state.graph
    k = int(np.asarray(g.gps_mask).sum())
    assert k >= 1
    info = np.asarray(g.gps_info)[np.asarray(g.gps_mask).astype(bool)]
    assert np.isfinite(info).all()
    np.testing.assert_allclose(
        info[0], [1.0 / cfg.gps.stddev_xy**2] * 2 + [1.0 / cfg.gps.stddev_z**2]
    )


# ---------------------------------------------------------------------------
# engine: GPS priors bound odometry drift
# ---------------------------------------------------------------------------


def _gps_engine_cfg(solve_interval=4):
    return EngineConfig(
        preprocess=PreprocessConfig(
            enable_dynamic_object_removal=False, outlier_removal_method="NONE",
            enable_deskew=False, raw_capacity=256, filtered_capacity=256,
        ),
        registration=RegistrationConfig(method="FAST_GICP"),
        loop=LoopConfig(enable=False, keyframe_capacity=64, loop_capacity=4),
        gps=GpsConfig(enable=True, solve_interval=solve_interval),
    )


def test_engine_gps_bounds_drift():
    """Scans are rendered from poses P_i while GPS reports a diverging path
    G_i = P_i + ramp — the observable signature of long-range odometry drift.
    With strong GPS priors the optimized keyframes must track G, not P."""
    n = 10
    seq, poses = make_sequence(n_frames=n)
    zero = np.array([355000.0, 149000.0, 30.0])  # plausible UTM origin
    drift_rate = np.array([0.35, -0.2, 0.1])
    gt_p = poses[:, :3, 3]
    gps_p = gt_p + np.arange(n)[:, None] * drift_rate[None, :]
    seq.gps_stamps = seq.frame_stamps.copy()
    seq.gps_utm = gps_p + zero[None, :]
    seq.gps_cov = np.full((n, 3), 0.01)

    eng = pipeline.Engine(_gps_engine_cfg(), dtype=jnp.float32)
    datasets.replay(eng, seq, capacity=256, imu_capacity=32)

    st = eng.state
    assert st.zero_utm is not None
    np.testing.assert_allclose(st.zero_utm, seq.gps_utm[0])
    n_kf = st.kf_count
    assert int(np.asarray(st.graph.gps_mask).sum()) == n_kf

    # GPS-implied positions relative to the graph origin: first keyframe sits
    # at the odometry origin, so targets are gps_p - gps_p[0]
    kf_idx = [int(np.argmin(np.abs(seq.frame_stamps - s))) for s in st.kf_stamps]
    target = gps_p[kf_idx] - gps_p[kf_idx[0]]
    opt = eng.optimized_keyframe_poses()[:, :3, 3]
    odom = np.stack([np.asarray(T)[:3, 3] for T in st.kf_odom])
    err_opt = np.sqrt(np.mean(np.sum((opt - target) ** 2, axis=1)))
    err_odom = np.sqrt(np.mean(np.sum((odom - target) ** 2, axis=1)))
    # raw odometry diverges from the GPS path by the injected ramp
    assert err_odom > 1.0
    # the solved graph tracks the GPS path
    assert err_opt < 0.5 * err_odom
    assert err_opt < 0.8

    # the corrected full-frame trajectory also reflects the GPS solution
    ts, corr = eng.trajectory(corrected=True)
    _, raw = eng.trajectory(corrected=False)
    assert np.linalg.norm(corr[-1][:3, 3] - raw[-1][:3, 3]) > 0.5


def test_engine_gps_checkpoint_and_map_sidecar(tmp_path):
    n = 6
    seq, poses = make_sequence(n_frames=n)
    zero = np.array([355000.0, 149000.0, 30.0])
    seq.gps_stamps = seq.frame_stamps.copy()
    seq.gps_utm = poses[:, :3, 3] + zero[None, :]
    seq.gps_cov = np.full((n, 3), 0.04)

    eng = pipeline.Engine(_gps_engine_cfg(solve_interval=0), dtype=jnp.float32)
    datasets.replay(eng, seq, capacity=256, imu_capacity=32)

    # checkpoint preserves zero_utm + kf_alt
    d = str(tmp_path / "ckpt")
    checkpoint.dump(eng, d)
    eng2 = pipeline.Engine(_gps_engine_cfg(solve_interval=0), dtype=jnp.float32)
    checkpoint.load(eng2, d)
    np.testing.assert_allclose(eng2.state.zero_utm, eng.state.zero_utm)
    assert len(eng2.state.kf_alt) == eng2.state.kf_count
    np.testing.assert_allclose(
        np.asarray(eng2.state.graph.gps_xyz), np.asarray(eng.state.graph.gps_xyz)
    )

    # SaveMap UTM offset + sidecar (nodelet:1252-1263)
    pts = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    pcd = str(tmp_path / "map.pcd")
    map_mod.save_map_pcd(pcd, pts, zero_utm=eng.state.zero_utm, apply_utm_offset=True)
    back = map_mod.load_pcd(pcd)
    np.testing.assert_allclose(back[0], pts[0] + eng.state.zero_utm, rtol=1e-6)
    with open(pcd + ".utm") as f:
        vals = [float(v) for v in f.read().split()]
    np.testing.assert_allclose(vals, eng.state.zero_utm, atol=1e-6)
