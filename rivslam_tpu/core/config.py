"""Single typed configuration tree for the whole engine.

Replaces the reference's two-level rosparam system (config/params.yaml under
`radar_slam/` read by ParamServer, utility_radar.h:138-204, plus per-nodelet
<param> tags in radar_graph_slam.launch:44-195). Defaults below reproduce the
launch-file defaults verbatim so an NTU4DRadLM run is config-compatible.

Everything is a frozen dataclass of python scalars — configs are static
(hashable) and can be closed over by jitted functions without retracing
hazards.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    # distance filter (launch:52-56)
    use_distance_filter: bool = True
    distance_near_thresh: float = 2.0
    distance_far_thresh: float = 100.0
    z_low_thresh: float = -100.0
    z_high_thresh: float = 100.0
    # downsample (launch:57-59): NONE | VOXELGRID
    downsample_method: str = "VOXELGRID"
    downsample_resolution: float = 0.1
    # outlier removal (launch:60-67): NONE | RADIUS | STATISTICAL
    outlier_removal_method: str = "RADIUS"
    radius_radius: float = 0.5
    radius_min_neighbors: int = 1
    statistical_mean_k: int = 30
    statistical_stddev: float = 1.2
    bilateral_sigma_s: float = 5.0  # launch:66
    bilateral_sigma_r: float = 0.03  # launch:67
    # power filter (launch:69)
    power_threshold: float = 0.0
    enable_dynamic_object_removal: bool = True
    enable_deskew: bool = True  # reference deskews whenever IMU is available
    scan_period: float = 0.0833  # ros_utils.hpp:17
    # under-floor removal (launch:14 enable_under_floor_removal, default true
    # there): odometry consumes the cloud with points below the detected
    # floor plane (+floor_tolerance margin) removed
    # (scan_matching_odometry_nodelet.cpp:87-92, floor_detection_nodelet.cpp
    # :132-137). Off by default HERE (documented divergence): before the
    # first successful floor fit the reference falls back to the plane
    # [0,0,1,0], which deletes everything below sensor height — fine on real
    # ground-rich data, destructive on floor-less synthetic scenes. The
    # real-data presets (presets.py) turn it on.
    enable_under_floor_removal: bool = False
    # static capacities (TPU): raw scan and filtered scan
    raw_capacity: int = 2048
    filtered_capacity: int = 1024


@dataclasses.dataclass(frozen=True)
class ReveConfig:
    """Radar ego velocity estimator (reference radar_ego_velocity_estimator.h:30-60)."""

    min_dist: float = 0.1
    max_dist: float = 400.0
    min_db: float = 5.0
    elevation_thresh_deg: float = 60.0
    azimuth_thresh_deg: float = 120.0
    doppler_velocity_correction_factor: float = 1.0
    thresh_zero_velocity: float = 0.05
    allowed_outlier_percentage: float = 0.30
    sigma_zero_velocity_x: float = 1.0e-3
    sigma_zero_velocity_y: float = 3.2e-3
    sigma_zero_velocity_z: float = 1.0e-2
    sigma_offset_radar_x: float = 0.0
    sigma_offset_radar_y: float = 0.0
    sigma_offset_radar_z: float = 0.0
    max_sigma_x: float = 0.2
    max_sigma_y: float = 0.2
    max_sigma_z: float = 0.2
    use_ransac: bool = True
    outlier_prob: float = 0.05
    success_prob: float = 0.995
    n_ransac_points: int = 5
    inlier_thresh: float = 0.5

    @property
    def ransac_iter(self) -> int:
        # reference radar_ego_velocity_estimator.h:138-143
        return int(
            math.log(1.0 - self.success_prob)
            / math.log(1.0 - (1.0 - self.outlier_prob) ** self.n_ransac_points)
        )


@dataclasses.dataclass(frozen=True)
class RegistrationConfig:
    """APDGICP / GICP registration (launch:92-107, fast_apdgicp defaults)."""

    # registrations.cpp:38-140 factory: FAST_APDGICP | FAST_GICP | GICP |
    # GICP_OMP | ICP | VGICP | FAST_VGICP | FAST_VGICP_CUDA | NDT | NDT_OMP |
    # NDT_CUDA (the _OMP/_CUDA splits are CPU/GPU threading details; one TPU
    # implementation serves each family)
    method: str = "FAST_APDGICP"
    k_correspondences: int = 20  # fast_apdgicp_impl.hpp:21
    max_correspondence_distance: float = 2.0  # launch:99
    # adaptive probability-distribution covariance params (launch:34-36)
    dist_var: float = 0.86
    azimuth_var: float = 1.0  # degrees
    elevation_var: float = 1.0  # degrees
    # LM loop (lsq_registration_impl.hpp:12-23; launch reg_maximum_iterations=64)
    optimizer: str = "LM"  # LM | GN (LSQ_OPTIMIZER_TYPE, lsq_registration_impl.hpp:95-104)
    max_iterations: int = 64
    lm_max_iterations: int = 10
    lm_init_lambda_factor: float = 1e-9
    rotation_epsilon: float = 2e-3
    # launch reg_transformation_epsilon=0.1 overrides the 5e-4 ctor default
    # through pcl::Registration::setTransformationEpsilon (lsq_registration.hpp:42)
    transformation_epsilon: float = 0.1
    regularization: str = "PLANE"  # PLANE | NONE | MIN_EIG | NORMALIZED_MIN_EIG | FROBENIUS
    # TPU-layout-optimized implementation (frontend/apdgicp_fast.py):
    # identical LM semantics, SoA component arithmetic, one-hot MXU gathers,
    # approx-kNN covariance neighborhoods. Exact path kept for parity tests.
    use_fast_path: bool = True
    # Fused Pallas correspondence kernel (ops/pallas_nn.fused_correspondence
    # _pallas): NN argmin + target-feature gather in one VMEM-resident pass,
    # O(N+M) HBM traffic instead of the XLA path's [N,M] distance +
    # one-hot-gather matrices. f32 only; falls back to interpret mode off-TPU.
    use_pallas_correspondence: bool = False
    # MXU precision for the BIG registration matmuls only (the [N,M]
    # distance matrices and 0/1-selection gather/moment matmuls):
    # "HIGH" = 3-pass bf16 (~16-bit mantissa products, f32 accumulation).
    # These ops tolerate ~2^-16 operand rounding — NN argmin flips only
    # near-exact ties and covariance moments are weightings, not states —
    # measured identical registration error (0.039 vs 0.038 m median) at
    # +34% throughput on v5e. Pose-chain algebra (delta @ T, R A R^T, the
    # 6x6 solve) is NOT covered by this knob and stays at the library-wide
    # float32 default: 3-pass products drift chained rotations off SO(3)
    # at ~2e-5/product (measured det 0.947 after 2000 products).
    # Set to "HIGHEST" for bitwise round-1 behavior.
    fast_matmul_precision: str = "HIGH"
    # Recall target for the approx-kNN pass that picks the k-th-neighbor
    # distance threshold in the fast covariance path (lax.approx_min_k,
    # TPU PartialReduce). Round-4 A/B on v5e at bench shapes (B=256,
    # N=M=1024, k=20): 0.95 costs 12.5 ms/batch — the single largest op
    # in covariance prepare — while 0.90 runs 3x faster (+23% headline
    # fps, ~2x aggregate 8-fleet replay fps) at IDENTICAL per-pair error
    # (bench median_terr 0.039 m both ways). The default stays 0.95
    # because the cheaper setting's threshold inflation (mean +3.3% d2,
    # p95 +15%) COMPOUNDS over trajectories: controlled course A/B
    # measured odometry-ATE +31% on garden and +8% on nyl (full-loop ATE
    # +30% / -1%). Set 0.90 for throughput-critical fleet/batch serving
    # where loop closure owns drift. Internals quantize: (k=20, r=0.95)
    # and (k=48, r=0.90) produce bit-identical thresholds at the same
    # cost, so there is no cheaper intermediate operating point; r=0.90
    # equals k=28's output exactly, and k=64 r=0.90 is exact-but-31ms.
    # The exact path (use_fast_path=False) is never affected.
    approx_knn_recall: float = 0.95
    # Covariance neighborhood method (FastVGICPCuda NearestNeighborMethod,
    # fast_vgicp_cuda.hpp:21):
    #   "KNN" — k-nearest neighborhoods (CPU kd-tree / GPU_BRUTEFORCE
    #     parity); the reference pipeline's default and ours.
    #   "RBF" — GPU_RBF_KERNEL parity (covariance_estimation_rbf.cu:78-160):
    #     Gaussian-weighted moments w = exp(-kernel_width * d^2), gated at
    #     max_dist, over ALL points. No top-k anywhere — the prepare stage
    #     becomes two MXU matmuls + one exp, removing the approx_min_k pass
    #     that dominates KNN prepare (12.5 of 15.8 ms/batch at bench shapes).
    #     Reference quirk kept: `kernel_width` is used directly as the
    #     exponent factor (covariance_estimation_rbf.cu:80 reads
    #     constants[0] — the "width" is really an inverse length^2).
    #     Round-4 A/B on v5e: +51% headline throughput (6798 vs 4502 fps)
    #     at better per-pair error (0.030 vs 0.039 m). Round-5 settled the
    #     course-level question with a real sweep (kw in {0.25..16} x 4
    #     courses x 3 seeds x loop on/off, VALIDATION_r5_*.json): at
    #     kernel width >= 4 RBF beats KNN on full-trajectory ATE in ALL 8
    #     arms (nyl loop 1.68 -> 0.38 m, garden 1.72 -> 0.58 m) with more
    #     loop closures. The DATASET PRESETS therefore ship RBF at kw=4.0
    #     (presets._rbf_covariances); this bare-config default stays KNN +
    #     the reference's kw so RegistrationConfig() remains launch-parity
    #     for faithful A/Bs.
    covariance_method: str = "KNN"
    rbf_kernel_width: float = 0.25  # fast_vgicp_cuda.cu:25 (presets use 4.0)
    rbf_max_dist: float = 3.0  # fast_vgicp_cuda.cu:26 (setKernelWidth(-1) => 5*width)
    # voxelized (VGICP) option
    voxel_resolution: float = 1.0
    # Voxel neighborhood search for VGICP / NDT:
    #   "DIRECT7"/"DIRECT1" — the point's voxel (+6 face neighbors) found by
    #     packed-key binary search in the lex-sorted voxel table — O(N k
    #     log V) gathers, NO [N, V] distance matrix (frontend/vgicp.py
    #     _voxel_correspondences_direct; VERDICT r4 #4);
    #   "KDTREE" — nearest voxel centers via an [N, V] MXU distance matrix
    #     + top-k (the pre-round-5 behavior).
    # Defaults mirror the reference's two distinct defaults: FastVGICP
    # constructs with DIRECT1 (fast_vgicp_impl.hpp:23, never overridden by
    # registrations.cpp); NDT_OMP reads reg_nn_search_method with default
    # DIRECT7 (registrations.cpp:117-131).
    vgicp_neighborhood: str = "DIRECT1"
    ndt_neighborhood: str = "DIRECT7"
    dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class OdometryConfig:
    """Front-end scan matching odometry (launch:81-115)."""

    keyframe_delta_trans: float = 0.5
    keyframe_delta_angle: float = 0.17
    keyframe_min_size: int = 100
    enable_transform_thresholding: bool = True
    max_acceptable_trans: float = 1.0
    max_acceptable_angle_deg: float = 3.0
    # What to do with a rejected (too-large) scan-match delta:
    # "QUIRK": reference parity — keyframe_pose * trans * radar_delta
    #   (scan_matching_odometry_nodelet.cpp:561-568), which APPLIES the
    #   implausible delta twice ("Ignore this frame" amplifies it; dormant
    #   upstream because real registrations rarely exceed 1 m).
    # "EGOVEL": intent-faithful — substitute ego-velocity dead reckoning
    #   (the mat_est role of the enable_imu_thresholding branch, :543-552,
    #   without the unused IMU-orientation part).
    thresholding_fallback: str = "QUIRK"
    max_diff_trans: float = 0.3
    max_diff_angle: float = 0.8
    max_egovel_cum: float = 1.0
    enable_scan_to_map: bool = False
    max_submap_frames: int = 5
    use_ego_vel: bool = False  # enable_frontend_ego_vel
    # loose IMU roll/pitch complementary fusion at keyframe acceptance
    # (transformUpdate, scan_matching_odometry_nodelet.cpp:294-348; launch:108
    # ships it disabled, ratio 0.1 at launch:110)
    enable_imu_fusion: bool = False
    imu_fusion_ratio: float = 0.1


@dataclasses.dataclass(frozen=True)
class FloorConfig:
    """Floor detection (launch:188-196, floor_detection_nodelet.cpp)."""

    tilt_deg: float = 0.0
    sensor_height: float = 2.0
    height_clip_range: float = 1.0
    floor_pts_thresh: int = 50
    use_normal_filtering: bool = True
    normal_filter_thresh_deg: float = 20.0
    ransac_iterations: int = 128
    ransac_distance_thresh: float = 0.06  # floor_detection_nodelet.cpp:183
    floor_normal_thresh_deg: float = 10.0  # verticality check
    floor_tolerance: float = 0.1  # under-floor clip margin (floor_detection_nodelet.cpp:70)


@dataclasses.dataclass(frozen=True)
class ImuConfig:
    """IMU noise and extrinsics (params.yaml:24-48)."""

    acc_noise: float = 0.0022281160035059417
    gyr_noise: float = 0.00011667951042710442
    acc_bias_noise: float = 0.00011782392708033614
    gyr_bias_noise: float = 2.616129872371749e-06
    gravity: float = 9.80511
    # imu->radar extrinsic rotation (row-major) and translation
    ext_rot: tuple = (
        0.999735807578, -0.02148120581797, -0.00826995351904,
        -0.0215215701795, -0.9997581134183, -0.0048509797951,
        -0.0081643477385, 0.00502853428037, -0.99995400578406,
    )
    ext_trans: tuple = (0.3176955976234, 0.13761019052125, -0.05898352725152)
    # rotate incoming IMU samples into the radar/base frame with ext_rot
    # (ParamServer::imuConverter, utility_radar.h:206-236). Off by default:
    # synthetic data and pre-converted sequences are already sensor-frame.
    apply_extrinsics: bool = False
    # preintegration buffer capacity (IMU samples between radar frames;
    # 400 Hz IMU / 10 Hz radar ~ 40, with margin)
    preint_capacity: int = 64


@dataclasses.dataclass(frozen=True)
class BackendConfig:
    """Sliding-window graph optimization (launch:119-183,
    radar_graph_slam_nodelet.cpp:380-472)."""

    window_size: int = 6  # nodelet:380-387
    inertial_weight: float = 0.001
    solver_iterations: int = 512  # g2o_solver_num_iterations (we converge earlier)
    max_solver_iterations: int = 8  # LM cap per window. Measured on live
    # windows: the pose of every frame is IDENTICAL to a 64-iteration budget
    # (the tail is an IRLS-reweighting crawl in weakly-constrained bias dims
    # - chi2 drifts ~0.15%/iteration with |step| ~3e-2 while the newest-frame
    # pose is already converged); the validation matrix has always run at 8
    # and the round-2 default of 12 measured identical poses — the cap is
    # pure latency. Raising it buys nothing but backend latency.
    optimizer: str = "LM"  # LM (reference lm_var_cholmod) | GN (no inner
    # lambda search - fewer sequential device steps per frame; the window is
    # warm-started every frame so the undamped step converges identically on
    # healthy problems. Same trade as OdometryConfig.optimizer.)
    fix_first_node: bool = True
    use_schur: bool = False  # Schur-eliminate velocity/bias blocks per solve
    # information matrix calculator (launch:171-179)
    use_const_inf_matrix: bool = False
    const_stddev_x: float = 0.5
    const_stddev_q: float = 0.1
    var_gain_a: float = 20.0
    min_stddev_x: float = 0.1
    max_stddev_x: float = 5.0
    min_stddev_q: float = 0.05
    max_stddev_q: float = 0.2
    fitness_score_max_range: float = float("inf")
    # robust kernels (launch:160-170)
    odometry_edge_robust_kernel: str = "NONE"
    odometry_edge_robust_kernel_size: float = 1.0
    integ_edge_robust_kernel: str = "Huber"
    integ_edge_robust_kernel_size: float = 1.0
    floor_edge_robust_kernel: str = "Huber"
    floor_edge_robust_kernel_size: float = 1.0
    scan_match_prior_robust_kernel: str = "Huber"  # nodelet:423-425 Huber 0.5
    scan_match_prior_robust_kernel_size: float = 0.5
    # failure detection (nodelet:1351-1371)
    max_velocity: float = 100.0
    max_bias: float = 0.5


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    """Loop closure (launch:134-156; loop_detector.cpp). Activated here,
    unlike the reference where the driving timer is commented out."""

    enable: bool = True
    distance_thresh: float = 10.0
    accum_distance_thresh: float = 50.0
    min_loop_interval_dist: float = 10.0
    distance_from_last_edge_thresh: float = 10.0
    max_baro_difference: float = 2.0
    max_yaw_difference_deg: float = 20.0
    # candidate-ellipse drift model (loop_detector.hpp hardcodes 0.05/1.0;
    # config here so high-drift platforms can widen the gate)
    odom_drift_xy: float = 0.05
    drift_scale_xy: float = 1.0
    sc_dist_thresh: float = 0.5
    sc_azimuth_range_deg: float = 56.5
    history_fitness_score: float = 6.0
    odom_check_trans_thresh: float = 0.3
    odom_check_rot_thresh: float = 0.05
    pairwise_check_trans_thresh: float = 1.5
    pairwise_check_rot_thresh: float = 0.2
    # scan context shape (Scancontext.h:110-125, limited-FoV variant)
    num_ring: int = 40  # PC_NUM_RING (Scancontext.h:113)
    num_sector: int = 20  # PC_NUM_SECTOR (Scancontext.h:114)
    max_radius: float = 80.0
    lidar_height: float = 1.2  # Scancontext.h:108, added to z before binning
    search_ratio: float = 0.1  # Scancontext.h:127
    num_exclude_recent: int = 10  # Scancontext.h:122
    num_candidates: int = 3  # Scancontext.h:123
    use_sc_yaw_guess: bool = False  # seed ICP verify with the SC yaw (the
    # reference computes yawDiffRad but leaves it unused, Scancontext.cpp:375)
    compact_on_full: bool = True  # halve the graph when keyframe_capacity
    # fills (compose odometry edges across dropped nodes) instead of freezing
    verify_candidates: int = 1  # >1: registration-verify the top-k scan-context
    # candidates in ONE vmapped dispatch and keep the best-fitness pass (the
    # reference verifies only the single best match, loop_detector.cpp:219)
    loop_capacity: int = 32  # max simultaneous loop factors in the global solve
    keyframe_capacity: int = 2048  # max keyframes in the loop graph
    # barometer altitude prior on keyframes (EdgeSE3PriorZ / EdgeSE3Z role,
    # include/g2o/edge_se3_priorz.hpp:1-76, edge_se3_z.hpp): anchors z drift
    # to the (first-reading-relative) barometric altitude. Implemented as a
    # z-only row of the per-axis diagonal translation-prior machinery; a
    # keyframe with a real GPS fix keeps the GPS prior instead.
    baro_z_prior: bool = False
    baro_z_stddev: float = 0.5  # meters
    global_solver: str = "SCHUR"  # SCHUR (exact block elimination) | PCG
    schur_blocks: int = 32  # submap count for the block-Schur solver (the
    # measured v5e sweet spot at keyframe_capacity=2048: 104 ms/solve vs
    # 138 ms at 16 and 837 ms in round 1 — see BENCHMARKS.md)
    async_loop: bool = False  # run loop detection + the global solve on a
    # background worker thread instead of inside process_frame — the
    # reference's architecture (its loop path lives on a wall timer +
    # separate loop_optimizer, radar_graph_slam_nodelet.cpp:177,652-778,
    # asynchronous w.r.t. the frame callback). Corrections are merged at
    # the next process_frame: solved poses land on the keyframes the
    # worker saw, newer keyframes are re-chained with their raw odometry
    # deltas (the trans_odom2map retarget role). `Engine.drain_loops()`
    # blocks until in-flight detections are applied; draining after every
    # frame reproduces the synchronous path bit-exactly (tested).


@dataclasses.dataclass(frozen=True)
class GpsConfig:
    """GPS/UTM position priors on global-graph keyframes (launch:17
    enable_gps; EdgeSE3PriorXYZ per include/g2o/edge_se3_priorxyz.hpp;
    per-keyframe utm_coord slot, keyframe.hpp:52). The reference ships the
    machinery dormant; here it is wired end-to-end: NavSatFix fixes are
    covariance-gated + UTM-converted at ingest (io/rosbag1.convert_bag,
    io/geo.py), the first accepted fix becomes the zero_utm origin
    (radar_graph_slam_nodelet.cpp:1219,1453), and each keyframe within
    max_association_dt of a fix gets a translation prior in the global
    solve."""

    enable: bool = True  # use fixes when the sequence carries them
    max_association_dt: float = 0.2  # stamp-pairing tolerance [s]
    # prior stddevs when the fix carries no covariance (hdl_graph_slam
    # heritage defaults: gps_edge_stddev_xy / _z)
    stddev_xy: float = 10.0
    stddev_z: float = 5.0
    use_fix_covariance: bool = True  # info = 1/cov from NavSatFix when present
    # run the global solve every N GPS-tagged keyframes even without loop
    # events, so priors actually bound drift online (0 = only at loop/final)
    solve_interval: int = 8


@dataclasses.dataclass(frozen=True)
class DistConfig:
    """Device-mesh layout for multi-chip runs (new capability, BASELINE.json #5)."""

    data_axis: str = "data"  # batch of sequences / frame pairs
    model_axis: str = "model"  # intra-problem sharding (points / keyframe blocks)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    preprocess: PreprocessConfig = PreprocessConfig()
    reve: ReveConfig = ReveConfig()
    registration: RegistrationConfig = RegistrationConfig()
    odometry: OdometryConfig = OdometryConfig()
    floor: FloorConfig = FloorConfig()
    imu: ImuConfig = ImuConfig()
    backend: BackendConfig = BackendConfig()
    loop: LoopConfig = LoopConfig()
    gps: GpsConfig = GpsConfig()
    dist: DistConfig = DistConfig()


DEFAULT = EngineConfig()
