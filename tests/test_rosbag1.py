"""Pure-python rosbag reader: round-trip against a minimal bag writer that
follows the ROS1 v2.0 on-disk format."""

import struct

import numpy as np

from rivslam_tpu.io import rosbag1


def _field(k: str, v: bytes) -> bytes:
    payload = k.encode() + b"=" + v
    return struct.pack("<I", len(payload)) + payload


def _record(fields: dict, body: bytes) -> bytes:
    hdr = b"".join(_field(k, v) for k, v in fields.items())
    return struct.pack("<I", len(hdr)) + hdr + struct.pack("<I", len(body)) + body


def _ros_string(s: str) -> bytes:
    return struct.pack("<I", len(s)) + s.encode()


def _ros_header(stamp: float, frame: str = "radar") -> bytes:
    sec = int(stamp)
    nsec = int((stamp - sec) * 1e9)
    return struct.pack("<III", 7, sec, nsec) + _ros_string(frame)


def ser_imu(stamp, acc, gyr):
    b = _ros_header(stamp, "imu")
    b += struct.pack("<4d", 0, 0, 0, 1)
    b += struct.pack("<9d", *([0] * 9))
    b += struct.pack("<3d", *gyr)
    b += struct.pack("<9d", *([0] * 9))
    b += struct.pack("<3d", *acc)
    b += struct.pack("<9d", *([0] * 9))
    return b


def ser_barometer(stamp, altitude):
    b = _ros_header(stamp, "baro")
    b += struct.pack("<3f", altitude, 1013.25, 20.0)
    return b


def ser_pointcloud(stamp, xyz, dop, power):
    b = _ros_header(stamp)
    b += struct.pack("<I", len(xyz))
    b += np.asarray(xyz, "<f4").tobytes()
    b += struct.pack("<I", 2)
    for name, vals in [("Doppler", dop), ("Power", power)]:
        b += _ros_string(name)
        b += struct.pack("<I", len(vals)) + np.asarray(vals, "<f4").tobytes()
    return b


def ser_pointcloud2(stamp, xyz, dop, power):
    n = len(xyz)
    b = _ros_header(stamp)
    b += struct.pack("<II", 1, n)  # height, width
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1), ("v", 12, 7, 1), ("power", 16, 7, 1)]
    b += struct.pack("<I", len(fields))
    for name, off, dt, cnt in fields:
        b += _ros_string(name) + struct.pack("<IBI", off, dt, cnt)
    step = 20
    data = np.zeros((n, 5), dtype="<f4")
    data[:, :3] = xyz
    data[:, 3] = dop
    data[:, 4] = power
    raw = data.tobytes()
    b += struct.pack("<B", 0)  # bigendian
    b += struct.pack("<II", step, step * n)
    b += struct.pack("<I", len(raw)) + raw
    return b


def ser_radar_scan(stamp, rng_, az, el, vel, snr):
    b = _ros_header(stamp)
    b += struct.pack("<I", len(rng_))
    for i in range(len(rng_)):
        vals = np.zeros(16, dtype="<f4")
        vals[0], vals[1], vals[2], vals[3], vals[5] = rng_[i], az[i], el[i], vel[i], snr[i]
        b += vals.tobytes()
    return b


def write_bag(path, messages, compression=None):
    """messages: list of (topic, msg_type, stamp, body)."""
    topics = {}
    chunk = b""
    for topic, msg_type, stamp, body in messages:
        if topic not in topics:
            cid = len(topics)
            topics[topic] = cid
            conn_hdr = _field("topic", topic.encode()) + _field("type", msg_type.encode())
            chunk += _record(
                {"op": b"\x07", "conn": struct.pack("<I", cid), "topic": topic.encode()},
                conn_hdr,
            )
        sec = int(stamp)
        nsec = int((stamp - sec) * 1e9)
        chunk += _record(
            {
                "op": b"\x02",
                "conn": struct.pack("<I", topics[topic]),
                "time": struct.pack("<II", sec, nsec),
            },
            body,
        )
    if compression == "bz2":
        import bz2 as _b

        comp, name = _b.compress(chunk), b"bz2"
    elif compression == "lz4":
        from rivslam_tpu.io import lz4f

        comp, name = lz4f.compress_frame(chunk), b"lz4"
    else:
        comp, name = chunk, b"none"
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                         "conn_count": struct.pack("<I", len(topics)),
                         "chunk_count": struct.pack("<I", 1)}, b" " * 64))
        f.write(_record({"op": b"\x05", "compression": name,
                         "size": struct.pack("<I", len(chunk))}, comp))


def make_messages(rng):
    msgs = []
    for i in range(3):
        t = 100.0 + i * 0.1
        xyz = rng.normal(size=(50, 3)) * 10
        dop = rng.normal(size=50)
        power = rng.uniform(5, 30, 50)
        msgs.append(("/radar_enhanced_pcl", "sensor_msgs/PointCloud", t,
                     ser_pointcloud(t, xyz, dop, power)))
    for i in range(30):
        t = 100.0 + i * 0.01
        msgs.append(("/vectornav/imu", "sensor_msgs/Imu", t,
                     ser_imu(t, [0.1, 0.2, 9.8], [0.01, 0.02, 0.03])))
    for i in range(3):
        t = 100.0 + i * 0.1
        msgs.append(("/barometer", "radar_graph_slam/Barometer", t,
                     ser_barometer(t, 150.0 + i)))
    return msgs


def test_read_messages_roundtrip(tmp_path, rng):
    path = str(tmp_path / "test.bag")
    msgs = make_messages(rng)
    write_bag(path, msgs)
    got = list(rosbag1.read_messages(path))
    assert len(got) == len(msgs)
    radar = [g for g in got if g[0] == "/radar_enhanced_pcl"]
    m = rosbag1.parse_pointcloud(radar[0][3])
    assert m["points"].shape == (50, 3)
    assert "Doppler" in m["channels"]


def test_bz2_chunks(tmp_path, rng):
    path = str(tmp_path / "test_bz2.bag")
    write_bag(path, make_messages(rng), compression="bz2")
    got = list(rosbag1.read_messages(path))
    assert len(got) == 36


def test_convert_bag_eagle(tmp_path, rng):
    path = str(tmp_path / "eagle.bag")
    write_bag(path, make_messages(rng))
    out = str(tmp_path / "seq.npz")
    seq = rosbag1.convert_bag(path, out)
    assert seq.num_frames == 3
    assert len(seq.imu_stamps) == 30
    f = seq.frame(1)
    assert f["xyz"].shape == (50, 3)
    # barometer stream converted and queryable (loop prefilter baro gate)
    assert len(seq.baro_stamps) == 3
    assert seq.baro_at(100.1) == 151.0
    from rivslam_tpu.io import datasets as _ds

    reloaded = _ds.RadarSequence.load(out)
    assert reloaded.baro_at(100.2) == 152.0


def test_pointcloud2_and_scan_extended(tmp_path, rng):
    xyz = rng.normal(size=(40, 3)) * 10
    dop = rng.normal(size=40)
    power = rng.uniform(1, 20, 40)
    msgs = [("/radar", "sensor_msgs/PointCloud2", 5.0, ser_pointcloud2(5.0, xyz, dop, power))]
    rng_ = rng.uniform(2, 50, 20)
    az = rng.uniform(-1, 1, 20)
    el = rng.uniform(-0.5, 0.5, 20)
    msgs.append(("/radar2", "msgs_radar/RadarScanExtended", 6.0,
                 ser_radar_scan(6.0, rng_, az, el, rng.normal(size=20), rng.uniform(5, 20, 20))))
    path = str(tmp_path / "mixed.bag")
    write_bag(path, msgs)
    got = list(rosbag1.read_messages(path))
    m2 = rosbag1.parse_pointcloud2(got[0][3])
    np.testing.assert_allclose(m2["fields"]["x"], xyz[:, 0].astype(np.float32))
    np.testing.assert_allclose(m2["fields"]["v"], dop.astype(np.float32))
    ms = rosbag1.parse_radar_scan_extended(got[1][3])
    np.testing.assert_allclose(ms["range"], rng_.astype(np.float32))
    # convert via each format path
    out = str(tmp_path / "m.npz")
    seq = rosbag1.convert_bag(path, out, radar_topic="/radar")
    assert seq.num_frames == 1
