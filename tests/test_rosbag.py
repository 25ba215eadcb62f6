"""rosbag v2.0 reader tests against a programmatically-written bag."""

import struct

import numpy as np

from flvis_tpu.io import rosbag


def _header(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        item = k.encode() + b"=" + v
        out += struct.pack("<I", len(item)) + item
    return out


def _record(fields: dict, data: bytes) -> bytes:
    h = _header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _time(t: float) -> bytes:
    sec = int(t)
    return struct.pack("<II", sec, int(round((t - sec) * 1e9)))


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _image_msg(t, img: np.ndarray, encoding="mono8") -> bytes:
    h, w = img.shape
    if encoding == "mono8":
        raw = img.astype(np.uint8).tobytes()
        step = w
    else:
        raw = img.astype(np.uint16).tobytes()
        step = w * 2
    return (
        struct.pack("<I", 0) + _time(t) + _string("cam")
        + struct.pack("<II", h, w) + _string(encoding)
        + struct.pack("<B", 0) + struct.pack("<I", step)
        + struct.pack("<I", len(raw)) + raw
    )


def _imu_msg(t, gyro, acc) -> bytes:
    return (
        struct.pack("<I", 0) + _time(t) + _string("imu")
        + struct.pack("<4d", 1, 0, 0, 0) + struct.pack("<9d", *([0] * 9))
        + struct.pack("<3d", *gyro) + struct.pack("<9d", *([0] * 9))
        + struct.pack("<3d", *acc) + struct.pack("<9d", *([0] * 9))
    )


def write_test_bag(path, n_frames=3, compression="none"):
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (8, 12), np.uint8) for _ in range(2 * n_frames)]
    conns = {
        0: ("/cam0", "sensor_msgs/Image"),
        1: ("/cam1", "sensor_msgs/Image"),
        2: ("/imu", "sensor_msgs/Imu"),
    }
    chunk = b""
    for cid, (topic, mtype) in conns.items():
        chunk += _record(
            {"op": b"\x07", "conn": struct.pack("<I", cid), "topic": topic.encode()},
            _header({"type": mtype.encode(), "topic": topic.encode(),
                     "md5sum": b"0" * 32, "message_definition": b""}),
        )
    t0 = 10.0
    for i in range(n_frames):
        t = t0 + i * 0.05
        for k in range(10):
            ti = t - 0.05 + 0.005 * (k + 1)
            chunk += _record(
                {"op": b"\x02", "conn": struct.pack("<I", 2), "time": _time(ti)},
                _imu_msg(ti, [0.0, 0.0, 0.1], [0.0, 0.0, 9.8]),
            )
        chunk += _record({"op": b"\x02", "conn": struct.pack("<I", 0), "time": _time(t)},
                         _image_msg(t, imgs[2 * i]))
        chunk += _record({"op": b"\x02", "conn": struct.pack("<I", 1), "time": _time(t)},
                         _image_msg(t, imgs[2 * i + 1]))
    if compression == "bz2":
        import bz2
        payload = bz2.compress(chunk)
    else:
        payload = chunk
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                         "conn_count": struct.pack("<I", 3),
                         "chunk_count": struct.pack("<I", 1)}, b"\x00" * 64))
        f.write(_record({"op": b"\x05", "compression": compression.encode(),
                         "size": struct.pack("<I", len(chunk))}, payload))
    return imgs


class TestBagReader:
    def test_reads_messages(self, tmp_path):
        p = str(tmp_path / "t.bag")
        imgs = write_test_bag(p)
        msgs = list(rosbag.BagReader(p).messages())
        topics = [t for t, _ in msgs]
        assert topics.count("/cam0") == 3
        assert topics.count("/cam1") == 3
        assert topics.count("/imu") == 30
        img0 = next(m for t, m in msgs if t == "/cam0")
        np.testing.assert_allclose(img0.data, imgs[0].astype(np.float32))

    def test_bz2_chunks(self, tmp_path):
        p = str(tmp_path / "t.bag")
        write_test_bag(p, compression="bz2")
        msgs = list(rosbag.BagReader(p).messages())
        assert len(msgs) == 36

    def test_topic_filter(self, tmp_path):
        p = str(tmp_path / "t.bag")
        write_test_bag(p)
        msgs = list(rosbag.BagReader(p, topics=["/imu"]).messages())
        assert len(msgs) == 30

    def test_d435i_frames(self, tmp_path):
        p = str(tmp_path / "t.bag")
        write_test_bag(p)
        frames = list(rosbag.d435i_frames(p, "/cam0", "/cam1", "/imu"))
        assert len(frames) == 3
        f = frames[0]
        assert f.img0.shape == (8, 12) and f.img1.shape == (8, 12)
        assert len(f.imu_t) == 10
        # ENU remap: raw acc (0,0,9.8) → (9.8, 0, 0)? D435i: (x,y,z)→(z,-x,-y)
        np.testing.assert_allclose(f.imu_acc[0], [9.8, 0, 0], atol=1e-6)
