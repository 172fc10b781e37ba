"""Pure-python ROS1 bag (format v2.0) reader + EUROC-layout ingest.

The reference's rosbag extractor (eurocreader/bagreader.py:7-152) is
import-broken (depends on the `rosbag` ROS package and a nonexistent
`back_del.quaternion`) yet its datasets are all rosbag-derived
(readme.md:3 names an extract_rosbag step).  This module restores that
ingest path with zero dependencies: a minimal bag-v2.0 record parser
(uncompressed and bz2 chunks; lz4 skipped with a clear error) and
hand-rolled little-endian deserializers for the three message types the
pipeline consumes:

  * nav_msgs/Odometry        -> robot0/odom/data.csv
  * sensor_msgs/PointCloud2  -> robot0/lidar/data/<stamp>.pcd + data.csv
  * sensor_msgs/NavSatFix    -> robot0/gps0/data.csv (+ reference.yaml)

Format reference: http://wiki.ros.org/Bags/Format/2.0 (public spec).
"""

from __future__ import annotations

import bz2
import os
import struct
from typing import Iterator

import numpy as np

_U32 = struct.Struct("<I")
_U64 = struct.Struct("<Q")

OP_MESSAGE = 0x02
OP_BAG_HEADER = 0x03
OP_INDEX = 0x04
OP_CHUNK = 0x05
OP_CHUNK_INFO = 0x06
OP_CONNECTION = 0x07


def _parse_header(buf: bytes) -> dict:
    """Bag record header: sequence of (len u32, name=value) fields."""
    fields = {}
    off = 0
    while off < len(buf):
        (flen,) = _U32.unpack_from(buf, off)
        off += 4
        entry = buf[off:off + flen]
        off += flen
        name, _, value = entry.partition(b"=")
        fields[name.decode()] = value
    return fields


def _read_record(buf: bytes, off: int):
    """Returns (header dict, data bytes, next offset)."""
    (hlen,) = _U32.unpack_from(buf, off)
    header = _parse_header(buf[off + 4:off + 4 + hlen])
    off2 = off + 4 + hlen
    (dlen,) = _U32.unpack_from(buf, off2)
    data = buf[off2 + 4:off2 + 4 + dlen]
    return header, data, off2 + 4 + dlen


class Connection:
    def __init__(self, conn_id: int, topic: str, data: bytes):
        self.id = conn_id
        self.topic = topic
        info = _parse_header(data)
        self.type = info.get("type", b"").decode()
        self.md5sum = info.get("md5sum", b"").decode()


def read_bag(path: str) -> Iterator[tuple]:
    """Yields (topic, msg_type, t_ns, raw_bytes) for every message record.

    Sequential scan — index records are ignored, so truncated/unindexed
    bags read fine.  Messages inside chunks are yielded in file order.
    """
    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"#ROSBAG V2.0"):
            raise ValueError(f"{path}: not a ROS bag v2.0 (got {magic!r})")
        buf = f.read()

    connections: dict[int, Connection] = {}

    def scan(block: bytes):
        off = 0
        while off < len(block):
            header, data, off = _read_record(block, off)
            op = header.get("op", b"\x00")[0]
            if op == OP_CONNECTION:
                (cid,) = _U32.unpack(header["conn"])
                connections[cid] = Connection(
                    cid, header["topic"].decode(), data)
            elif op == OP_MESSAGE:
                (cid,) = _U32.unpack(header["conn"])
                secs, nsecs = struct.unpack("<II", header["time"])
                conn = connections.get(cid)
                if conn is not None:
                    yield (conn.topic, conn.type,
                           secs * 1_000_000_000 + nsecs, data)
            elif op == OP_CHUNK:
                compression = header.get("compression", b"none").decode()
                if compression == "none":
                    inner = data
                elif compression == "bz2":
                    inner = bz2.decompress(data)
                else:
                    raise ValueError(
                        f"unsupported chunk compression {compression!r} "
                        "(re-record with --bz2 or none; lz4 needs the lz4 "
                        "package, unavailable in this image)")
                yield from scan(inner)
            # OP_BAG_HEADER / OP_INDEX / OP_CHUNK_INFO: skip

    yield from scan(buf)


# --------------------------------------------------------- deserializers

def _string(buf, off):
    (n,) = _U32.unpack_from(buf, off)
    return buf[off + 4:off + 4 + n].decode(errors="replace"), off + 4 + n


def _header(buf, off):
    off += 4                      # seq
    secs, nsecs = struct.unpack_from("<II", buf, off)
    off += 8
    frame, off = _string(buf, off)
    return secs * 1_000_000_000 + nsecs, frame, off


def parse_odometry(buf: bytes) -> dict:
    """nav_msgs/Odometry -> stamp + pose columns (EUROC order)."""
    stamp, frame, off = _header(buf, 0)
    _, off = _string(buf, off)    # child_frame_id
    x, y, z, qx, qy, qz, qw = struct.unpack_from("<7d", buf, off)
    return {"stamp_ns": stamp, "x": x, "y": y, "z": z,
            "qx": qx, "qy": qy, "qz": qz, "qw": qw}


def parse_navsatfix(buf: bytes) -> dict:
    """sensor_msgs/NavSatFix -> stamp + lat/lon/alt."""
    stamp, frame, off = _header(buf, 0)
    off += 1 + 2                  # status: int8 status, uint16 service
    lat, lon, alt = struct.unpack_from("<3d", buf, off)
    return {"stamp_ns": stamp, "latitude": lat, "longitude": lon,
            "altitude": alt}


def parse_pointcloud2(buf: bytes) -> tuple[int, np.ndarray]:
    """sensor_msgs/PointCloud2 -> (stamp_ns, (N,3) float32 xyz).

    Only the x/y/z FLOAT32 fields are extracted (what the reference's
    keyframe pipeline uses); other fields (intensity, ring, ...) are
    skipped via point_step strides.
    """
    stamp, frame, off = _header(buf, 0)
    height, width = struct.unpack_from("<II", buf, off)
    off += 8
    (n_fields,) = _U32.unpack_from(buf, off)
    off += 4
    fields = {}
    for _ in range(n_fields):
        name, off = _string(buf, off)
        f_off, dtype, count = struct.unpack_from("<IBI", buf, off)
        off += 9
        fields[name] = (f_off, dtype, count)
    is_bigendian = buf[off]
    off += 1
    point_step, row_step = struct.unpack_from("<II", buf, off)
    off += 8
    (dlen,) = _U32.unpack_from(buf, off)
    off += 4
    raw = np.frombuffer(buf, dtype=np.uint8, count=dlen, offset=off)

    n = height * width
    FLOAT32 = 7                  # sensor_msgs/PointField datatype enum
    for axis in ("x", "y", "z"):
        if axis not in fields or fields[axis][1] != FLOAT32:
            raise ValueError(f"PointCloud2 missing FLOAT32 field {axis!r}")
    if is_bigendian:
        raise ValueError("big-endian PointCloud2 not supported")
    mat = raw[: n * point_step].reshape(n, point_step)
    pts = np.empty((n, 3), dtype=np.float32)
    for k, axis in enumerate(("x", "y", "z")):
        o = fields[axis][0]
        pts[:, k] = mat[:, o:o + 4].copy().view(np.float32)[:, 0]
    finite = np.isfinite(pts).all(axis=1)
    return stamp, pts[finite]


# ----------------------------------------------------------------- ingest

def ingest_bag(bag_path: str, directory: str,
               odom_topic: str | None = None,
               lidar_topic: str | None = None,
               gps_topic: str | None = None,
               progress: bool = True) -> dict:
    """Extract a rosbag into the EUROC layout the pipeline consumes.

    Topics default to the first connection of the matching type.  Replaces
    reference bagreader.py:17-140 (read_rosbag_data2D/3D + PCD export).
    Returns counts per stream.
    """
    import pandas as pd
    from lidar_slam_arvc_tpu.io.pcd import write_pcd

    by_type = {"nav_msgs/Odometry": odom_topic,
               "sensor_msgs/PointCloud2": lidar_topic,
               "sensor_msgs/NavSatFix": gps_topic}
    odo_rows, gps_rows, lidar_times = [], [], []
    os.makedirs(f"{directory}/robot0/lidar/data", exist_ok=True)

    n_msgs = 0
    for topic, msg_type, t_ns, raw in read_bag(bag_path):
        want = by_type.get(msg_type, "__skip__")
        if want == "__skip__" or (want is not None and topic != want):
            continue
        if want is None:          # latch onto the first topic of this type
            by_type[msg_type] = topic
        n_msgs += 1
        if msg_type == "nav_msgs/Odometry":
            row = parse_odometry(raw)
            odo_rows.append(row)
        elif msg_type == "sensor_msgs/NavSatFix":
            gps_rows.append(parse_navsatfix(raw))
        else:
            stamp, pts = parse_pointcloud2(raw)
            stamp = stamp or t_ns   # some drivers leave header.stamp empty
            write_pcd(f"{directory}/robot0/lidar/data/{stamp}.pcd", pts)
            lidar_times.append(stamp)

    if lidar_times:
        pd.DataFrame({"#timestamp [ns]": lidar_times}).to_csv(
            f"{directory}/robot0/lidar/data.csv", index=False)
    if odo_rows:
        df = pd.DataFrame(odo_rows)
        os.makedirs(f"{directory}/robot0/odom", exist_ok=True)
        pd.DataFrame({
            "#timestamp [ns]": df["stamp_ns"],
            "x": df["x"], "y": df["y"], "z": df["z"],
            "qx": df["qx"], "qy": df["qy"], "qz": df["qz"],
            "qw": df["qw"],
        }).to_csv(f"{directory}/robot0/odom/data.csv", index=False)
    if gps_rows:
        df = pd.DataFrame(gps_rows)
        os.makedirs(f"{directory}/robot0/gps0", exist_ok=True)
        pd.DataFrame({
            "#timestamp [ns]": df["stamp_ns"],
            "latitude": df["latitude"], "longitude": df["longitude"],
            "altitude": df["altitude"],
        }).to_csv(f"{directory}/robot0/gps0/data.csv", index=False)
        # reference.yaml: first valid fix as the UTM offset origin
        # (reference eurocreader.py:26-36 expects it next to the data)
        import yaml
        first = df.iloc[0]
        with open(f"{directory}/robot0/gps0/reference.yaml", "w") as f:
            yaml.safe_dump({"latitude": float(first["latitude"]),
                            "longitude": float(first["longitude"]),
                            "altitude": float(first["altitude"])}, f)

    counts = {"odometry": len(odo_rows), "lidar_scans": len(lidar_times),
              "gps_fixes": len(gps_rows), "messages_read": n_msgs,
              "topics": {t: k for t, k in by_type.items() if k}}
    if progress:
        print(f"ingest: {counts}")
    return counts


# ------------------------------------------------------- writer (testing)

def write_bag(path: str, messages: list[tuple[str, str, int, bytes]],
              compression: str = "none") -> None:
    """Minimal bag-v2.0 writer (single chunk) for hermetic tests.

    ``messages``: (topic, msg_type, t_ns, raw serialized bytes).  Produces
    a spec-conformant sequential bag (no index records — readers that
    require indexes should re-index; ours scans sequentially).
    """
    def field(name: str, value: bytes) -> bytes:
        entry = name.encode() + b"=" + value
        return _U32.pack(len(entry)) + entry

    def record(header_fields: dict, data: bytes) -> bytes:
        h = b"".join(field(k, v) for k, v in header_fields.items())
        return _U32.pack(len(h)) + h + _U32.pack(len(data)) + data

    topics = {}
    chunk = b""
    for topic, msg_type, t_ns, raw in messages:
        if topic not in topics:
            cid = len(topics)
            topics[topic] = cid
            conn_data = (field("topic", topic.encode())
                         + field("type", msg_type.encode())
                         + field("md5sum", b"0" * 32)
                         + field("message_definition", b""))
            chunk += record({"op": bytes([OP_CONNECTION]),
                             "conn": _U32.pack(cid),
                             "topic": topic.encode()}, conn_data)
        secs, nsecs = divmod(t_ns, 1_000_000_000)
        chunk += record({"op": bytes([OP_MESSAGE]),
                         "conn": _U32.pack(topics[topic]),
                         "time": struct.pack("<II", secs, nsecs)}, raw)

    payload = bz2.compress(chunk) if compression == "bz2" else chunk
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        bh = record({"op": bytes([OP_BAG_HEADER]),
                     "index_pos": _U64.pack(0),
                     "conn_count": _U32.pack(len(topics)),
                     "chunk_count": _U32.pack(1)},
                    b" " * 4096)                   # spec: padded header rec
        f.write(bh)
        f.write(record({"op": bytes([OP_CHUNK]),
                        "compression": compression.encode(),
                        "size": _U32.pack(len(chunk))}, payload))


def serialize_odometry(stamp_ns: int, xyz, q_xyzw) -> bytes:
    """Test helper: serialize nav_msgs/Odometry (pose only, zero twist)."""
    secs, nsecs = divmod(stamp_ns, 1_000_000_000)
    out = struct.pack("<III", 0, secs, nsecs) + _U32.pack(0)   # header
    out += _U32.pack(0)                                        # child_frame
    out += struct.pack("<7d", *xyz, *q_xyzw)
    out += b"\x00" * (36 * 8)                                  # pose cov
    out += struct.pack("<6d", 0, 0, 0, 0, 0, 0) + b"\x00" * (36 * 8)
    return out


def serialize_pointcloud2(stamp_ns: int, pts: np.ndarray,
                          extra_field: bool = True) -> bytes:
    """Test helper: serialize sensor_msgs/PointCloud2 (xyz f32 +
    optional intensity field to exercise point_step striding)."""
    pts = np.asarray(pts, dtype=np.float32)
    n = len(pts)
    secs, nsecs = divmod(stamp_ns, 1_000_000_000)
    out = struct.pack("<III", 0, secs, nsecs) + _U32.pack(0)
    point_step = 16 if extra_field else 12
    fields = [("x", 0), ("y", 4), ("z", 8)]
    if extra_field:
        fields.append(("intensity", 12))
    out += struct.pack("<II", 1, n)              # height, width
    out += _U32.pack(len(fields))
    for name, off in fields:
        out += _U32.pack(len(name)) + name.encode()
        out += struct.pack("<IBI", off, 7, 1)    # offset, FLOAT32, count
    out += b"\x00"                               # little-endian
    out += struct.pack("<II", point_step, point_step * n)
    data = np.zeros((n, point_step), dtype=np.uint8)
    data[:, 0:12] = pts.view(np.uint8).reshape(n, 12)
    if extra_field:
        data[:, 12:16] = np.ones(n, dtype=np.float32)[:, None].view(
            np.uint8).reshape(n, 4)
    out += _U32.pack(data.size) + data.tobytes()
    out += b"\x01"                               # is_dense
    return out


def serialize_navsatfix(stamp_ns: int, lat, lon, alt) -> bytes:
    """Test helper: serialize sensor_msgs/NavSatFix."""
    secs, nsecs = divmod(stamp_ns, 1_000_000_000)
    out = struct.pack("<III", 0, secs, nsecs) + _U32.pack(0)
    out += struct.pack("<bH", 0, 1)              # status, service
    out += struct.pack("<3d", lat, lon, alt)
    out += b"\x00" * (9 * 8) + b"\x00"           # covariance + type
    return out
