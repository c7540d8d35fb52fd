"""ROS1 .bag reader/writer + EnML bag ingestion tests."""

import numpy as np
import pytest

from hitl_slam_tpu.io import rosbag as rb
from hitl_slam_tpu.io.figure8 import generate_raw_stream

# heavy tier: excluded from the smoke run (-m 'not full', README Testing)
pytestmark = pytest.mark.full


@pytest.fixture(scope="module")
def stream():
    return generate_raw_stream(num_steps=48, num_rays=120, seed=4)


def _cobot_bag_messages(scans, angles, rel):
    """Interleave CobotOdometryMsg deltas with LaserScan messages the way a
    real CoBot bag does (odometry at higher rate than laser)."""
    msgs = []
    t = 100.0
    inc = float(angles[1] - angles[0])
    for i in range(len(scans)):
        if i > 0:
            # split the inter-scan motion into two delta messages
            dr, dx, dy = float(rel[i][2]), float(rel[i][0]), float(rel[i][1])
            half = rb.serialize_cobot_odometry(dr / 2, dx / 2, dy / 2, t)
            msgs.append(("/Cobot/Odometry",
                         "vector_slam_msgs/CobotOdometryMsg", t, half))
            t += 0.01
            # second half is in the frame after the first half-rotation
            c, s = np.cos(dr / 2), np.sin(dr / 2)
            hx, hy = dx / 2, dy / 2
            lx = c * hx + s * hy
            ly = -s * hx + c * hy
            msgs.append(("/Cobot/Odometry",
                         "vector_slam_msgs/CobotOdometryMsg", t,
                         rb.serialize_cobot_odometry(dr / 2, lx, ly, t)))
            t += 0.01
        msgs.append(("laser", "sensor_msgs/LaserScan", t,
                     rb.serialize_laser_scan(scans[i], float(angles[0]), inc,
                                             range_min=0.02, range_max=13.0,
                                             stamp=t)))
        t += 0.03
    return msgs


def test_bag_roundtrip_cobot(stream, tmp_path):
    scans, angles, rel, gt, walls = stream
    path = str(tmp_path / "cobot.bag")
    rb.write_bag(path, _cobot_bag_messages(scans, angles, rel))

    out_scans, out_angles, out_rel, set_loc = rb.bag_to_stream(path)
    assert set_loc == []
    assert out_scans.shape == (len(scans), len(angles))
    # angle_min + i*increment in f32 vs linspace: ~1e-5 rad reconstruction
    np.testing.assert_allclose(out_angles, angles, atol=1e-4)
    # non-finite (no-return) rays stay np.inf so the episode builder's
    # isfinite gate drops them (a finite sentinel would pass any config
    # max_point_cloud_range above it and invent phantom wall points)
    finite = np.isfinite(np.stack(scans))
    assert not np.isfinite(out_scans[~finite]).any()
    np.testing.assert_allclose(out_scans[finite],
                               np.stack(scans)[finite], atol=1e-5)
    # the two half-deltas compose back to the original relative motion
    np.testing.assert_allclose(out_rel[1:], rel[1:], atol=1e-4)
    np.testing.assert_allclose(out_rel[0], 0.0, atol=1e-6)


def test_bag_roundtrip_standardized_bz2(stream, tmp_path):
    """nav_msgs/Odometry absolute poses on 'odom' + bz2 chunk compression +
    a set_location message."""
    scans, angles, rel, gt, walls = stream
    # integrate rel into absolute odometry poses
    absp = np.zeros((len(scans), 3))
    for i in range(1, len(scans)):
        c, s = np.cos(absp[i - 1, 2]), np.sin(absp[i - 1, 2])
        absp[i, 0] = absp[i - 1, 0] + c * rel[i][0] - s * rel[i][1]
        absp[i, 1] = absp[i - 1, 1] + s * rel[i][0] + c * rel[i][1]
        absp[i, 2] = absp[i - 1, 2] + rel[i][2]
    msgs = [("set_location", "vector_slam_msgs/LocalizationMsg", 99.0,
             rb.serialize_localization(3.0, -2.0, 0.5))]
    t = 100.0
    inc = float(angles[1] - angles[0])
    for i in range(len(scans)):
        msgs.append(("odom", "nav_msgs/Odometry", t,
                     rb.serialize_odometry(*absp[i], stamp=t)))
        t += 0.01
        msgs.append(("laser", "sensor_msgs/LaserScan", t,
                     rb.serialize_laser_scan(scans[i], float(angles[0]), inc,
                                             range_max=13.0, stamp=t)))
        t += 0.04
    path = str(tmp_path / "std.bag")
    rb.write_bag(path, msgs, compression="bz2")

    out_scans, out_angles, out_rel, set_loc = rb.bag_to_stream(path)
    assert len(set_loc) == 1
    k, loc = set_loc[0]
    assert k == 0   # arrived before the first laser node
    assert loc == (3.0, -2.0, pytest.approx(0.5, abs=1e-6))
    np.testing.assert_allclose(out_rel[1:], rel[1:], atol=1e-4)


def test_bag_reader_rejects_garbage(tmp_path):
    p = tmp_path / "notabag.bag"
    p.write_bytes(b"this is not a bag file")
    with pytest.raises(ValueError, match="version line"):
        list(rb.read_messages(str(p)))


def test_bag_multichunk_mixed_compression_with_index(stream, tmp_path):
    """Real-bag structure: multiple chunks, ALTERNATING none/bz2 chunk
    compression, per-chunk connection + INDEX_DATA records, and a trailing
    index section (connections + CHUNK_INFO) with a back-patched index_pos
    — all must parse identically to the single-chunk bag (VERDICT r2
    item 1)."""
    import struct

    scans, angles, rel, gt, walls = stream
    msgs = _cobot_bag_messages(scans, angles, rel)
    ref = str(tmp_path / "ref.bag")
    rb.write_bag(ref, msgs)
    path = str(tmp_path / "multi.bag")
    rb.write_bag(path, msgs, compression="mixed", chunk_size=8192)

    blob = open(path, "rb").read()
    # the layout really contains the structures we claim
    ops = [h.get("op", b"\x00")[0]
           for h, _ in rb._iter_records(blob, len(rb.VERSION_LINE))]
    assert ops.count(0x05) > 2                      # several chunks
    assert 0x04 in ops and 0x06 in ops              # index data + chunk info
    assert ops[-1] == 0x06
    # index_pos points at the trailing index section
    hdr, _ = next(rb._iter_records(blob, len(rb.VERSION_LINE)))
    (index_pos,) = struct.unpack("<Q", hdr["index_pos"])
    h2, _ = next(rb._iter_records(blob, index_pos))
    assert h2["op"][0] == 0x07                      # first index record

    a = rb.bag_to_stream(ref)
    b = rb.bag_to_stream(path)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[2], b[2], atol=1e-7)


def test_bag_truncated_tail(stream, tmp_path):
    """A crash-cut bag (the most common real-world quirk) yields every
    complete message before the cut, with a warning — no crash."""
    scans, angles, rel, gt, walls = stream
    msgs = _cobot_bag_messages(scans, angles, rel)
    path = str(tmp_path / "full.bag")
    rb.write_bag(path, msgs, chunk_size=8192)
    blob = open(path, "rb").read()
    cut = str(tmp_path / "cut.bag")
    # cut inside the LAST chunk's data
    open(cut, "wb").write(blob[: int(len(blob) * 0.6)])
    with pytest.warns(UserWarning, match="truncated"):
        out_scans, _, out_rel, _ = rb.bag_to_stream(cut)
    full_scans, _, full_rel, _ = rb.bag_to_stream(path)
    assert 0 < len(out_scans) < len(full_scans)
    np.testing.assert_array_equal(out_scans,
                                  full_scans[: len(out_scans)])


def test_bag_malformed_records_skipped(stream, tmp_path):
    """Corrupt bz2 chunk + malformed message/connection records + a scan
    whose beam count changes mid-bag + an unknown future record op: all
    skipped with warnings, everything parseable still returned."""
    scans, angles, rel, gt, walls = stream
    msgs = _cobot_bag_messages(scans, angles, rel)
    inc = float(angles[1] - angles[0])
    # a beam-count-changing scan and an empty scan injected mid-stream
    msgs.insert(10, ("laser", "sensor_msgs/LaserScan", 99.9,
                     rb.serialize_laser_scan(np.ones(7, np.float32),
                                             float(angles[0]), inc)))
    msgs.insert(11, ("laser", "sensor_msgs/LaserScan", 99.95,
                     rb.serialize_laser_scan(np.zeros(0, np.float32),
                                             float(angles[0]), inc)))
    path = str(tmp_path / "dirty.bag")
    rb.write_bag(path, msgs)
    blob = open(path, "rb").read()
    # append: a corrupt bz2 chunk, a message record with no conn/time, a
    # connection record with no conn id, and an unknown op record
    extra = (
        rb._record({"op": bytes([0x05]), "compression": b"bz2",
                    "size": b"\x10\x00\x00\x00"}, b"NOT-BZ2-DATA")
        + rb._record({"op": bytes([0x02])}, b"orphan")
        + rb._record({"op": bytes([0x07]), "topic": b"ghost"}, b"")
        + rb._record({"op": bytes([0x7F]), "future": b"record"}, b"xyz")
    )
    open(path, "wb").write(blob + extra)
    with pytest.warns(UserWarning):
        out_scans, out_angles, out_rel, _ = rb.bag_to_stream(path)
    assert out_scans.shape == (len(scans), len(angles))
    np.testing.assert_allclose(out_rel[1:], rel[1:], atol=1e-4)


def test_bag_multiple_connections_per_topic(stream, tmp_path):
    """Two connection ids publishing the same laser topic (latched +
    unlatched publishers in real bags): messages from both merge."""
    import struct

    scans, angles, rel, gt, walls = stream
    inc = float(angles[1] - angles[0])
    conn_data = (rb._field("topic", b"laser")
                 + rb._field("type", b"sensor_msgs/LaserScan")
                 + rb._field("md5sum", b"0" * 32)
                 + rb._field("message_definition", b""))
    parts = []
    for cid in (0, 1):
        parts.append(rb._record(
            {"op": bytes([0x07]), "conn": struct.pack("<I", cid),
             "topic": b"laser"}, conn_data))
    for i in range(len(scans)):
        parts.append(rb._record(
            {"op": bytes([0x02]), "conn": struct.pack("<I", i % 2),
             "time": rb._time(100.0 + 0.05 * i)},
            rb.serialize_laser_scan(scans[i], float(angles[0]), inc,
                                     range_max=13.0)))
    chunk = b"".join(parts)
    path = str(tmp_path / "two_conns.bag")
    with open(path, "wb") as f:
        f.write(rb.VERSION_LINE)
        f.write(rb._record({"op": bytes([0x05]), "compression": b"none",
                            "size": struct.pack("<I", len(chunk))}, chunk))
    out_scans, _, _, _ = rb.bag_to_stream(path)
    assert out_scans.shape == (len(scans), len(angles))


def test_bag_end_to_end_enml_to_hitl(stream, tmp_path):
    """The VERDICT acceptance path: cli_enml -b file.bag -o out produces a
    .stfs.covars that the HitL CLI loads and repairs."""
    scans, angles, rel, gt, walls = stream
    path = str(tmp_path / "session.bag")
    rb.write_bag(path, _cobot_bag_messages(scans, angles, rel))

    from hitl_slam_tpu import cli_enml

    out = str(tmp_path / "bagout")
    rc = cli_enml.main(["-b", path, "-o", out, "--max-history", "6"])
    assert rc == 0

    from hitl_slam_tpu.io import stfs

    data = stfs.load_stfs_covars(out + ".stfs.covars")
    assert len(data.poses) > 5
    assert np.isfinite(data.poses).all()

    # the HitL engine ingests the result
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM

    eng = HitLSLAM()
    eng.init(data.poses, data.covariances, data.point_clouds,
             data.normal_clouds, constraint_capacity=256)
    assert eng.get_poses().shape == data.poses.shape


def _messages_and_warnings(path, use_native):
    import warnings as w

    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        msgs = list(rb.read_messages(path, use_native=use_native))
    return msgs, sorted(str(r.message) for r in rec)


def _assert_native_python_equal(path):
    """Native C++ scanner and pure-Python framing must yield bit-identical
    message streams AND identical warning text on the same bag."""
    from hitl_slam_tpu import native

    if not native.bag_available():
        pytest.skip("native bag scanner unavailable")
    nat, nat_warn = _messages_and_warnings(path, True)
    py, py_warn = _messages_and_warnings(path, False)
    assert len(nat) == len(py)
    for a, b in zip(nat, py):
        assert (a.topic, a.msgtype, a.raw) == (b.topic, b.msgtype, b.raw)
        assert a.time == b.time
    assert nat_warn == py_warn


def test_native_scanner_equivalence_clean(stream, tmp_path):
    scans, angles, rel, gt, walls = stream
    path = str(tmp_path / "clean.bag")
    rb.write_bag(path, _cobot_bag_messages(scans, angles, rel))
    _assert_native_python_equal(path)


def test_native_scanner_equivalence_mixed_index(stream, tmp_path):
    scans, angles, rel, gt, walls = stream
    path = str(tmp_path / "multi.bag")
    rb.write_bag(path, _cobot_bag_messages(scans, angles, rel),
                 compression="mixed", chunk_size=8192)
    _assert_native_python_equal(path)


def test_native_scanner_equivalence_truncated(stream, tmp_path):
    scans, angles, rel, gt, walls = stream
    path = str(tmp_path / "full.bag")
    rb.write_bag(path, _cobot_bag_messages(scans, angles, rel),
                 chunk_size=8192)
    blob = open(path, "rb").read()
    for frac, name in ((0.6, "cut_data.bag"), (0.997, "cut_hdr.bag")):
        cut = str(tmp_path / name)
        open(cut, "wb").write(blob[: int(len(blob) * frac)])
        _assert_native_python_equal(cut)
    # 1-3 trailing bytes (status 1)
    tail = str(tmp_path / "tail.bag")
    open(tail, "wb").write(blob + b"\x01\x02")
    _assert_native_python_equal(tail)


def test_native_scanner_equivalence_malformed(stream, tmp_path):
    """Corrupt bz2 chunk, conn-less message, id-less connection, unknown
    future op, duplicate header keys, field without '=', field length
    overrunning the header — the _parse_header quirk set."""
    import struct

    scans, angles, rel, gt, walls = stream
    path = str(tmp_path / "dirty.bag")
    rb.write_bag(path, _cobot_bag_messages(scans, angles, rel))
    blob = open(path, "rb").read()
    # duplicate-key record (last op wins: 0x02 then 0x7F -> unknown, skipped)
    dup_hdr = (rb._field("op", bytes([0x02]))
               + rb._field("conn", struct.pack("<I", 0))
               + rb._field("time", rb._time(1.0))
               + rb._field("op", bytes([0x7F])))
    dup_rec = (struct.pack("<I", len(dup_hdr)) + dup_hdr
               + struct.pack("<I", 3) + b"xyz")
    # field without '=' (ignored) preceding a real op field
    noeq_payload = b"\x04\x00\x00\x00neq!" + rb._field("op", bytes([0x7F]))
    noeq_rec = (struct.pack("<I", len(noeq_payload)) + noeq_payload
                + struct.pack("<I", 1) + b"z")
    # header whose last field length overruns the header end (clamped)
    overrun = rb._field("op", bytes([0x7F])) + b"\xff\x00\x00\x00ov=1"
    overrun_rec = (struct.pack("<I", len(overrun)) + overrun
                   + struct.pack("<I", 1) + b"q")
    # short conn (2 bytes) and short time (4 bytes) on a message record
    short_hdr = (rb._field("op", bytes([0x02])) + rb._field("conn", b"\x01\x00")
                 + rb._field("time", b"\x01\x00\x00\x00"))
    short_rec = (struct.pack("<I", len(short_hdr)) + short_hdr
                 + struct.pack("<I", 2) + b"ab")
    extra = (
        rb._record({"op": bytes([0x05]), "compression": b"bz2",
                    "size": b"\x10\x00\x00\x00"}, b"NOT-BZ2-DATA")
        + rb._record({"op": bytes([0x02])}, b"orphan")
        + rb._record({"op": bytes([0x07]), "topic": b"ghost"}, b"")
        + rb._record({"op": bytes([0x7F]), "future": b"record"}, b"xyz")
        + dup_rec + noeq_rec + overrun_rec + short_rec
    )
    open(path, "wb").write(blob + extra)
    _assert_native_python_equal(path)


def test_native_scanner_equivalence_two_conns(stream, tmp_path):
    import struct

    scans, angles, rel, gt, walls = stream
    inc = float(angles[1] - angles[0])
    conn_data = (rb._field("topic", b"laser")
                 + rb._field("type", b"sensor_msgs/LaserScan")
                 + rb._field("md5sum", b"0" * 32)
                 + rb._field("message_definition", b""))
    parts = []
    for cid in (0, 1):
        parts.append(rb._record(
            {"op": bytes([0x07]), "conn": struct.pack("<I", cid),
             "topic": b"laser"}, conn_data))
    for i in range(8):
        parts.append(rb._record(
            {"op": bytes([0x02]), "conn": struct.pack("<I", i % 2),
             "time": rb._time(100.0 + 0.05 * i)},
            rb.serialize_laser_scan(scans[i], float(angles[0]), inc,
                                     range_max=13.0)))
    chunk = b"".join(parts)
    path = str(tmp_path / "two_conns.bag")
    with open(path, "wb") as f:
        f.write(rb.VERSION_LINE)
        f.write(rb._record({"op": bytes([0x05]), "compression": b"none",
                            "size": struct.pack("<I", len(chunk))}, chunk))
    _assert_native_python_equal(path)


def test_bag_streaming_constant_memory(stream, tmp_path, monkeypatch):
    """read_messages streams chunk-at-a-time: after the first message of a
    multi-chunk bag, only ~the first chunk has been read from disk (no
    whole-file slurp — multi-GB real bags must not need file-sized RAM)."""
    import builtins
    import os

    scans, angles, rel, gt, walls = stream
    msgs = _cobot_bag_messages(scans, angles, rel) * 8
    path = str(tmp_path / "streamy.bag")
    rb.write_bag(path, msgs, chunk_size=16384)
    size = os.path.getsize(path)
    counters = {"read": 0}
    real_open = builtins.open

    class CountingFile:
        def __init__(self, f):
            self._f = f

        def read(self, n=-1):
            b = self._f.read(n)
            counters["read"] += len(b)
            return b

        def seek(self, *a):
            return self._f.seek(*a)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return self._f.__exit__(*a)

        def __getattr__(self, name):
            return getattr(self._f, name)

    def fake_open(p, *a, **k):
        f = real_open(p, *a, **k)
        return CountingFile(f) if p == path else f

    monkeypatch.setattr(builtins, "open", fake_open)
    it = rb.read_messages(path)
    next(it)
    assert counters["read"] < size / 2, (counters["read"], size)
    assert 1 + sum(1 for _ in it) == len(msgs)
    # everything framed exactly once: no over-reading either
    assert counters["read"] <= size


def test_native_scanner_speedup(stream, tmp_path):
    """The native scanner exists for throughput: on a many-record bag it
    must beat the Python framing (sanity bound, not a benchmark)."""
    import time as _t

    from hitl_slam_tpu import native

    if not native.bag_available():
        pytest.skip("native bag scanner unavailable")
    scans, angles, rel, gt, walls = stream
    msgs = _cobot_bag_messages(scans, angles, rel) * 40   # ~5600 records
    path = str(tmp_path / "big.bag")
    rb.write_bag(path, msgs, chunk_size=1 << 20)
    t0 = _t.perf_counter()
    n_nat = sum(1 for _ in rb.read_messages(path, use_native=True))
    t_nat = _t.perf_counter() - t0
    t0 = _t.perf_counter()
    n_py = sum(1 for _ in rb.read_messages(path, use_native=False))
    t_py = _t.perf_counter() - t0
    assert n_nat == n_py == len(msgs)
    # allow noise; typical measured ratio is >>2x
    assert t_nat < t_py


# ---------------------------------------------------------------------------
# topic filtering + index-driven chunk skipping (rosbag::View analog)
# ---------------------------------------------------------------------------

def _noisy_bag_messages(stream, n_blobs=30):
    """A robot-like bag: laser + odometry interleaved with a bulky
    irrelevant topic (camera images dominate real bags)."""
    scans, angles, rel, gt, walls = stream
    msgs = _cobot_bag_messages(scans, angles, rel)
    rng = np.random.default_rng(9)
    out = []
    for i, m in enumerate(msgs):
        out.append(m)
        if i % (len(msgs) // n_blobs + 1) == 0:
            out.append(("/camera/image", "sensor_msgs/Image",
                        m[2] + 0.001, rng.bytes(20000)))
    return out


@pytest.mark.parametrize("use_native", [True, False])
def test_bag_topic_filter_matches_postfilter(stream, tmp_path, use_native):
    msgs = _noisy_bag_messages(stream)
    path = str(tmp_path / "noisy.bag")
    rb.write_bag(path, msgs, compression="bz2", chunk_size=32768)
    want = ("laser", "/Cobot/Odometry")
    full = [m for m in rb.read_messages(path, use_native=use_native)
            if m.topic in want]
    filt = list(rb.read_messages(path, use_native=use_native, topics=want))
    assert len(filt) == len(full) > 0
    for a, b in zip(filt, full):
        assert (a.topic, a.time, a.raw) == (b.topic, b.time, b.raw)


def test_bag_index_skips_irrelevant_chunks(stream, tmp_path, monkeypatch):
    """Topic-segregated chunks that carry no requested topic are never
    DECOMPRESSED when the trailing index is readable."""
    msgs = _noisy_bag_messages(stream)
    # segregate: all camera blobs first, then the robot topics — the
    # camera chunks carry nothing we ask for
    msgs.sort(key=lambda m: (m[0] != "/camera/image", m[2]))
    path = str(tmp_path / "seg.bag")
    rb.write_bag(path, msgs, compression="bz2", chunk_size=32768)

    calls = {"n": 0}
    real = rb._chunk_payload

    def counting(header, data):
        calls["n"] += 1
        return real(header, data)

    monkeypatch.setattr(rb, "_chunk_payload", counting)
    n_all = sum(1 for _ in rb.read_messages(path))
    total_chunks = calls["n"]
    calls["n"] = 0
    want = ("laser", "/Cobot/Odometry", "set_location")
    got = list(rb.read_messages(path, topics=want))
    assert calls["n"] < total_chunks            # camera chunks untouched
    n_cam = sum(1 for m in msgs if m[0] == "/camera/image")
    assert len(got) == n_all - n_cam
    # and the messages themselves match the linear-scan postfilter
    linear = [m for m in rb.read_messages(path) if m.topic in want]
    assert [(m.topic, m.time, m.raw) for m in got] == \
        [(m.topic, m.time, m.raw) for m in linear]


def test_bag_topic_filter_unindexed_fallback(stream, tmp_path):
    """A crash-cut bag (index_pos=0, the reindex case) still serves a
    topic-filtered read via the linear scan."""
    import struct

    msgs = _noisy_bag_messages(stream)
    path = str(tmp_path / "cut.bag")
    rb.write_bag(path, msgs, chunk_size=32768)
    blob = bytearray(open(path, "rb").read())
    # zero the bag header's index_pos back-patch (rosbag's crash marker)
    pos = blob.find(b"index_pos=")
    assert pos > 0
    blob[pos + len(b"index_pos="):pos + len(b"index_pos=") + 8] = bytes(8)
    open(path, "wb").write(bytes(blob))
    want = ("laser",)
    got = list(rb.read_messages(path, topics=want))
    linear = [m for m in rb.read_messages(path) if m.topic in want]
    assert len(got) == len(linear) > 0
    # a DAMAGED index (truncated tail cutting into it) warns and falls back
    cut = str(tmp_path / "cut2.bag")
    full = open(str(tmp_path / "cut.bag"), "rb").read()
    rb.write_bag(cut, msgs, chunk_size=32768)
    blob2 = open(cut, "rb").read()
    open(cut, "wb").write(blob2[:-64])
    with pytest.warns(UserWarning, match="falling back to a linear scan"):
        got2 = list(rb.read_messages(cut, topics=want))
    assert len(got2) == len(linear)
    del full


# ---------------------------------------------------------------------------
# maintenance utilities: reindex + info
# ---------------------------------------------------------------------------

def test_bag_reindex_recovers_crash_cut(stream, tmp_path, monkeypatch):
    """reindex on a crash-cut bag yields a fully indexed bag: identical
    messages, chunk bytes copied verbatim (compression preserved), and the
    rebuilt index actually drives chunk skipping."""
    msgs = _noisy_bag_messages(stream)
    # camera-only chunks at the head AND tail, robot chunks in the middle:
    # the crash cut eats tail cameras; the filtered read must still skip
    # the surviving head cameras while decompressing the robot chunks
    cams = [m for m in msgs if m[0] == "/camera/image"]
    robots = [m for m in msgs if m[0] != "/camera/image"]
    msgs = cams[: len(cams) // 2] + robots + cams[len(cams) // 2:]
    path = str(tmp_path / "full.bag")
    rb.write_bag(path, msgs, compression="bz2", chunk_size=32768)
    blob = open(path, "rb").read()
    cut = str(tmp_path / "cut.bag")
    open(cut, "wb").write(blob[: int(len(blob) * 0.9)])   # inside a chunk

    out = str(tmp_path / "fixed.bag")
    with pytest.warns(UserWarning, match="truncated"):
        n_chunks, n_msgs = rb.reindex(cut, out)
    assert n_chunks > 1 and n_msgs > 0

    with pytest.warns(UserWarning, match="truncated"):
        cut_msgs = [(m.topic, m.time, m.raw)
                    for m in rb.read_messages(cut)]
    fixed_msgs = [(m.topic, m.time, m.raw) for m in rb.read_messages(out)]
    assert fixed_msgs == cut_msgs
    assert len(fixed_msgs) == n_msgs

    info = rb.bag_info(out)
    assert info["indexed"] and info["chunks"] == {"bz2": n_chunks}

    # the rebuilt index skips the camera chunks without decompression
    calls = {"n": 0}
    real = rb._chunk_payload

    def counting(header, data):
        calls["n"] += 1
        return real(header, data)

    monkeypatch.setattr(rb, "_chunk_payload", counting)
    want = ("laser", "/Cobot/Odometry")
    got = list(rb.read_messages(out, topics=want))
    assert 0 < calls["n"] < n_chunks
    assert [(m.topic, m.time, m.raw) for m in got] == \
        [m for m in fixed_msgs if m[0] in want]


def test_bag_laser_topic_selection(stream, tmp_path):
    """The reference subscribes exactly ONE scanner (use_kinect picks
    /Cobot/Kinect/Scan, else the lidar): a bag carrying BOTH must not
    double-ingest, and kinect-only bags need the explicit flag."""
    scans, angles, rel, gt, walls = stream
    inc = float(angles[1] - angles[0])
    msgs = _cobot_bag_messages(scans, angles, rel)
    # interleave kinect scans (half resolution) on their own topic
    lasers = [m for m in msgs if m[0] == "laser"]
    kin = [(rb.KINECT_TOPIC, "sensor_msgs/LaserScan", m[2] + 0.002,
            rb.serialize_laser_scan(scans[i][::2], float(angles[0]),
                                    inc * 2, range_max=13.0))
           for i, m in enumerate(lasers)]
    path = str(tmp_path / "both.bag")
    rb.write_bag(path, sorted(msgs + kin, key=lambda m: m[2]))

    out, out_angles, out_rel, _ = rb.bag_to_stream(path)
    assert out.shape == (len(scans), len(angles))       # lidar only
    kin_out, kin_angles, _, _ = rb.bag_to_stream(
        path, laser_topics=(rb.KINECT_TOPIC,))
    assert kin_out.shape == (len(scans), len(angles[::2]))  # kinect only

    # kinect+odometry bag without the flag: clean error with a hint
    kpath = str(tmp_path / "kin.bag")
    odo = [m for m in msgs if m[0] == "/Cobot/Odometry"]
    rb.write_bag(kpath, sorted(kin + odo, key=lambda m: m[2]))
    with pytest.raises(ValueError, match="use-kinect"):
        rb.bag_to_stream(kpath)

    from hitl_slam_tpu import cli_enml

    o = str(tmp_path / "kout")
    rc = cli_enml.main(["-b", kpath, "--use-kinect", "-o", o,
                        "--max-history", "6"])
    assert rc == 0


def test_bag_reindex_in_place_and_guards(stream, tmp_path):
    """In-place reindex keeps a .orig backup (rosbag-reindex semantics);
    a non-bag input raises WITHOUT touching any output file; top-level
    message records are preserved verbatim."""
    import os
    import struct

    scans, angles, rel, gt, walls = stream
    msgs = _cobot_bag_messages(scans, angles, rel)[:40]
    path = str(tmp_path / "a.bag")
    rb.write_bag(path, msgs, chunk_size=8192)
    before = [(m.topic, m.time, m.raw) for m in rb.read_messages(path)]
    orig_bytes = open(path, "rb").read()

    n_chunks, n_msgs = rb.reindex(path, path)    # in place
    assert os.path.exists(path + ".orig")
    assert open(path + ".orig", "rb").read() == orig_bytes
    after = [(m.topic, m.time, m.raw) for m in rb.read_messages(path)]
    assert after == before and n_msgs == len(before)
    assert not os.path.exists(path + ".reindex.tmp")

    # non-bag input: raises, and the input survives untouched even as out
    garbage = str(tmp_path / "junk.bag")
    open(garbage, "wb").write(b"not a bag at all")
    with pytest.raises(ValueError, match="version line"):
        rb.reindex(garbage, garbage)
    assert open(garbage, "rb").read() == b"not a bag at all"

    # top-level (unchunked) message records survive a reindex
    top = rb._record(
        {"op": bytes([0x02]), "conn": struct.pack("<I", 0),
         "time": rb._time(999.0)}, b"toplevel-payload")
    open(path, "ab").write(top)
    out2 = str(tmp_path / "b.bag")
    with pytest.warns(UserWarning, match="top-level message record"):
        _, n2 = rb.reindex(path, out2)
    assert n2 == len(before) + 1
    msgs2 = list(rb.read_messages(out2))
    assert msgs2[-1].raw == b"toplevel-payload"


def test_online_localizer_set_location_and_flush(stream):
    from hitl_slam_tpu.models.enml.driver import EpisodeOptions
    from hitl_slam_tpu.models.enml.localizer import EnmlOptions
    from hitl_slam_tpu.models.enml.online import OnlineLocalizer

    scans, angles, rel, gt, walls = stream
    loc = OnlineLocalizer(
        EpisodeOptions(clip_low=10, clip_high=10),
        EnmlOptions(max_history=6, gn_iterations=2, match_rounds=1),
    )
    loc.start()
    try:
        loc.set_location(3.0, -2.0, 0.5)
        for i in range(12):
            if i:
                loc.odometry_update(*[float(v) for v in rel[i]])
            loc.sensor_update(scans[i], angles)
        assert loc.flush(timeout=300.0)   # real completion barrier
        poses, clouds, normals = loc.snapshot()
        assert len(poses) == len(clouds) == len(normals) > 0
        # first node anchors exactly at the set_location pose
        np.testing.assert_allclose(poses[0], [3.0, -2.0, 0.5], atol=1e-6)
    finally:
        loc.stop()


def test_bag_info_and_cli(stream, tmp_path, capsys):
    scans, angles, rel, gt, walls = stream
    msgs = _cobot_bag_messages(scans, angles, rel)
    path = str(tmp_path / "info.bag")
    rb.write_bag(path, msgs, compression="mixed", chunk_size=8192)
    info = rb.bag_info(path)
    assert info["messages"] == len(msgs)
    assert info["topics"]["laser"] == len(scans)
    assert info["types"]["laser"] == "sensor_msgs/LaserScan"
    assert info["indexed"]
    assert info["end"] >= info["start"]
    assert sum(info["chunks"].values()) > 2

    assert rb._main(["info", path]) == 0
    out = capsys.readouterr().out
    assert "laser" in out and f"messages: {len(msgs)}" in out

    fixed = str(tmp_path / "re.bag")
    assert rb._main(["reindex", path, "-o", fixed]) == 0
    assert [(m.topic, m.raw) for m in rb.read_messages(fixed)] == \
        [(m.topic, m.raw) for m in rb.read_messages(path)]


# ---------------------------------------------------------------------------
# lz4 chunk compression (roslz4 wire format)
# ---------------------------------------------------------------------------

def _require_lz4():
    from hitl_slam_tpu.io import lz4frame

    if not lz4frame.available():
        pytest.skip("liblz4.so.1 unavailable")
    return lz4frame


def test_xxh32_spec_vectors_and_fallback():
    """Known-answer vectors from the xxHash spec + native-vs-pure-Python
    cross-check on random lengths crossing every tail path."""
    from hitl_slam_tpu.io import lz4frame

    vectors = [(b"", 0, 0x02CC5D05), (b"abc", 0, 0x32D153FF),
               (b"Nobody inspects the spammish repetition", 0, 0xE2293B2F)]
    for data, seed, want in vectors:
        assert lz4frame._xxh32_py(data, seed) == want
        assert lz4frame.xxh32(data, seed) == want
    rng = np.random.default_rng(11)
    for n in (1, 3, 4, 15, 16, 17, 31, 257, 65536, 100001):
        data = rng.integers(0, 256, n, np.uint8).tobytes()
        seed = int(rng.integers(0, 2**32))
        assert lz4frame.xxh32(data, seed) == lz4frame._xxh32_py(data, seed)


def test_lz4_frame_roundtrip():
    lz4frame = _require_lz4()
    rng = np.random.default_rng(12)
    cases = [b"", b"x", b"hello world " * 40000,          # multi-block
             rng.integers(0, 256, 70000, np.uint8).tobytes()]  # stored blocks
    for data in cases:
        enc = lz4frame.compress(data)
        assert lz4frame.decompress(enc) == data
    # corruption in a block body and in the content checksum both raise
    enc = bytearray(lz4frame.compress(b"hello world " * 4000))
    enc[20] ^= 0xFF
    with pytest.raises(ValueError):
        lz4frame.decompress(bytes(enc))
    enc2 = bytearray(lz4frame.compress(b"hello world " * 4000))
    enc2[-1] ^= 0xFF
    with pytest.raises(ValueError, match="content checksum"):
        lz4frame.decompress(bytes(enc2))


def test_lz4_concatenated_and_skippable_frames():
    """An lz4 stream may concatenate frames and interleave skippable
    frames; trailing garbage must raise, not be silently dropped."""
    import struct

    lz4frame = _require_lz4()
    a, b = b"first frame " * 3000, b"second frame " * 2000
    skippable = struct.pack("<II", 0x184D2A50, 7) + b"7 bytes"
    enc = lz4frame.compress(a) + skippable + lz4frame.compress(b)
    assert lz4frame.decompress(enc) == a + b
    with pytest.raises(ValueError, match="magic|garbage"):
        lz4frame.decompress(lz4frame.compress(a) + b"junk after frame")
    with pytest.raises(ValueError, match="garbage"):
        lz4frame.decompress(lz4frame.compress(a) + b"\x01\x02")
    with pytest.raises(ValueError, match="empty"):
        lz4frame.decompress(b"")


def test_lz4_frame_general_features():
    """The reader accepts frames beyond what we write: content-size field,
    per-block checksums, and block-LINKED frames (dict-chained decode)."""
    import ctypes
    import struct

    lz4frame = _require_lz4()
    data = (b"the quick brown fox jumps over the lazy dog. " * 5000)

    # hand-build: FLG = v01 | blockChecksum | contentSize | contentChecksum,
    # LINKED blocks (independence bit CLEAR)
    flg = (1 << 6) | (1 << 4) | (1 << 3) | (1 << 2)
    bd = 0x40
    desc = struct.pack("<BBQ", flg, bd, len(data))
    header = struct.pack("<I", lz4frame._MAGIC) + desc
    parts = [header, bytes([(lz4frame.xxh32(desc) >> 8) & 0xFF])]
    lib = ctypes.CDLL("liblz4.so.1")
    lib.LZ4_createStream.restype = ctypes.c_void_p
    lib.LZ4_compress_fast_continue.restype = ctypes.c_int
    lib.LZ4_compress_fast_continue.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.LZ4_freeStream.argtypes = [ctypes.c_void_p]
    stream = lib.LZ4_createStream()
    held = []   # LZ4_compress_fast_continue requires prior srcs stay mapped
    try:
        for i in range(0, len(data), 1 << 16):
            blk = data[i:i + (1 << 16)]
            held.append(blk)
            dst = ctypes.create_string_buffer((1 << 16) + 256)
            m = lib.LZ4_compress_fast_continue(
                stream, blk, dst, len(blk), len(dst), 1)
            assert m > 0
            parts.append(struct.pack("<I", m))
            parts.append(dst.raw[:m])
            parts.append(struct.pack("<I", lz4frame.xxh32(dst.raw[:m])))
    finally:
        lib.LZ4_freeStream(stream)
    parts.append(struct.pack("<II", 0, lz4frame.xxh32(data)))
    assert lz4frame.decompress(b"".join(parts)) == data


def test_bag_lz4_roundtrip_and_equivalence(stream, tmp_path):
    """lz4-compressed bags parse identically to uncompressed ones, through
    both the native and Python record paths; mixed now cycles all three."""
    _require_lz4()
    scans, angles, rel, gt, walls = stream
    msgs = _cobot_bag_messages(scans, angles, rel)
    ref = str(tmp_path / "ref.bag")
    rb.write_bag(ref, msgs)
    path = str(tmp_path / "lz4.bag")
    rb.write_bag(path, msgs, compression="lz4", chunk_size=8192)
    mixed = str(tmp_path / "mixed.bag")
    rb.write_bag(mixed, msgs, compression="mixed", chunk_size=8192)

    comps = {h.get("compression", b"") for h, _ in
             rb._iter_records(open(mixed, "rb").read(), len(rb.VERSION_LINE))
             if h.get("op", b"\x00")[0] == 0x05}
    assert comps == {b"none", b"bz2", b"lz4"}

    a = rb.bag_to_stream(ref)
    for p in (path, mixed):
        b = rb.bag_to_stream(p)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_allclose(a[2], b[2], atol=1e-7)
        _assert_native_python_equal(p)

    # a corrupt lz4 chunk is skipped with a warning, like corrupt bz2
    blob = open(path, "rb").read()
    bad = blob.replace(b"\x04\x22\x4d\x18", b"\x00\x22\x4d\x18", 1)
    assert bad != blob
    badp = str(tmp_path / "bad.bag")
    open(badp, "wb").write(bad)
    with pytest.warns(UserWarning, match="corrupt lz4 chunk"):
        out = list(rb.read_messages(badp))
    assert 0 < len(out) < len(msgs)


def test_apply_set_locations_midrun():
    """A mid-run re-localization resets the integration state AT its stream
    position (reference LoadSetLocationMessage): poses before the event are
    untouched, pose[k] equals the given map-frame pose, and subsequent
    relative motion is preserved."""
    rng = np.random.default_rng(3)
    T = 12
    rel = np.zeros((T, 3), np.float32)
    rel[1:] = rng.uniform(-0.2, 0.2, (T - 1, 3)).astype(np.float32)
    rel[0] = [1.0, 2.0, 0.3]   # absolute start (driver convention)

    def integrate(r):
        p = np.zeros((T, 3))
        p[0] = r[0]
        for i in range(1, T):
            c, s = np.cos(p[i - 1, 2]), np.sin(p[i - 1, 2])
            p[i] = [p[i - 1, 0] + c * r[i, 0] - s * r[i, 1],
                    p[i - 1, 1] + s * r[i, 0] + c * r[i, 1],
                    p[i - 1, 2] + r[i, 2]]
        return p

    before = integrate(rel)
    L = (5.0, -1.0, 1.2)
    out = rb.apply_set_locations(rel, [(6, L)])
    after = integrate(out)
    # untouched before the event
    np.testing.assert_allclose(after[:6], before[:6], atol=1e-5)
    # pinned at the event
    np.testing.assert_allclose(after[6], L, atol=1e-5)
    # relative motion preserved after the event
    for i in range(7, T):
        np.testing.assert_allclose(out[i], rel[i], atol=1e-5)
