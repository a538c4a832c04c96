"""Wire-protocol validation against the TRUE reference encoder.

tests/data/golden_zmq_frames.bin holds raw multipart ZMQ messages
captured from the REAL reference backend built with its own
NetworkPlot.cpp + vendored zmqpp (tools/golden_frames.py) — not from our
own publisher. Each message is decoded and then RE-ENCODED through our
NetworkPlot publisher; the bytes must match frame-for-frame. That pins
our framing (frame boundaries, scalar types, network byte order —
libs/zmqpp/message.cpp:233-305) to the reference's actual output instead
of to our reading of its source (the round-1/2 self-vs-self gap)."""

import os
import struct

import numpy as np
import pytest

from slam_tpu.runtime.telemetry import NetworkPlot

FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "golden_zmq_frames.bin")


class _CaptureSocket:
    def __init__(self):
        self.sent = []

    def send_multipart(self, frames):
        self.sent.append([bytes(f) for f in frames])

    def close(self):
        pass


def _read_fixture(path):
    with open(path, "rb") as fh:
        assert fh.read(8) == b"SLAMZMQ1"
        (n_msg,) = struct.unpack("<I", fh.read(4))
        out = []
        for _ in range(n_msg):
            (n_fr,) = struct.unpack("<I", fh.read(4))
            frames = []
            for _ in range(n_fr):
                (ln,) = struct.unpack("<I", fh.read(4))
                frames.append(fh.read(ln))
            out.append(frames)
        return out


def _u(fmt, b):
    return struct.unpack(fmt, b)[0]


def _decode_xy(frames):
    n = _u(">i", frames[0])
    xs = [_u(">d", f) for f in frames[1:1 + n]]
    m = _u(">i", frames[1 + n])
    ys = [_u(">d", f) for f in frames[2 + n:2 + n + m]]
    assert len(frames) == 2 + n + m
    return xs, ys


def _decode_matrix(frames):
    rows = _u(">I", frames[0])
    cols = _u(">I", frames[1])
    vals = [_u(">f", f) for f in frames[2:2 + rows * cols]]
    mat = np.array(vals, np.float32).reshape(rows, cols)
    return mat, frames[2 + rows * cols:]


def _reencode(plot: NetworkPlot, tag: str, body):
    """Replay a decoded reference message through OUR publisher."""
    if tag in ("setLandmarks", "setWaypoints", "setParticles",
               "setFeatureParticles"):
        xs, ys = _decode_xy(body)
        getattr(plot, {
            "setLandmarks": "set_landmarks",
            "setWaypoints": "set_waypoints",
            "setParticles": "set_particles",
            "setFeatureParticles": "set_feature_particles"}[tag])(xs, ys)
    elif tag == "setLaserLines":
        mat, rest = _decode_matrix(body)
        assert not rest
        plot.set_laser_lines(mat)
    elif tag == "setCovEllipse":
        mat, rest = _decode_matrix(body)
        assert len(rest) == 1
        plot.set_cov_ellipse(mat, _u(">i", rest[0]))
    elif tag == "addTruePosition":
        plot.add_true_position(_u(">d", body[0]), _u(">d", body[1]))
    elif tag == "addEstimatedPosition":
        plot.add_estimated_position(_u(">d", body[0]),
                                    _u(">d", body[1]))
    elif tag == "setCarTruePosition":
        plot.set_car_true_position(*[_u(">d", f) for f in body])
    elif tag == "setCarEstimatedPosition":
        plot.set_car_estimated_position(*[_u(">d", f) for f in body])
    elif tag == "setCarSize":
        plot.set_car_size(_u(">d", body[0]), _u(">I", body[1]))
    elif tag == "setPlotRange":
        plot.set_plot_range(*[_u(">d", f) for f in body])
    elif tag == "setSimulationName":
        plot.set_simulation_name(body[0].decode())
    elif tag == "plot":
        plot.plot()
    elif tag == "endPlot":
        plot.end_plot()
    elif tag == "clear":
        plot.clear()
    elif tag == "loopTime":
        plot.loop_time(_u(">I", body[0]))
    elif tag == "covEllipseAdd":
        plot.cov_ellipse_add(_u(">I", body[0]))
    else:
        pytest.fail(f"unhandled reference tag {tag!r}")


@pytest.fixture(scope="module")
def golden_messages():
    if not os.path.exists(FIXTURE):
        pytest.skip("golden fixture absent — run tools/golden_frames.py")
    return _read_fixture(FIXTURE)


def test_fixture_covers_the_live_protocol(golden_messages):
    tags = {m[0].decode() for m in golden_messages}
    # Every tag the reference emits during FASTSLAM1 + EKF1 sessions.
    assert {"setLandmarks", "setWaypoints", "setParticles",
            "setFeatureParticles", "setLaserLines", "setCovEllipse",
            "addTruePosition", "addEstimatedPosition",
            "setCarTruePosition", "setCarEstimatedPosition",
            "setCarSize", "setPlotRange", "setSimulationName", "plot",
            "loopTime"} <= tags
    assert len(golden_messages) >= 500


def test_publisher_bytes_match_reference_encoder(golden_messages):
    """Decode -> re-encode every captured message; our frames must be
    byte-identical to the reference's zmqpp output."""
    sock = _CaptureSocket()
    plot = NetworkPlot(socket=sock)
    for i, frames in enumerate(golden_messages):
        tag = frames[0].decode()
        sock.sent.clear()
        _reencode(plot, tag, frames[1:])
        assert len(sock.sent) == 1, (i, tag)
        got = sock.sent[0]
        assert len(got) == len(frames), (
            i, tag, len(got), len(frames))
        for k, (g, w) in enumerate(zip(got, frames)):
            assert g == w, (
                f"msg {i} tag {tag} frame {k}: ours {g.hex()} != "
                f"reference {w.hex()}")
