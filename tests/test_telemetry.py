"""Telemetry wire-protocol tests: publisher frames decode exactly as the
stock slam-gui Controller would (Controller.cpp:35-227 dispatch; zmqpp
network-byte-order scalar encoding)."""

import struct
import threading

import numpy as np
import pytest

try:
    from slam_tpu.runtime.telemetry import (
        LibZmq,
        NetworkPlot,
        ZmqPairSocket,
        decode_message,
    )
    LibZmq()
    HAVE_ZMQ = True
except OSError:
    HAVE_ZMQ = False

pytestmark = pytest.mark.skipif(not HAVE_ZMQ,
                                reason="libzmq not available")

ENDPOINT = "tcp://127.0.0.1:45454"


@pytest.fixture
def pair():
    server = ZmqPairSocket(ENDPOINT, bind=True)
    plot = NetworkPlot(socket=ZmqPairSocket(ENDPOINT, bind=False))
    yield server, plot
    plot.close()
    server.close()


def test_scalar_messages_roundtrip(pair):
    server, plot = pair
    plot.add_true_position(1.5, -2.25)
    tag, vals = decode_message(server.recv_multipart())
    assert tag == "addTruePosition"
    assert vals == [1.5, -2.25]

    plot.set_car_estimated_position(0.5, 0.25, 3.0)
    tag, vals = decode_message(server.recv_multipart())
    assert tag == "setCarEstimatedPosition"
    assert vals == [0.5, 0.25, 3.0]

    plot.loop_time(12345)
    tag, vals = decode_message(server.recv_multipart())
    assert tag == "loopTime" and vals == [12345]


def test_xy_array_encoding(pair):
    """sendXYArrays layout: i32 n, n doubles, i32 m, m doubles — every
    scalar its own network-order frame (NetworkPlot.cpp:22-34)."""
    server, plot = pair
    plot.set_landmarks([1.0, 2.0], [3.0, 4.0, 5.0])
    frames = server.recv_multipart()
    assert frames[0] == b"setLandmarks"
    assert struct.unpack(">i", frames[1])[0] == 2
    assert struct.unpack(">d", frames[2])[0] == 1.0
    assert struct.unpack(">d", frames[3])[0] == 2.0
    assert struct.unpack(">i", frames[4])[0] == 3
    assert [struct.unpack(">d", f)[0] for f in frames[5:8]] == [3., 4., 5.]


def test_matrix_encoding(pair):
    """Float-matrix layout: u32 rows, u32 cols, row-major f32 frames
    (NetworkPlot.cpp:68-98); setCovEllipse appends i32 idx."""
    server, plot = pair
    mat = np.arange(8, dtype=np.float32).reshape(4, 2)
    plot.set_cov_ellipse(mat, idx=7)
    frames = server.recv_multipart()
    assert frames[0] == b"setCovEllipse"
    assert struct.unpack(">I", frames[1])[0] == 4
    assert struct.unpack(">I", frames[2])[0] == 2
    vals = [struct.unpack(">f", f)[0] for f in frames[3:11]]
    assert vals == list(range(8))
    assert struct.unpack(">i", frames[11])[0] == 7


def test_control_messages(pair):
    server, plot = pair
    plot.plot()
    assert server.recv_multipart() == [b"plot"]
    plot.set_simulation_name("hello")
    assert server.recv_multipart() == [b"setSimulationName", b"hello"]
    plot.end_plot()
    assert server.recv_multipart() == [b"endPlot"]


def test_streaming_run_emits_protocol(tmp_path):
    """A short EKF streaming run against a local PAIR receiver produces
    the expected message sequence (setup + per-superstep emission)."""
    from slam_tpu.config import SlamConfig
    from slam_tpu.maps import read_map_file
    from slam_tpu.runtime import Runner

    server = ZmqPairSocket("tcp://127.0.0.1:45455", bind=True)
    received = []

    def drain():
        while True:
            frames = server.recv_multipart()
            received.append(frames[0].decode())
            if frames[0] == b"endPlot":
                return

    t = threading.Thread(target=drain, daemon=True)
    t.start()

    slam_map = read_map_file("/root/reference/data/example_loop1.mat")
    cfg = SlamConfig.from_ini("/root/reference/data/example_loop1.ini")
    runner = Runner(cfg, slam_map, "EKF1")
    plot = NetworkPlot(socket=ZmqPairSocket("tcp://127.0.0.1:45455",
                                            bind=False))
    result = runner.run_streaming(seed=1, n_ticks=160, plot=plot)
    plot.close()
    t.join(timeout=30)
    server.close()

    assert "setPlotRange" in received
    assert "setLandmarks" in received and "setWaypoints" in received
    assert received.count("plot") == len(result.true_pose)
    assert received.count("addTruePosition") == len(result.true_pose)
    assert "setLaserLines" in received
    assert "covEllipseAdd" in received      # EKF ellipse path
    assert received[-1] == "endPlot"
