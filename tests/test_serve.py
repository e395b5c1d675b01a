"""Streaming inference server (seld_tpu/serve.py): wire protocol,
bit-equality with offline prediction, overlap mode, error paths, and
concurrent streams."""

from __future__ import annotations

import json
import socket
import struct

import numpy as np
import pytest

from seld_tpu.infer import SELDPredictor
from seld_tpu.serve import SELDServer, stream_client


@pytest.fixture(scope="module")
def server(tiny_crnn_ckpt):
    p = SELDPredictor(tiny_crnn_ckpt, batch_windows=1)
    s = SELDServer(p, port=0)
    s.serve_background()
    yield s
    s.shutdown()
    s.server_close()


def _chunks(wave, n=6000):
    return [wave[:, i : i + n] for i in range(0, wave.shape[1], n)]


@pytest.fixture(scope="module")
def wave(server):
    rng = np.random.default_rng(0)
    return (rng.standard_normal((4, 24000 * 3)) * 0.1).astype(np.float32)


def test_served_stream_is_bit_equal_to_offline(server, wave):
    classes, info = stream_client("127.0.0.1", server.port, _chunks(wave))
    ref = server.predictor.predict_waveform(wave)
    np.testing.assert_array_equal(classes, ref.classes)
    assert info["total_samples"] == wave.shape[1]


def test_served_overlap_matches_offline(server, wave):
    classes, _ = stream_client(
        "127.0.0.1", server.port, _chunks(wave), overlap=0.5
    )
    ref = server.predictor.predict_waveform(wave, overlap=0.5)
    np.testing.assert_array_equal(classes, ref.classes)


def test_sample_rate_mismatch_is_reported(server, wave):
    with pytest.raises(RuntimeError, match="sample rate"):
        stream_client(
            "127.0.0.1", server.port, _chunks(wave), sample_rate=16000
        )


def test_bad_chunk_length_is_reported(server):
    with socket.create_connection(("127.0.0.1", server.port)) as sock:
        f = sock.makefile("rwb")
        f.write(b'{"channels": 4}\n')
        f.write(struct.pack("<I", 7))  # not a multiple of 4*channels
        f.write(b"1234567")
        f.flush()
        msg = json.loads(f.readline().decode())
    assert "error" in msg and "byte-length" in msg["error"]


def test_two_sequential_streams_are_independent(server, wave):
    a, _ = stream_client("127.0.0.1", server.port, _chunks(wave))
    b, _ = stream_client("127.0.0.1", server.port, _chunks(wave, n=9001))
    np.testing.assert_array_equal(a, b)  # chunking must not matter


def test_concurrent_streams(server, wave):
    import threading

    results = {}

    def run(name, n):
        results[name] = stream_client(
            "127.0.0.1", server.port, _chunks(wave, n=n)
        )[0]

    threads = [
        threading.Thread(target=run, args=(f"t{i}", 4000 + 1000 * i))
        for i in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    ref = server.predictor.predict_waveform(wave)
    for name, classes in results.items():
        np.testing.assert_array_equal(classes, ref.classes, err_msg=name)


def test_max_streams_clean_exit(tiny_crnn_ckpt, wave):
    """max_streams=N shuts the server down after N COMPLETED streams —
    the clean-exit path for device-attached hosts and benchmarks.
    Failed probes (health checks, port scans, bad headers) must NOT
    count."""
    p = SELDPredictor(tiny_crnn_ckpt, batch_windows=1)
    s = SELDServer(p, port=0, max_streams=1)
    t = s.serve_background()

    # a bare connect-and-close and a bad-sample-rate handshake: neither
    # is a completed stream
    with socket.create_connection(("127.0.0.1", s.port)):
        pass
    with pytest.raises(RuntimeError, match="sample rate"):
        stream_client("127.0.0.1", s.port, _chunks(wave), sample_rate=1)
    assert t.is_alive(), "failed probes must not consume max_streams"

    classes, _ = stream_client("127.0.0.1", s.port, _chunks(wave))
    assert classes.shape[1] == 648
    t.join(timeout=60)
    assert not t.is_alive(), "server did not shut down after max_streams"
    s.server_close()


def test_served_int8_stream_matches_int8_offline(tiny_crnn_ckpt, wave):
    """The daemon composes with int8 PTQ: a served stream through a
    quantized predictor is bit-equal to the quantized offline path."""
    p = SELDPredictor(tiny_crnn_ckpt, batch_windows=1)
    p.quantize(calib_waves=[wave])
    s = SELDServer(p, port=0, max_streams=1)
    t = s.serve_background()
    classes, _ = stream_client("127.0.0.1", s.port, _chunks(wave))
    ref = p.predict_waveform(wave)
    np.testing.assert_array_equal(classes, ref.classes)
    t.join(timeout=60)
    s.server_close()
