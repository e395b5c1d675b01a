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


def _random_windows(p, k, seed=0):
    from seld_tpu.features.spatial import feature_channels

    c = feature_channels(p.cfg.features.feature_set, p.cfg.model.n_channels)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(
        (k, p.win, c, p.cfg.model.n_mels)
    ).astype(np.float32)


def test_window_batcher_packs_and_matches(tiny_crnn_ckpt):
    """Unit: concurrent requests pack into shared fixed-shape calls and
    every row's result is bit-equal to the solo zero-padded path (the
    row-independence invariant)."""
    import threading

    from seld_tpu.serve import WindowBatcher

    p = SELDPredictor(tiny_crnn_ckpt, batch_windows=4)
    windows = _random_windows(p, 5)
    direct = np.concatenate(list(p._batched(windows, p._forward)), axis=0)

    b = WindowBatcher(p, max_wait_s=0.3)
    outs = {}

    def submit(name, rows):
        outs[name] = b(p._forward, rows)

    threads = [
        threading.Thread(target=submit, args=("a", windows[:3])),
        threading.Thread(target=submit, args=("b", windows[3:])),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    b.close()
    got = np.concatenate([outs["a"], outs["b"]], axis=0)
    np.testing.assert_array_equal(got, direct)
    assert b.rows_run == 5
    # a request larger than batch_windows splits across calls
    b2 = WindowBatcher(p, max_wait_s=0.0)
    big = _random_windows(p, 9, seed=1)
    direct_big = np.concatenate(list(p._batched(big, p._forward)), axis=0)
    np.testing.assert_array_equal(b2(p._forward, big), direct_big)
    assert b2.batches_run == 3  # 4 + 4 + 1
    b2.close()


def test_window_batcher_mixed_fns_never_share(tiny_crnn_ckpt):
    """argmax and probability-grid requests must not share a device call
    (different executables); both still return correct shapes/bits."""
    import threading

    from seld_tpu.serve import WindowBatcher

    p = SELDPredictor(tiny_crnn_ckpt, batch_windows=4)
    w = _random_windows(p, 2, seed=2)
    direct_cls = np.concatenate(list(p._batched(w, p._forward)), axis=0)
    direct_pb = np.concatenate(list(p._batched(w, p._forward_probs)), axis=0)

    b = WindowBatcher(p, max_wait_s=0.2)
    outs = {}
    threads = [
        threading.Thread(target=lambda: outs.setdefault(
            "cls", b(p._forward, w))),
        threading.Thread(target=lambda: outs.setdefault(
            "pb", b(p._forward_probs, w))),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    b.close()
    np.testing.assert_array_equal(outs["cls"], direct_cls)
    np.testing.assert_array_equal(outs["pb"], direct_pb)


def test_batched_server_concurrent_streams_bit_equal(tiny_crnn_ckpt, wave):
    """End-to-end: --batch-streams serving with concurrent clients stays
    bit-equal to the offline predictor for every stream (plain AND
    overlapped)."""
    import threading

    p = SELDPredictor(tiny_crnn_ckpt, batch_windows=4)
    s = SELDServer(p, port=0, batch_streams=True, batch_wait_s=0.05)
    t = s.serve_background()

    results = {}

    def run(name, n, overlap):
        results[name] = stream_client(
            "127.0.0.1", s.port, _chunks(wave, n=n), overlap=overlap
        )[0]

    threads = [
        threading.Thread(target=run, args=("p0", 4000, 0.0)),
        threading.Thread(target=run, args=("p1", 7000, 0.0)),
        threading.Thread(target=run, args=("ov", 6000, 0.5)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    s.shutdown()
    s.server_close()
    assert p.dispatch is None  # server_close must unhook the batcher

    ref_plain = p.predict_waveform(wave)
    ref_ov = p.predict_waveform(wave, overlap=0.5)
    np.testing.assert_array_equal(results["p0"], ref_plain.classes)
    np.testing.assert_array_equal(results["p1"], ref_plain.classes)
    np.testing.assert_array_equal(results["ov"], ref_ov.classes)
    assert s.batcher.rows_run > 0


def test_window_batcher_error_path_drops_leftover_rows(tiny_crnn_ckpt):
    """A device-call failure must (a) raise in every waiting caller,
    (b) not execute the erred request's remaining rows, and (c) leave
    the batcher serving later requests normally."""
    import threading

    from seld_tpu.serve import WindowBatcher

    p = SELDPredictor(tiny_crnn_ckpt, batch_windows=2)
    b = WindowBatcher(p, max_wait_s=0.0)
    calls = []

    def boom(state, chunk):
        calls.append(1)
        raise RuntimeError("device exploded")

    # 5 rows at batch_windows=2: the first call fails; rows 3-5 must be
    # dropped (erred request), not retried in 2 further calls.
    big = _random_windows(p, 5, seed=3)
    err = {}

    def submit():
        try:
            b(boom, big)
        except RuntimeError as e:
            err["e"] = e

    t = threading.Thread(target=submit)
    t.start()
    t.join(timeout=120)
    assert "device exploded" in str(err["e"])
    # a healthy request afterwards still runs (and flushes the deque)
    w = _random_windows(p, 2, seed=4)
    direct = np.concatenate(list(p._batched(w, p._forward)), axis=0)
    np.testing.assert_array_equal(b(p._forward, w), direct)
    b.close()
    assert len(calls) == 1, f"leftover rows were executed: {len(calls)} calls"


def test_window_batcher_packs_pending_without_wait(tiny_crnn_ckpt):
    """Continuous batching at wait=0: requests that arrive while the
    device is busy must pack into ONE shared call when it frees up (the
    non-blocking queue drain), not run one call per request."""
    import threading
    import time

    from seld_tpu.serve import WindowBatcher

    p = SELDPredictor(tiny_crnn_ckpt, batch_windows=4)
    calls = []
    gate = threading.Event()

    def slow_fn(state, chunk):
        calls.append(int(chunk.shape[0]))
        if len(calls) == 1:
            gate.wait(timeout=60)  # hold the device busy
        return p._forward(state, chunk)

    b = WindowBatcher(p, max_wait_s=0.0)
    w = _random_windows(p, 1, seed=5)
    direct = np.concatenate(list(p._batched(w, p._forward)), axis=0)
    outs = {}
    threads = [
        threading.Thread(target=lambda i=i: outs.setdefault(i, b(slow_fn, w)))
        for i in range(4)
    ]
    threads[0].start()
    for _ in range(600):  # wait until the first call holds the device
        if calls:
            break
        time.sleep(0.01)
    assert calls, "first request never reached the device"
    for t in threads[1:]:
        t.start()
    time.sleep(0.3)  # let the other three enqueue while the device is busy
    gate.set()
    for t in threads:
        t.join(timeout=120)
    b.close()
    assert b.batches_run == 2, f"expected 1 solo + 1 packed call, got {calls}"
    assert b.rows_run == 4
    for i in range(4):
        np.testing.assert_array_equal(outs[i], direct)


def test_window_batcher_close_never_strands_callers(tiny_crnn_ckpt):
    """close() while a multi-batch request is in flight must raise in
    the blocked caller (never hang it), and reject later submissions."""
    import threading
    import time

    from seld_tpu.serve import WindowBatcher

    p = SELDPredictor(tiny_crnn_ckpt, batch_windows=4)
    gate = threading.Event()
    started = threading.Event()

    def slow_fn(state, chunk):
        started.set()
        gate.wait(timeout=60)
        return p._forward(state, chunk)

    b = WindowBatcher(p, max_wait_s=0.0)
    big = _random_windows(p, 6, seed=6)  # 2 batches at bw=4
    err = {}

    def submit():
        try:
            b(slow_fn, big)
            err["e"] = None
        except RuntimeError as e:
            err["e"] = e

    t = threading.Thread(target=submit)
    t.start()
    assert started.wait(timeout=60)
    closer = threading.Thread(target=b.close)
    closer.start()
    time.sleep(0.1)
    gate.set()  # let the in-flight batch finish; the worker must then exit
    closer.join(timeout=30)
    t.join(timeout=30)
    assert not t.is_alive(), "caller stranded after close()"
    assert isinstance(err["e"], RuntimeError)
    with pytest.raises(RuntimeError, match="closed"):
        b(p._forward, _random_windows(p, 1, seed=7))


def test_served_stream_from_artifact_matches_offline(tiny_crnn_ckpt, wave,
                                                     tmp_path):
    """The daemon serves an artifact-backed predictor (no checkpoint tree)
    with --batch-streams, bit-equal to the offline artifact predictor AND
    to the checkpoint-backed one."""
    from seld_tpu.export import export_serving

    out = export_serving(tiny_crnn_ckpt, tmp_path / "a.stablehlo",
                         batch_windows=4)
    p = SELDPredictor.from_artifact(out)
    s = SELDServer(p, port=0, max_streams=1, batch_streams=True)
    t = s.serve_background()
    classes, info = stream_client("127.0.0.1", s.port, _chunks(wave))
    t.join(timeout=60)
    s.server_close()
    ref = p.predict_waveform(wave)
    np.testing.assert_array_equal(classes, ref.classes)
    ckpt_ref = SELDPredictor(tiny_crnn_ckpt, batch_windows=4).predict_waveform(wave)
    np.testing.assert_array_equal(classes, ckpt_ref.classes)
