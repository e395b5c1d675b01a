"""TCP streaming inference server: live audio in, event fragments out.

Completes the serving story around `StreamingSession` (the reference has
no serving path at all — prediction exists only inside its evaluation
loop, ref trainer.py:394-711): a long-lived process loads one checkpoint
onto the TPU and serves any number of sequential/concurrent audio
streams with bounded memory per stream and the session's bit-equality
guarantee (a streamed clip produces exactly the offline predictor's
output).

Protocol (stdlib-only on both sides; see `stream_client` for the
reference client):

  client -> server, once:   one JSON line
      {"channels": C, "sample_rate": SR, "overlap": 0.0}
  client -> server, repeat: 4-byte LE uint32 byte-length N, then N bytes
      of float32 samples laid out (C, n) C-contiguous. N == 0 => flush.
  server -> client:         one JSON line per emitted fragment
      {"start_frame": k, "classes_b64": ..., "shape": [k_frames, G]}
      (classes are the int8 argmax grid, base64-raw), then after flush
      {"done": true, "total_samples": N} and the connection closes.
  errors:                   {"error": "..."} line, connection closes.

Concurrency: each connection runs its own StreamingSession; a process-
wide lock serializes device work (one TPU program at a time — windows
are already batched inside the session, so the lock costs nothing for
single-stream use and degrades gracefully for many).
"""

from __future__ import annotations

import base64
import json
import socket
import socketserver
import struct
import threading

import numpy as np

from seld_tpu.utils.logging import get_logger

_LEN = struct.Struct("<I")
MAX_CHUNK_BYTES = 64 * 1024 * 1024  # sanity bound: ~175 s of 4ch audio


def _read_exact(rfile, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        part = rfile.read(n - len(buf))
        if not part:
            raise ConnectionError("client closed mid-frame")
        buf += part
    return buf


def _fragment_msg(start_frame: int, classes: np.ndarray) -> bytes:
    payload = np.ascontiguousarray(classes, np.int8)
    return (
        json.dumps({
            "start_frame": int(start_frame),
            "shape": list(payload.shape),
            "classes_b64": base64.b64encode(payload.tobytes()).decode(),
        }) + "\n"
    ).encode()


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        server: SELDServer = self.server  # type: ignore[assignment]
        log = get_logger()
        try:
            header = json.loads(self.rfile.readline().decode() or "{}")
            cfg = server.predictor.cfg
            channels = int(header.get("channels", cfg.model.n_channels))
            sr = int(header.get("sample_rate", cfg.features.sample_rate))
            overlap = float(header.get("overlap", 0.0))
            if sr != cfg.features.sample_rate:
                raise ValueError(
                    f"sample rate {sr} != configured {cfg.features.sample_rate}"
                )
            if channels != cfg.model.n_channels:
                raise ValueError(
                    f"channels {channels} != configured {cfg.model.n_channels}"
                )
            from seld_tpu.stream import StreamingSession

            session = StreamingSession(server.predictor, overlap=overlap)
            total = 0
            while True:
                (n,) = _LEN.unpack(_read_exact(self.rfile, _LEN.size))
                if n == 0:
                    break
                if n > MAX_CHUNK_BYTES or n % (4 * channels) != 0:
                    raise ValueError(f"bad chunk byte-length {n}")
                raw = _read_exact(self.rfile, n)
                chunk = np.frombuffer(raw, np.float32).reshape(channels, -1)
                total += chunk.shape[1]
                with server.device_lock:
                    frags = session.push(chunk)
                for start, classes in frags:
                    self.wfile.write(_fragment_msg(start, classes))
                self.wfile.flush()
            with server.device_lock:
                frags = session.flush()
            for start, classes in frags:
                self.wfile.write(_fragment_msg(start, classes))
            done = {"done": True, "total_samples": total}
            self.wfile.write((json.dumps(done) + "\n").encode())
            self.wfile.flush()
            # only COMPLETED streams count toward max_streams — a port
            # scanner or failed handshake must not shut the server down
            server.stream_finished()
        except (ConnectionError, BrokenPipeError):
            pass  # client went away; nothing to report to it
        except Exception as e:  # protocol/shape errors -> tell the client
            log.warning("serve: request failed: %s", e)
            try:
                self.wfile.write(
                    (json.dumps({"error": str(e)}) + "\n").encode()
                )
                self.wfile.flush()
            except OSError:
                pass


class SELDServer(socketserver.ThreadingTCPServer):
    """serve_forever() on a bound port; one thread per connection,
    device work serialized by `device_lock`.

    `max_streams` > 0 shuts the server down after that many connections
    complete — the clean-exit path for benchmarks and for TPU hosts
    where killing a device-attached process wedges the device grant."""

    daemon_threads = True
    allow_reuse_address = True

    def __init__(self, predictor, host: str = "127.0.0.1", port: int = 0,
                 max_streams: int = 0):
        self.predictor = predictor
        self.device_lock = threading.Lock()
        self.max_streams = max_streams
        self._streams_done = 0
        self._count_lock = threading.Lock()
        super().__init__((host, port), _Handler)

    def stream_finished(self):
        with self._count_lock:
            self._streams_done += 1
            if self.max_streams and self._streams_done >= self.max_streams:
                threading.Thread(target=self.shutdown, daemon=True).start()

    @property
    def port(self) -> int:
        return self.server_address[1]

    def serve_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t


def stream_client(host: str, port: int, chunks, overlap: float = 0.0,
                  channels: int | None = None, sample_rate: int | None = None):
    """Reference client: send `chunks` ((C, n) float32 arrays), return
    (classes (T, G) int8, info dict). Raises RuntimeError on a server
    error line."""
    chunks = list(chunks)
    if channels is None:
        channels = chunks[0].shape[0] if chunks else 4
    frags = []
    info: dict = {}
    err: list = []
    with socket.create_connection((host, port)) as sock:
        wf = sock.makefile("wb")
        rf = sock.makefile("rb")

        # read concurrently with sending: the server emits fragments as
        # chunks arrive, and letting them pile into OS socket buffers
        # can deadlock both sides on long streams
        def reader():
            try:
                while True:
                    line = rf.readline()
                    if not line:
                        raise ConnectionError("server closed without done")
                    msg = json.loads(line.decode())
                    if "error" in msg:
                        raise RuntimeError(f"server error: {msg['error']}")
                    if msg.get("done"):
                        info.update(msg)
                        return
                    classes = np.frombuffer(
                        base64.b64decode(msg["classes_b64"]), np.int8
                    ).reshape(msg["shape"])
                    frags.append((msg["start_frame"], classes))
            except Exception as e:  # surfaced to the caller below
                err.append(e)

        t = threading.Thread(target=reader)
        t.start()
        header = {"channels": channels, "overlap": overlap}
        if sample_rate is not None:
            header["sample_rate"] = sample_rate
        try:
            wf.write((json.dumps(header) + "\n").encode())
            wf.flush()
            for chunk in chunks:
                data = np.ascontiguousarray(chunk, np.float32).tobytes()
                wf.write(_LEN.pack(len(data)))
                wf.write(data)
                wf.flush()
            wf.write(_LEN.pack(0))
            wf.flush()
        except OSError:
            # server closed early (error path): the reader thread holds
            # the real reason — fall through to surface it
            pass
        t.join(timeout=600)
        if err:
            raise err[0]
        if t.is_alive():
            raise TimeoutError("no done message within 600 s")

    frags.sort(key=lambda kv: kv[0])
    if frags:
        classes = np.concatenate([c for _, c in frags], axis=0)
    else:
        classes = np.zeros((0, 0), np.int8)
    return classes, info
