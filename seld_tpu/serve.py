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
import contextlib
import json
import queue
import socket
import socketserver
import struct
import threading
from collections import deque

import numpy as np

from seld_tpu.utils.logging import get_logger

_LEN = struct.Struct("<I")
MAX_CHUNK_BYTES = 64 * 1024 * 1024  # sanity bound: ~175 s of 4ch audio


class _WindowRequest:
    """One stream's window rows awaiting device execution."""

    __slots__ = ("fn", "rows", "out", "next_row", "done_rows", "event", "error")

    def __init__(self, fn, rows: np.ndarray):
        self.fn = fn
        self.rows = rows            # (k, win, C, F)
        self.out = None             # allocated on first result (dtype/shape)
        self.next_row = 0           # rows scheduled into batches so far
        self.done_rows = 0          # rows with results written back
        self.event = threading.Event()
        self.error: BaseException | None = None


class WindowBatcher:
    """Cross-stream continuous batching for the predictor's window forward.

    The predictor runs ONE fixed-shape executable per forward kind
    (`batch_windows` rows — see SELDPredictor._batched). Without
    batching, N concurrent streams pay N device calls even when each
    contributes a single window per push. This dispatcher owns the
    device: stream threads enqueue their window rows and block; a single
    worker packs rows from however many requests are PENDING when the
    device frees up (continuous batching — zero added latency when idle,
    natural batching under load) into one `batch_windows`-row call, then
    scatters results back.

    Correctness rides the same invariant as the streaming bit-equality
    contract: at the fixed batch shape the eval-mode forward is row-wise
    content-independent (verified bitwise for all grid backbones), so a
    row computes identical bits whether its neighbor slots hold zero
    padding (the solo path) or another stream's windows. Requests for
    different forward kinds (argmax vs probability grids, i.e. plain vs
    overlapped streams) never share a call — batches are cut at fn
    boundaries, preserving each executable's identity.

    `max_wait_s` > 0 additionally holds a PARTIAL batch open that long
    to let more streams join (a latency/throughput knob; default 0 keeps
    the continuous-batching property of never delaying a ready device).

    No reference counterpart (the reference has no serving path at all,
    ref trainer.py:394-711 predicts only inside its evaluation loop).
    """

    def __init__(self, predictor, max_wait_s: float = 0.0):
        self.p = predictor
        self.max_wait = float(max_wait_s)
        self.q: queue.Queue = queue.Queue()
        self._pending: deque[_WindowRequest] = deque()
        self._stop = False
        self._stop_lock = threading.Lock()  # orders __call__ vs close()
        self.batches_run = 0
        self.rows_run = 0
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def __call__(self, fn, windows: np.ndarray) -> np.ndarray:
        """Predictor dispatch hook: block until all rows are computed."""
        req = _WindowRequest(fn, np.ascontiguousarray(windows))
        # The lock serializes the stop check with close(): once close()
        # holds it and sets _stop, no request can be enqueued afterwards,
        # so the worker's final drain sees every request ever submitted
        # (nothing can block forever on event.wait()).
        with self._stop_lock:
            if self._stop:
                raise RuntimeError("WindowBatcher is closed")
            self.q.put(req)
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.out

    def close(self):
        with self._stop_lock:
            self._stop = True
            self.q.put(None)  # wake the worker
        self.thread.join(timeout=10)

    # -- worker ----------------------------------------------------------

    def _take(self, timeout):
        """Move one queued request into _pending. False on timeout/stop."""
        try:
            r = self.q.get(timeout=timeout) if timeout else self.q.get_nowait()
        except queue.Empty:
            return False
        if r is None:
            return False
        self._pending.append(r)
        return True

    def _loop(self):
        import time

        try:
            while not self._stop:
                if not self._pending and not self._take(timeout=0.25):
                    continue
                # Requests that arrived while the device was busy are
                # still in self.q — drain it non-blocking so "whatever is
                # pending when the device frees up" really includes them
                # (the continuous-batching property; without this, wait=0
                # batches only ever carry one request's rows).
                while self._take(timeout=0):
                    pass
                # A request that errored in an earlier batch may still
                # sit at the head with unscheduled rows (its caller has
                # already been woken with the error) — drop it rather
                # than burn device calls on rows nobody will read. Erred
                # requests can only be at the head: selection consumes
                # strictly from the front.
                while self._pending and self._pending[0].error is not None:
                    self._pending.popleft()
                if not self._pending:
                    continue
                # Fill up to batch_windows rows from head requests that
                # share the head's executable; cut at a different fn.
                bw = self.p.batch_windows
                fn = self._pending[0].fn
                selected: list[tuple[_WindowRequest, int, int]] = []
                total = 0
                deadline = time.monotonic() + self.max_wait
                while total < bw:
                    while self._pending and total < bw:
                        r = self._pending[0]
                        if r.fn is not fn:
                            break
                        take = min(bw - total, r.rows.shape[0] - r.next_row)
                        selected.append((r, r.next_row, take))
                        r.next_row += take
                        total += take
                        if r.next_row == r.rows.shape[0]:
                            self._pending.popleft()
                    if total >= bw or (
                        self._pending and self._pending[0].fn is not fn
                    ):
                        break
                    wait = deadline - time.monotonic()
                    if wait <= 0 or not self._take(timeout=wait):
                        break
                self._run_batch(fn, selected, total, bw)
        finally:
            # Worker exiting (close(), or an exception escaping the
            # loop): no caller may be left blocked forever. Refuse new
            # requests first, then error-out every unfinished one —
            # __call__'s put is serialized with this flag, so the drain
            # below sees every request ever submitted.
            with self._stop_lock:
                self._stop = True
            self._drain_on_exit()

    def _drain_on_exit(self):
        err = RuntimeError(
            "WindowBatcher closed before this request completed"
        )
        while True:
            try:
                self._pending.append(self.q.get_nowait())
            except queue.Empty:
                break
        for r in self._pending:
            if r is not None:  # skip the close() sentinel
                r.error = r.error or err
                r.event.set()
        self._pending.clear()

    def _run_batch(self, fn, selected, total, bw):
        import jax.numpy as jnp

        # Everything under try: an assembly/scatter failure (shape or
        # dtype mismatch between requests, allocation failure) must
        # surface to the waiting streams, never kill the worker thread
        # silently with callers still blocked.
        try:
            first_rows = selected[0][0].rows
            chunk = np.zeros((bw, *first_rows.shape[1:]), first_rows.dtype)
            pos = 0
            for r, s, n in selected:
                chunk[pos : pos + n] = r.rows[s : s + n]
                pos += n
            res = np.asarray(fn(self.p.state, jnp.asarray(chunk)))
            self.batches_run += 1
            self.rows_run += total
            pos = 0
            for r, s, n in selected:
                if r.out is None:
                    r.out = np.empty(
                        (r.rows.shape[0], *res.shape[1:]), res.dtype
                    )
                r.out[s : s + n] = res[pos : pos + n]
                pos += n
                r.done_rows += n
                if r.done_rows == r.rows.shape[0]:
                    r.event.set()
        except BaseException as e:  # surface to every waiting stream
            for r, _, _ in selected:
                r.error = r.error or e
                r.event.set()


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
                 max_streams: int = 0, batch_streams: bool = False,
                 batch_wait_s: float = 0.0):
        self.predictor = predictor
        self.max_streams = max_streams
        self._streams_done = 0
        self._count_lock = threading.Lock()
        self.batcher = None
        # Continuous batching: the WindowBatcher owns the device for
        # window forwards, so stream threads must NOT serialize on a
        # lock (that would prevent concurrent submission — the whole
        # point). Host-side session state is per-connection and the
        # remaining jitted feature calls are thread-safe in JAX.
        self.device_lock = (contextlib.nullcontext() if batch_streams
                            else threading.Lock())
        super().__init__((host, port), _Handler)
        if batch_streams:
            # Hook the predictor only after the TCP bind succeeded: a
            # bind failure raises out of super().__init__ with no server
            # object to server_close(), and must not leak a running
            # batcher permanently attached to the predictor.
            self.batcher = WindowBatcher(predictor, max_wait_s=batch_wait_s)
            predictor.dispatch = self.batcher

    def server_close(self):
        if self.batcher is not None:
            self.predictor.dispatch = None
            self.batcher.close()
        super().server_close()

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
