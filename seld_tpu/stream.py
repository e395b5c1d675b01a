"""Streaming inference: bounded-memory, chunked audio -> rolling predictions.

The reference has no streaming story (its evaluation materializes every
window of the corpus in host RAM, ref trainer.py:504-531; even this
framework's `SELDPredictor.predict_waveform` computes the whole clip's
features up front). `StreamingSession` accepts waveform chunks of any
size, computes mel frames incrementally with EXACTLY the offline
padding/framing semantics (center/reflect, ref dataset.py:38-44 via
torchaudio defaults), and emits grid predictions window-by-window — so
hours-long audio or a live capture stream runs in O(window) memory.

Exactness contract (pinned by tests/test_stream.py): feeding a clip in
arbitrary chunk sizes yields bit-identical predictions to
`SELDPredictor.predict_waveform(clip)` — interior mel frames never see
the stream boundaries (a frame is only computed once its full n_fft
context has arrived; the clip-start reflection is applied exactly, and
the clip-end reflection at flush()).
"""

from __future__ import annotations

import numpy as np

from seld_tpu.data.corpus import features_from_frames, num_stft_frames
from seld_tpu.infer import Prediction, SELDPredictor


class StreamingSession:
    """One audio stream. push() chunks, collect (start_frame, classes)
    fragments, flush() at end-of-stream.

    With overlap > 0, windows stride at hop = win*(1-overlap) and the
    per-frame representation (class probabilities for grid models,
    vectors for ACCDOA, class-activity votes for multi-ACCDOA — see
    SELDPredictor._rep_from_raw) is averaged over every window covering
    a frame before decoding — the streaming mirror of
    `SELDPredictor.predict_waveform(..., overlap=)` with the identical
    window schedule, accumulation order, and decoder
    (SELDPredictor._decode_avg), so results stay bit-equal. A frame is
    emitted once the last window covering it has run, i.e. with latency
    one window + hop."""

    def __init__(self, predictor: SELDPredictor, overlap: float = 0.0):
        self.p = predictor
        feat = predictor.cfg.features
        self.n_fft = feat.n_fft
        self.hop = feat.hop_length
        self.pad = self.n_fft // 2
        self.win = predictor.win
        self._buf = None  # (C, n) raw samples kept for future frames
        self._buf_start = 0  # absolute index of _buf[:, 0]
        self._total = 0  # absolute samples seen
        self._frames_done = 0  # mel frames computed
        self._mel = None  # (T_pending, C_out, F) frames awaiting windowing
        self._mel_base = 0  # absolute frame index of _mel[0]
        self._emitted_frames = 0  # label frames already emitted
        self._flushed = False

        if overlap:
            if not 0.0 < overlap < 1.0:
                raise ValueError(f"overlap must be in [0, 1), got {overlap}")
            self.whop = max(int(self.win * (1.0 - overlap)), 1)
        else:
            self.whop = None
        self._next_start = 0  # next window start (overlap mode)
        self._prob = None  # (pending, *rep) f32 accumulator (overlap mode)
        self._pcount = None  # (pending, 1...) f32 coverage counts

    # -- mel-frame production ------------------------------------------------

    def _frame_block(self, t0: int, t1: int, end_reflect: bool) -> np.ndarray:
        """(C, t1-t0, n_fft) raw frames t0..t1-1 from the buffer, applying
        the exact offline reflect padding at the clip edges."""
        c = self._buf.shape[0]
        left_need = t0 * self.hop - self.pad
        right_need = (t1 - 1) * self.hop - self.pad + self.n_fft
        seg_start = max(left_need, 0)
        seg = self._buf[:, seg_start - self._buf_start : right_need - self._buf_start]
        if left_need < 0:  # clip start: reflect
            refl = self._buf[:, 1 : 1 - left_need][:, ::-1]
            seg = np.concatenate([refl, seg], axis=1)
        if seg.shape[1] < right_need - left_need:  # clip end (flush)
            assert end_reflect, "interior frame requested past the buffer"
            missing = right_need - left_need - seg.shape[1]
            # Match the offline framer exactly (corpus._frame_view):
            # reflect at most pad samples past the signal end, then ZERO
            # pad whatever the last frame still lacks (possible only for
            # odd n_fft, where n_fft - pad = pad + 1).
            k = min(missing, self.pad, self._buf.shape[1] - 1)
            tail = self._buf[:, -k - 1 : -1][:, ::-1] if k > 0 else (
                np.zeros((c, 0), self._buf.dtype)
            )
            if tail.shape[1] < missing:
                tail = np.pad(tail, ((0, 0), (0, missing - tail.shape[1])))
            seg = np.concatenate([seg, tail], axis=1)
        n = t1 - t0
        seg = np.ascontiguousarray(seg)
        s0, s1 = seg.strides
        return np.lib.stride_tricks.as_strided(
            seg, shape=(c, n, self.n_fft), strides=(s0, self.hop * s1, s1)
        )

    def _produce_frames(self, t1: int, end_reflect: bool = False):
        if t1 <= self._frames_done:
            return
        frames = self._frame_block(self._frames_done, t1, end_reflect)
        mel = features_from_frames(
            np.ascontiguousarray(frames), self.p.cfg.features
        )
        self._mel = mel if self._mel is None else np.concatenate(
            [self._mel, mel], axis=0
        )
        self._frames_done = t1
        # Trim raw buffer: the next frame needs samples from this index on
        # (keep one n_fft of slack for the flush-time end reflection).
        keep_from = max(
            self._frames_done * self.hop - self.pad - self.n_fft, self._buf_start
        )
        if keep_from > self._buf_start:
            self._buf = self._buf[:, keep_from - self._buf_start :]
            self._buf_start = keep_from

    # -- window emission -----------------------------------------------------

    def _emit_ready(self, final: bool):
        """Run every complete (plus, at flush, the final partial) window
        through the predictor in ONE batched pass and emit fragments."""
        if self.whop is not None:
            return self._emit_ready_overlap(final)
        if self._mel is None:
            return []
        pending = self._mel.shape[0]
        n_windows = pending // self.win
        tail = pending - n_windows * self.win
        if final and tail > 0:
            n_windows += 1
        if n_windows == 0:
            return []
        valid = [self.win] * n_windows
        take = n_windows * self.win
        block = self._mel[:take]
        if block.shape[0] < take:  # final partial window: zero-pad (same
            # as predict_waveform's tiling, infer.py)
            valid[-1] = tail
            block = np.concatenate(
                [block, np.zeros((take - block.shape[0], *block.shape[1:]),
                                 block.dtype)]
            )
        windows = block.reshape(n_windows, self.win, *block.shape[1:])
        classes = np.concatenate(
            list(self.p._batched(windows, self.p._forward)), axis=0
        )
        out = []
        for w in range(n_windows):
            out.append((self._emitted_frames, classes[w][: valid[w]]))
            self._emitted_frames += valid[w]
        consumed = sum(valid)
        self._mel = self._mel[consumed:]
        self._mel_base += consumed
        if self._mel.shape[0] == 0:
            self._mel = None
        return out

    def _emit_ready_overlap(self, final: bool):
        """Overlap mode: run every window whose frames are available (at
        flush, the zero-padded tail windows of predict_waveform's exact
        schedule), accumulate probabilities, and emit frames whose
        coverage is complete."""
        T = self._frames_done
        starts = []
        if not final:
            while self._next_start + self.win <= T:
                starts.append(self._next_start)
                self._next_start += self.whop
        else:
            # remaining schedule: grid starts <= max(T-win, 0), plus the
            # offline tail start when the grid stops short of the end
            # (infer.py predict_waveform's starts construction).
            last_grid = max(T - self.win, 0)
            while self._next_start <= last_grid:
                starts.append(self._next_start)
                self._next_start += self.whop
            prev = starts[-1] if starts else (
                self._next_start - self.whop if self._next_start > 0 else None
            )
            if prev is not None and prev + self.win < T:
                starts.append(max(T - self.win, 0))

        frags = []
        if starts:
            pend = (self._mel.shape[0] if self._mel is not None else 0)
            need_through = starts[-1] + self.win  # may exceed T at flush
            assert self._mel is not None  # windows pending => frames kept
            if self._mel_base + pend < need_through:  # zero-pad tail (flush)
                padding = need_through - self._mel_base - pend
                self._mel = np.concatenate([
                    self._mel,
                    np.zeros((padding, *self._mel.shape[1:]), self._mel.dtype),
                ])
            windows = np.stack([
                self._mel[s - self._mel_base : s - self._mel_base + self.win]
                for s in starts
            ])
            probs = np.concatenate(
                list(self.p._batched(windows, self.p._forward_probs)), axis=0
            )
            # grow the accumulator to cover the touched frames
            rep = probs.shape[2:]  # per-frame representation dims
            have = (self._prob.shape[0] if self._prob is not None else 0)
            grow = need_through - self._emitted_frames - have
            if grow > 0:
                z = np.zeros((grow, *rep), np.float32)
                zc = np.zeros((grow,) + (1,) * len(rep), np.float32)
                self._prob = z if self._prob is None else np.concatenate(
                    [self._prob, z])
                self._pcount = zc if self._pcount is None else np.concatenate(
                    [self._pcount, zc])
            for s, p in zip(starts, probs):  # offline accumulation order
                lo = s - self._emitted_frames
                self._prob[lo : lo + self.win] += p.astype(np.float32)
                self._pcount[lo : lo + self.win] += 1.0

        # Frames are final once no future window can cover them: future
        # grid windows start at _next_start, and the flush-time tail
        # window (offline schedule) starts at T_final - win >= T_now - win
        # since T only grows — so mid-stream both bounds apply.
        final_through = T if final else min(
            self._next_start, max(T - self.win, 0)
        )
        n_emit = final_through - self._emitted_frames
        if n_emit > 0 and self._prob is not None:
            n_emit = min(n_emit, self._prob.shape[0])
            avg = self._prob[:n_emit] / np.maximum(self._pcount[:n_emit], 1.0)
            classes = self.p._decode_avg(avg)
            frags.append((self._emitted_frames, classes))
            self._emitted_frames += n_emit
            self._prob = self._prob[n_emit:]
            self._pcount = self._pcount[n_emit:]
        # Trim mel context no future window (grid OR flush tail) can need.
        keep_from = self._next_start if final else min(
            self._next_start, max(T - self.win, 0)
        )
        if self._mel is not None and keep_from > self._mel_base:
            cut = min(keep_from - self._mel_base, self._mel.shape[0])
            self._mel = self._mel[cut:]
            self._mel_base += cut
            if self._mel.shape[0] == 0:
                self._mel = None
        return frags

    # -- public API ------------------------------------------------------------

    def push(self, chunk: np.ndarray):
        """Feed (C, n) samples; returns [(start_frame, classes (k, G))]
        fragments completed by this chunk (possibly empty)."""
        assert not self._flushed, "stream already flushed"
        chunk = np.asarray(chunk, np.float32)
        self._buf = chunk if self._buf is None else np.concatenate(
            [self._buf, chunk], axis=1
        )
        self._total += chunk.shape[1]
        # Interior frames only: frame t needs samples through
        # t*hop + (n_fft - pad) = t*hop + pad. Frame 0 additionally needs
        # pad+1 samples for its start reflection (single fold); clips that
        # never reach that are handled wholesale at flush().
        if self._total < self.pad + 1:
            return []
        t_ready = max(0, (self._total - (self.n_fft - self.pad)) // self.hop + 1)
        self._produce_frames(min(t_ready, num_stft_frames(self._total, self.hop)))
        return self._emit_ready(final=False)

    def flush(self):
        """End of stream: compute the reflect-padded tail frames and emit
        the final (possibly partial) window."""
        assert not self._flushed, "stream already flushed"
        self._flushed = True
        if self._total == 0:
            return []
        if self._frames_done == 0:
            # Nothing produced yet, so the buffer still holds the WHOLE
            # clip — delegate to the offline framer (np.pad reflect),
            # which handles the multi-fold reflections a tiny clip
            # (total <= pad) needs and is trivially bit-exact.
            from seld_tpu.data.corpus import _frame_view

            frames = _frame_view(self._buf, self.n_fft, self.hop)
            mel = features_from_frames(np.ascontiguousarray(frames),
                                       self.p.cfg.features)
            self._mel = mel
            self._frames_done = frames.shape[1]
        else:
            self._produce_frames(
                num_stft_frames(self._total, self.hop), end_reflect=True
            )
        return self._emit_ready(final=True)


def stream_predict(predictor: SELDPredictor, chunks,
                   overlap: float = 0.0) -> Prediction:
    """Convenience: run a whole chunk iterator through a StreamingSession
    and assemble the full-clip Prediction (bit-equal to
    predictor.predict_waveform of the concatenated audio, including with
    overlapped probability averaging)."""
    s = StreamingSession(predictor, overlap=overlap)
    parts = []
    for chunk in chunks:
        parts.extend(cls for _, cls in s.push(chunk))
    parts.extend(cls for _, cls in s.flush())
    cfg = predictor.cfg
    classes = (
        np.concatenate(parts, axis=0)
        if parts else np.zeros((0, cfg.grid.n_cells), np.int8)
    )
    # median_filter applies to the ASSEMBLED grid — the same input the
    # offline path filters, so bit-equality with predict_waveform is
    # preserved by construction (per-fragment emissions above stay raw:
    # a centered filter needs lookahead).
    return Prediction(
        classes=predictor._smooth(classes),
        n_el=cfg.grid.n_el, n_az=cfg.grid.n_az,
        num_classes=cfg.grid.num_classes,
    )
