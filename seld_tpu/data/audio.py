"""Multi-channel WAV decoding — native C++ fast path + stdlib fallback.

Behavior parity with ref dataset.py:18-25 (torchaudio.load): returns
(waveform float32 (channels, samples) scaled to [-1, 1], sample_rate) and
warns when the channel count differs from 4-channel FOA.

The preferred decoder is the native RIFF parser (seld_tpu/native/seldio.cpp
— the analogue of torchaudio's C++ backend), which also handles
IEEE-float and EXTENSIBLE WAVs that the stdlib ``wave`` module rejects.
Any native failure falls back to the pure-Python path below.
"""

from __future__ import annotations

import wave
from pathlib import Path

import numpy as np

from seld_tpu.utils.logging import get_logger


def load_wav(path, expected_channels: int | None = 4):
    """Decode a PCM/float WAV file -> (float32 (C, N) in [-1, 1], sr)."""
    from seld_tpu import native

    if native.native_available():
        try:
            wave_cn, sr = native.decode_wav(path)
            if (
                expected_channels is not None
                and wave_cn.shape[0] != expected_channels
            ):
                get_logger().warning(
                    "Expected %d channels but got %d channels in %s",
                    expected_channels, wave_cn.shape[0], path,
                )
            return wave_cn, sr
        except RuntimeError as e:
            get_logger().warning("native decode failed (%s); python fallback", e)
    return load_wav_python(path, expected_channels)


def load_wav_python(path, expected_channels: int | None = 4):
    """Pure-Python decoder (stdlib ``wave``): PCM 8/16/24/32 only."""
    with wave.open(str(path), "rb") as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        sr = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)

    if sampwidth == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sampwidth == 4:
        # WAVE_FORMAT_PCM 32-bit int (wave module doesn't expose float
        # format; STARSS22 FOA files are PCM).
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sampwidth == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        vals = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        vals = np.where(vals & 0x800000, vals - (1 << 24), vals)
        data = vals.astype(np.float32) / 8388608.0
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth} in {path}")

    wave_cn = data.reshape(n_frames, n_channels).T.copy()
    if expected_channels is not None and n_channels != expected_channels:
        get_logger().warning(
            "Expected %d channels but got %d channels in %s",
            expected_channels,
            n_channels,
            path,
        )
    return wave_cn, sr


def write_wav(path, waveform: np.ndarray, sample_rate: int):
    """Write float32 (C, N) in [-1, 1] as 16-bit PCM (test fixtures)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    c, n = waveform.shape
    pcm = np.clip(waveform * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(c)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.T.tobytes())
