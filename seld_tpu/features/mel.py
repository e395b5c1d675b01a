"""On-device log-mel spectrogram front-end.

Parity contract — the reference computes, per channel,
`torchaudio.transforms.MelSpectrogram(sample_rate, n_fft=960, hop_length=480,
n_mels=64)` followed by `AmplitudeToDB()` (ref: dataset.py:27-58). With
torchaudio defaults that means exactly:

  * STFT: win_length = n_fft, periodic Hann window, center=True with
    reflect padding of n_fft//2 on both sides, onesided, power=2 (magnitude
    squared), no normalization. Frame count = 1 + n_samples // hop.
  * Mel filterbank: HTK mel scale (m = 2595 * log10(1 + f/700)), f_min=0,
    f_max=sample_rate/2, triangular filters, NO area normalization
    (norm=None), built over n_fft//2 + 1 linear bins.
  * AmplitudeToDB (power mode, top_db=None, ref_value=1):
    db = 10 * log10(clamp(power_mel, min=1e-10)).

TPU-native design: the whole front-end is one jittable pure function over
all channels at once (the reference loops channels in Python,
ref dataset.py:46-51). Framing exploits n_fft = k * hop to become a
reshape + k shifted views — no gather, no copy beyond XLA fusion. A fused
Pallas kernel (seld_tpu.ops.mel_pallas) implements the same math as
windowed-DFT matmuls on the MXU; this jnp version is its correctness
oracle.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def hann_window(n_fft: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default periodic=True)."""
    n = np.arange(n_fft, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))).astype(dtype)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """(n_freqs, n_mels) triangular HTK-mel filterbank, norm=None.

    Standard HTK construction (the semantics torchaudio's
    melscale_fbanks implements with its defaults): n_mels+2 mel-spaced
    breakpoints; filter m rises linearly from breakpoint m to m+1 and
    falls to m+2.
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs, dtype=np.float64)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)  # (n_mels + 2,)

    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]  # rising edge
    up = slopes[:, 2:] / f_diff[1:]  # falling edge
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def num_stft_frames(n_samples: int, hop_length: int) -> int:
    """Frame count for a center-padded STFT: 1 + n_samples // hop."""
    return 1 + n_samples // hop_length


def frame_signal(x, n_fft: int, hop_length: int):
    """Center-padded overlapping frames of a 1-D signal -> (T, n_fft).

    Reflect-pads n_fft//2 on each side (torch.stft center/reflect
    semantics), then — because n_fft is an integer multiple k of hop —
    builds frames from k shifted views of a (blocks, hop) reshape instead
    of a gather: frame t = blocks[t : t + k] flattened. Pure reshape/slice
    arithmetic, so XLA fuses it into downstream matmuls with no
    materialized copy (SURVEY §7: windowing as reshape arithmetic).
    """
    assert n_fft % hop_length == 0, "front-end requires n_fft % hop == 0"
    k = n_fft // hop_length
    n = x.shape[-1]
    t_frames = num_stft_frames(n, hop_length)

    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    # Zero-pad tail so the last frame's k blocks exist, then view as blocks.
    total = (t_frames + k - 1) * hop_length
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, max(0, total - x.shape[-1]))])
    x = x[..., :total]
    blocks = x.reshape(x.shape[:-1] + (t_frames + k - 1, hop_length))
    frames = jnp.concatenate(
        [blocks[..., i : i + t_frames, :] for i in range(k)], axis=-1
    )
    return frames  # (..., T, n_fft)


def amplitude_to_db(power, amin: float = 1e-10, top_db: float | None = None):
    """Power -> dB: 10 * log10(clamp(x, amin)), optional top_db floor
    relative to the max (torchaudio AmplitudeToDB power semantics;
    the reference uses top_db=None)."""
    db = 10.0 * jnp.log10(jnp.maximum(power, amin))
    if top_db is not None:
        db = jnp.maximum(db, jnp.max(db) - top_db)
    return db


def log_mel_spectrogram(
    waveform,
    sample_rate: int = 24_000,
    n_fft: int = 960,
    hop_length: int = 480,
    n_mels: int = 64,
    f_min: float = 0.0,
    f_max: float | None = None,
    amin: float = 1e-10,
    top_db: float | None = None,
):
    """All-channel log-mel spectrogram: (..., n_samples) -> (..., n_mels, T).

    Output axis order matches the reference's (channels, n_mels, T)
    (ref dataset.py:53-58) so downstream windowing is layout-compatible.
    Jittable; channels/batch dims are vectorized, not looped.
    """
    frames = frame_signal(waveform, n_fft, hop_length)  # (..., T, n_fft)
    window = jnp.asarray(hann_window(n_fft))
    spec = jnp.fft.rfft(frames * window, axis=-1)  # (..., T, n_fft//2+1)
    power = jnp.square(spec.real) + jnp.square(spec.imag)
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max))
    mel = power.astype(jnp.float32) @ fb  # (..., T, n_mels)
    db = amplitude_to_db(mel, amin=amin, top_db=top_db)
    return jnp.swapaxes(db, -1, -2)  # (..., n_mels, T)
