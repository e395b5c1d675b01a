"""Native (C++) WAV decoder: parity with the Python decoder + the extra
formats only the native path supports (ref dataset.py:18-25 decodes via
torchaudio's C++ backend; seldio.cpp is our native equivalent)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from seld_tpu import native
from seld_tpu.data.audio import load_wav, load_wav_python, write_wav

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native seldio unavailable"
)


def _write_riff(path, fmt_tag, channels, sr, bits, payload, extensible=False):
    """Hand-rolled RIFF writer so tests cover formats stdlib wave can't."""
    if extensible:
        # 40-byte fmt: cbSize=22, valid bits, channel mask, GUID whose first
        # 2 bytes carry the real format tag.
        fmt = struct.pack(
            "<HHIIHHHHI", 0xFFFE, channels, sr, sr * channels * bits // 8,
            channels * bits // 8, bits, 22, bits, 0,
        ) + struct.pack("<H", fmt_tag) + b"\x00\x00" + bytes(12)
    else:
        fmt = struct.pack(
            "<HHIIHH", fmt_tag, channels, sr, sr * channels * bits // 8,
            channels * bits // 8, bits,
        )
    # Include a skippable junk chunk (odd-sized to exercise word alignment).
    junk = b"JUNK" + struct.pack("<I", 5) + b"abcde\x00"
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + junk
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    path.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)


@pytest.fixture
def wave_2ch():
    rng = np.random.default_rng(7)
    return (rng.standard_normal((2, 480)) * 0.5).astype(np.float32)


def test_native_matches_python_16bit(tmp_path, wave_2ch):
    p = tmp_path / "a.wav"
    write_wav(p, wave_2ch, 24000)
    got_n, sr_n = native.decode_wav(p)
    got_p, sr_p = load_wav_python(p, expected_channels=2)
    assert sr_n == sr_p == 24000
    np.testing.assert_array_equal(got_n, got_p)


@pytest.mark.parametrize("bits", [8, 24, 32])
def test_native_matches_python_pcm_widths(tmp_path, wave_2ch, bits):
    n = wave_2ch.shape[1]
    inter = wave_2ch.T.reshape(-1)  # interleaved
    if bits == 8:
        payload = (np.clip(inter * 127, -128, 127) + 128).astype(np.uint8).tobytes()
    elif bits == 24:
        v = np.clip(inter * 8388607, -8388608, 8388607).astype(np.int32)
        b = np.zeros((v.size, 3), np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        payload = b.tobytes()
    else:
        payload = np.clip(
            inter.astype(np.float64) * 2147483647, -2147483648, 2147483647
        ).astype("<i4").tobytes()
    p = tmp_path / f"pcm{bits}.wav"
    _write_riff(p, 1, 2, 24000, bits, payload)
    got_n, sr_n = native.decode_wav(p)
    got_p, sr_p = load_wav_python(p, expected_channels=2)
    assert got_n.shape == (2, n) and sr_n == sr_p == 24000
    np.testing.assert_allclose(got_n, got_p, atol=1e-7)


def test_native_decodes_ieee_float32(tmp_path, wave_2ch):
    p = tmp_path / "f32.wav"
    _write_riff(p, 3, 2, 48000, 32, wave_2ch.T.reshape(-1).tobytes())
    got, sr = native.decode_wav(p)
    assert sr == 48000
    np.testing.assert_array_equal(got, wave_2ch)
    # stdlib wave cannot read IEEE float at all — the native path is the
    # only decoder for this format.
    with pytest.raises(Exception):
        load_wav_python(p, expected_channels=2)
    # ...and the public loader routes it through the native path.
    got2, sr2 = load_wav(p, expected_channels=2)
    np.testing.assert_array_equal(got2, wave_2ch)


def test_native_decodes_ieee_float64(tmp_path, wave_2ch):
    p = tmp_path / "f64.wav"
    payload = wave_2ch.T.reshape(-1).astype("<f8").tobytes()
    _write_riff(p, 3, 2, 16000, 64, payload)
    got, sr = native.decode_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(got, wave_2ch, atol=1e-7)


def test_native_decodes_extensible_pcm16(tmp_path, wave_2ch):
    pcm = np.clip(wave_2ch.T.reshape(-1) * 32767, -32768, 32767).astype("<i2")
    p = tmp_path / "ext.wav"
    _write_riff(p, 1, 2, 24000, 16, pcm.tobytes(), extensible=True)
    got, sr = native.decode_wav(p)
    ref, _ = load_wav(
        _roundtrip_16(tmp_path, wave_2ch), expected_channels=2
    )
    np.testing.assert_array_equal(got, ref)


def _roundtrip_16(tmp_path, w):
    p = tmp_path / "plain16.wav"
    write_wav(p, w, 24000)
    return p


def test_native_rejects_garbage(tmp_path):
    p = tmp_path / "junk.wav"
    p.write_bytes(b"not a riff file at all")
    with pytest.raises(RuntimeError, match="RIFF"):
        native.decode_wav(p)


def test_load_wav_4ch_fixture_uses_same_values(tmp_path):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((4, 1200)) * 0.3).astype(np.float32)
    p = tmp_path / "foa.wav"
    write_wav(p, w, 24000)
    got, sr = load_wav(p)
    assert got.shape == (4, 1200) and sr == 24000
    # write_wav clips to int16 range and truncates; decode divides by
    # 32768 -> up to ~2 LSB of quantization error on the clipped signal.
    np.testing.assert_allclose(
        got, np.clip(w, -1.0, 32767.0 / 32768.0), atol=2.0 / 32768
    )


def test_native_rejects_oversized_data_chunk_quickly(tmp_path):
    """A corrupt header claiming a multi-GB data chunk must error fast
    (no giant allocation), handing off to the Python fallback."""
    import time

    p = tmp_path / "corrupt.wav"
    fmt = struct.pack("<HHIIHH", 1, 4, 24000, 24000 * 8, 8, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0xFFFFFFF0) + b"\x00" * 64)
    p.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
    t0 = time.time()
    with pytest.raises(RuntimeError, match="exceeds file size"):
        native.decode_wav(p)
    assert time.time() - t0 < 1.0


def test_native_rejects_truncated_data_chunk(tmp_path):
    p = tmp_path / "trunc.wav"
    fmt = struct.pack("<HHIIHH", 1, 2, 24000, 24000 * 4, 4, 16)
    payload = b"\x01\x00" * 100  # 100 samples present...
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4000) + payload)  # ...4000 claimed
    p.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(RuntimeError, match="exceeds file size"):
        native.decode_wav(p)


def test_native_rejects_subframe_data_chunk(tmp_path):
    """A structurally valid WAV whose data chunk holds less than one
    interleaved frame must raise a clean 'no frames' error, not a spurious
    out-of-memory from malloc(0) (ADVICE r2)."""
    p = tmp_path / "tiny.wav"
    # 2ch 16-bit => 4 bytes/frame; give it 2 bytes.
    _write_riff(p, 1, 2, 24000, 16, b"\x01\x00")
    with pytest.raises(RuntimeError, match="smaller than one audio frame"):
        native.decode_wav(p)
    # load_wav still works end-to-end via the Python fallback.
    out, sr = load_wav(p, expected_channels=2)
    assert sr == 24000 and out.shape[1] == 0


def test_native_decoder_fuzz_never_crashes(tmp_path):
    """Random garbage and bit-flipped valid files must either decode or
    raise a clean RuntimeError — never crash the process, never hang,
    never allocate beyond the file's own size."""
    import time

    rng = np.random.default_rng(42)
    # a small valid file to mutate
    base = tmp_path / "base.wav"
    w = (rng.standard_normal((2, 300)) * 0.4).astype(np.float32)
    write_wav(base, w, 24000)
    valid = bytearray(base.read_bytes())

    t0 = time.time()
    n_ok = n_err = 0
    for i in range(150):
        if i % 3 == 0:  # pure random blob
            blob = rng.integers(0, 256, rng.integers(0, 400), dtype=np.uint8
                                ).tobytes()
        else:  # mutate the valid file: flip bytes / truncate / extend
            m = bytearray(valid)
            for _ in range(int(rng.integers(1, 8))):
                m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
            if rng.random() < 0.3:
                m = m[: int(rng.integers(1, len(m)))]
            blob = bytes(m)
        p = tmp_path / f"fuzz{i}.wav"
        p.write_bytes(blob)
        try:
            out, sr = native.decode_wav(p)
            assert out.dtype == np.float32 and out.ndim == 2
            n_ok += 1
        except RuntimeError:
            n_err += 1
    assert n_ok + n_err == 150
    assert time.time() - t0 < 30.0  # no pathological slow paths
