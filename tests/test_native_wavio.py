"""Native (C++) WAV I/O: build, parity with the stdlib fallback, formats.

The library is compiled on demand from ``csrc/wavio.cc`` (cached per
source hash); these tests skip only when no C++ compiler exists.
"""

import os
import shutil
import struct
import wave

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None and shutil.which("c++") is None,
    reason="no C++ compiler",
)


@pytest.fixture(scope="module")
def wavio():
    from audiocodecs_tpu.native import wavio as m

    assert m.native_wavio_available(), "native wavio failed to build/load"
    return m


def _write_py(path, sig, sr):
    """stdlib-path writer (the fallback in utils/audio.py)."""
    pcm = np.clip(np.asarray(sig, np.float32).T * 32767.0,
                  -32768, 32767).astype("<i2")
    with wave.open(str(path), "wb") as f:
        f.setnchannels(sig.shape[0])
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def test_read_matches_stdlib_pcm16(wavio, tmp_path):
    rng = np.random.default_rng(0)
    sig = (rng.standard_normal((2, 1000)) * 0.3).astype(np.float32)
    p = tmp_path / "a.wav"
    _write_py(p, sig, 16000)

    nat, sr_n = wavio.read_wav_native(str(p))
    with wave.open(str(p), "rb") as f:
        raw = np.frombuffer(f.readframes(f.getnframes()), "<i2")
    ref = (raw.astype(np.float32) / 32768.0).reshape(-1, 2).T
    assert sr_n == 16000
    np.testing.assert_array_equal(nat, ref)


def test_write_byte_identical_to_stdlib(wavio, tmp_path):
    rng = np.random.default_rng(1)
    sig = (rng.standard_normal((1, 4097)) * 0.5).astype(np.float32)
    a, b = tmp_path / "nat.wav", tmp_path / "py.wav"
    wavio.write_wav_native(str(a), sig, 24000)
    _write_py(b, sig, 24000)
    assert a.read_bytes() == b.read_bytes()


def test_float32_wav_roundtrip(wavio, tmp_path):
    """IEEE-float WAV (format tag 3): exact roundtrip — a format the
    stdlib ``wave`` module cannot read at all."""
    rng = np.random.default_rng(2)
    sig = rng.standard_normal((2, 777)).astype(np.float32)
    p = tmp_path / "f32.wav"
    wavio.write_wav_native(str(p), sig, 48000, bits=32)
    back, sr = wavio.read_wav_native(str(p))
    assert sr == 48000
    np.testing.assert_array_equal(back, sig)


def test_pcm24_and_extensible_header(wavio, tmp_path):
    """24-bit samples under a WAVE_FORMAT_EXTENSIBLE header."""
    rng = np.random.default_rng(3)
    vals = rng.integers(-(1 << 23), (1 << 23), size=300, dtype=np.int32)
    frames = b"".join(struct.pack("<i", v)[:3] for v in vals)
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 22050, 22050 * 3, 3, 24)
    fmt += struct.pack("<H", 22)  # cbSize
    fmt += struct.pack("<H", 24)  # valid bits
    fmt += struct.pack("<I", 0x4)  # channel mask
    fmt += struct.pack("<H", 1) + b"\x00" * 14  # subformat GUID (PCM)
    p = tmp_path / "x.wav"
    with open(p, "wb") as f:
        data = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(frames)) + frames)
        f.write(b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data)

    sig, sr = wavio.read_wav_native(str(p))
    assert sr == 22050 and sig.shape == (1, 300)
    np.testing.assert_allclose(
        sig[0], vals.astype(np.float32) / (1 << 23), rtol=0, atol=0)


def test_utils_audio_uses_native(wavio, tmp_path, monkeypatch):
    """utils.audio read/write route through the native library when it is
    available, and agree with the fallback numerics."""
    monkeypatch.delenv("ACX_NATIVE_WAVIO", raising=False)
    from audiocodecs_tpu.utils.audio import read_wav, write_wav

    sig = np.sin(np.linspace(0, 20, 2000, dtype=np.float32))[None] * 0.7
    p = tmp_path / "u.wav"
    write_wav(str(p), sig, 16000)
    back, sr = read_wav(str(p))
    assert sr == 16000 and back.shape == sig.shape
    assert np.max(np.abs(back - sig)) < 2.0 / 32768.0


def test_error_reporting(wavio, tmp_path):
    bad = tmp_path / "not_a.wav"
    bad.write_bytes(b"hello world, definitely not RIFF")
    with pytest.raises(ValueError, match="RIFF"):
        wavio.read_wav_native(str(bad))
    with pytest.raises(ValueError, match="cannot open"):
        wavio.read_wav_native(str(tmp_path / "missing.wav"))
