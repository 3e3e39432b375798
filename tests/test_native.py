"""Native C++ runtime (WAV decode + window slicing) vs python references."""
import numpy as np
import pytest

from audiojax.runtime import native
from audiojax.runtime.audio_io import read_wav, to_mono, write_wav

pytestmark = pytest.mark.skipif(not native.available(), reason="g++ toolchain unavailable")


def test_native_wav_decode_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 4000)) * 9000).astype(np.int16)
    p = write_wav(tmp_path / "x.wav", audio, 16000)
    ref, rate_ref = read_wav(p)
    ours, rate = native.read_wav_mono16(p)
    assert rate == rate_ref == 16000
    np.testing.assert_array_equal(ours, to_mono(ref))


def test_native_slice_windows_matches_numpy():
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(10_500) * 8000).astype(np.int16)
    window, stride, pad_head = 4000, 3000, 500
    total = len(audio) + pad_head
    num = int(np.ceil((total - window) / stride)) + 1
    out = native.slice_windows(audio, window, stride, pad_head, num)
    padded = np.concatenate([np.zeros(pad_head, np.int16), audio,
                             np.zeros(max(0, (num - 1) * stride + window - total), np.int16)])
    ref = np.stack([padded[s : s + window] for s in range(0, num * stride, stride)])
    np.testing.assert_array_equal(out, ref)


def test_native_rejects_garbage(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"this is not a wav file at all, sorry")
    with pytest.raises(ValueError, match="invalid WAV"):
        native.read_wav_mono16(p)
