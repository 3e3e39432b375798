"""utils: SNR parity math + RTF measurement."""
import numpy as np

from audiojax.utils import measure_rtf, output_snr, parity_report


def test_output_snr():
    ref = (np.sin(np.arange(4000) / 10) * 10000).astype(np.int16)
    assert output_snr(ref, ref) == float("inf")
    noisy = ref + np.random.default_rng(0).integers(-3, 4, ref.shape).astype(np.int16)
    snr = output_snr(ref, noisy)
    assert 60 < snr < 90
    rep = parity_report(ref, noisy)
    assert rep["passed"] and rep["snr_db"] == round(snr, 2)
    bad = parity_report(ref, np.zeros_like(ref))
    assert not bad["passed"]


def test_measure_rtf_shapes():
    calls = []

    def fn(params, audio):
        calls.append(1)
        return audio

    audio = np.zeros((1, 16000), np.int16)
    out = measure_rtf(fn, {}, audio, sample_rate=16000, iters=3)
    assert out["audio_s"] == 1.0
    assert out["rtf"] > 0
    assert len(calls) == 4  # warmup + 3
