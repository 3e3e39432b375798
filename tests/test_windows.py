"""Window registry vs torch window factories (the reference's golden source,
/root/reference/GTCRN/STFT_Process.py:88-97)."""
import numpy as np
import pytest
import torch

from audiojax.dsp import get_window, padded_window


TORCH_EQUIV = {
    "bartlett": lambda L: torch.bartlett_window(L, periodic=True),
    "blackman": lambda L: torch.blackman_window(L, periodic=True),
    "hamming": lambda L: torch.hamming_window(L, periodic=True),
    "hamming_periodic": lambda L: torch.hamming_window(L, periodic=True),
    "hamming_symmetric": lambda L: torch.hamming_window(L, periodic=False),
    "hann": lambda L: torch.hann_window(L, periodic=True),
    "hann_sqrt": lambda L: torch.hann_window(L, periodic=True).pow(0.5),
    "povey": lambda L: torch.hann_window(L, periodic=False).pow(0.85),
    "kaiser": lambda L: torch.kaiser_window(L, periodic=True, beta=12.0),
}


@pytest.mark.parametrize("name", sorted(TORCH_EQUIV))
@pytest.mark.parametrize("length", [160, 319, 400, 512, 1920])
def test_window_matches_torch(name, length):
    ours = get_window(name, length)
    ref = TORCH_EQUIV[name](length).double().numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_padded_window_center_pad_and_crop():
    w = padded_window("hann", 400, 512)
    assert w.shape == (512,)
    assert np.all(w[:56] == 0) and np.all(w[-56:] == 0)
    np.testing.assert_allclose(w[56:456], get_window("hann", 400))

    w2 = padded_window("hann", 512, 400)
    np.testing.assert_allclose(w2, get_window("hann", 512)[56:456])


def test_unknown_window_falls_back_to_hann():
    np.testing.assert_allclose(get_window("nope", 128), get_window("hann", 128))
