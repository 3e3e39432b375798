"""H-GTCRN: WPE/AuxIVA properties + e2e contract."""
import numpy as np

import jax
import jax.numpy as jnp

from audiojax.nn.spatial import _cg_solve, _solve_2x2, auxiva, wpe
from audiojax.models.h_gtcrn import HGtcrnConfig, h_gtcrn_forward, init_h_gtcrn


def test_cg_solves_hermitian_system():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((1, 3, 8, 8)) + 1j * rng.standard_normal((1, 3, 8, 8))
    r = a @ np.conj(a.swapaxes(-1, -2)) + 8 * np.eye(8)  # HPD
    p = rng.standard_normal((1, 3, 8, 2)) + 1j * rng.standard_normal((1, 3, 8, 2))
    x = np.asarray(_cg_solve(jnp.asarray(r, jnp.complex64), jnp.asarray(p, jnp.complex64), 36))
    np.testing.assert_allclose(r @ x, p, atol=1e-3)


def test_solve_2x2_exact():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((5, 2, 2)) + 1j * rng.standard_normal((5, 2, 2))
    a = a + 2 * np.eye(2)
    b = rng.standard_normal((5, 2, 1)) + 1j * rng.standard_normal((5, 2, 1))
    x = np.asarray(_solve_2x2(jnp.asarray(a, jnp.complex64), jnp.asarray(b, jnp.complex64)))
    np.testing.assert_allclose(a @ x, b, atol=1e-4)


def test_wpe_reduces_reverberant_tail():
    """WPE must move a reverberant mixture toward the dry signal, and leave an
    already-dry (temporally white) signal nearly untouched."""
    rng = np.random.default_rng(2)
    f, t = 16, 60
    dry = rng.standard_normal((1, 2, f, t)) + 1j * rng.standard_normal((1, 2, f, t))
    rev = dry.copy()
    rev[..., 5:] += 0.8 * dry[..., :-5]  # echo at 5-frame lag (>= delay)
    out = np.asarray(wpe(jnp.asarray(rev, jnp.complex64), taps=8, delay=2))
    err_before = np.abs(rev - dry).mean()
    err_after = np.abs(out - dry).mean()
    assert err_after < 0.9 * err_before, (err_before, err_after)
    # dry white input with many frames per tap: prediction is ~0 (the removed
    # energy scales like sqrt(M·taps/T), so keep taps small and T large)
    dry_long = rng.standard_normal((1, 2, 8, 400)) + 1j * rng.standard_normal((1, 2, 8, 400))
    passthru = np.asarray(wpe(jnp.asarray(dry_long, jnp.complex64), taps=4, delay=2))
    assert np.abs(passthru - dry_long).mean() < 0.25 * np.abs(dry_long).mean()


def test_auxiva_separates_instant_mixture():
    """AuxIVA on an instantaneous mixture of two independent sources should
    raise the source-to-interference ratio substantially."""
    rng = np.random.default_rng(3)
    f, t = 12, 200
    s = rng.standard_normal((2, f, t)) + 1j * rng.standard_normal((2, f, t))
    # IVA needs non-gaussian sources with joint-frequency envelopes
    # (speech-like sparsity); stationary gaussians are unidentifiable
    env = np.abs(rng.standard_normal((2, 1, t))) ** 2
    env /= env.mean(axis=-1, keepdims=True)
    s = s * env
    mix_a = np.array([[1.0, 0.6], [0.5, 1.0]])
    x = np.einsum("mn,nft->mft", mix_a, s)[None]
    y = np.asarray(auxiva(jnp.asarray(x, jnp.complex64), n_iter=10))[0]
    # each output should correlate strongly with exactly one source
    def corr(a, b):
        num = np.abs(np.vdot(a, b))
        return num / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    c = np.array([[corr(y[i], s[j]) for j in range(2)] for i in range(2)])
    best = max(c[0, 0] * c[1, 1], c[0, 1] * c[1, 0])
    assert best > 0.8, c


def test_forward_contract():
    cfg = HGtcrnConfig()
    params = init_h_gtcrn(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    audio = jnp.asarray((rng.standard_normal((1, 2, 8192)) * 6000).astype(np.int16))
    out = h_gtcrn_forward(params, audio, cfg)
    assert out.shape == (1, 8192)
    assert out.dtype == jnp.int16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_wpe_short_clip_zero_pads_delay_bank():
    """Clips shorter than delay+taps frames must not crash on negative slice
    stops (fully-shifted-out delay rows become zeros)."""
    import jax.numpy as jnp
    import numpy as np

    from audiojax.nn.spatial import wpe

    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal((1, 2, 5, 16, 2)) @ np.array([1, 1j]))
                    .astype(np.complex64))
    y = wpe(x, taps=18, delay=2, num_iter=1)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y.real)) & jnp.all(jnp.isfinite(y.imag)))
