"""DFSMN + Kaldi front-end: folded-basis vs naive golden, torch replica of
the UniDeepFsmn stack, streaming state-carry equivalence, e2e contract."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audiojax.frontend.kaldi import KALDI_LOG_EPS, kaldi_analysis_basis, kaldi_mel_banks, log_mel_fbank
from audiojax.models.dfsmn import DfsmnConfig, dfsmn_forward, dfsmn_mask_net, init_dfsmn


def _naive_kaldi_fbank(x, frame_len, hop, nfft, n_mels, fs, preemph=0.97):
    """Straightforward per-frame Kaldi fbank (the algorithm the folded basis
    must reproduce): DC removal -> preemph -> symmetric hamming -> rfft power
    -> mel -> log."""
    n_frames = (len(x) - frame_len) // hop + 1
    k = np.arange(frame_len)
    win = 0.54 - 0.46 * np.cos(2 * np.pi * k / (frame_len - 1))
    feats = []
    for t in range(n_frames):
        fr = x[t * hop : t * hop + frame_len].astype(np.float64)
        fr = fr - fr.mean()
        pre = np.empty_like(fr)
        pre[0] = fr[0] - preemph * fr[0]
        pre[1:] = fr[1:] - preemph * fr[:-1]
        spec = np.fft.rfft(pre * win, nfft)
        feats.append(np.abs(spec) ** 2)
    power = np.stack(feats)
    mel = power @ np.asarray(kaldi_mel_banks(n_mels, nfft, fs), np.float64)
    return np.log(np.maximum(mel, KALDI_LOG_EPS))


def test_folded_fbank_matches_naive():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(48000) * 3000).astype(np.float32)
    ref = _naive_kaldi_fbank(x, 1920, 960, 2048, 120, 48000.0)
    ours = np.asarray(
        log_mel_fbank(jnp.asarray(x)[None], frame_len=1920, hop=960, nfft=2048,
                      n_mels=120, fs=48000.0)
    )[0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_mel_banks_shape_and_partition():
    fb = kaldi_mel_banks(120, 2048, 48000.0)
    assert fb.shape == (1025, 120)
    assert np.all(fb[-1] == 0)  # Nyquist zero row
    sums = fb.sum(axis=1)
    interior = sums[(np.arange(1025) * 48000 / 2048 > 100) & (np.arange(1025) * 48000 / 2048 < 23000)]
    assert np.all(interior > 0.2)  # triangles cover the band


class _TorchUF(torch.nn.Module):
    """ModelScope UniDeepFsmn semantics: x + p1 + causal_depthwise_conv(p1)."""

    def __init__(self, c, lorder):
        super().__init__()
        self.linear = torch.nn.Linear(c, c)
        self.project = torch.nn.Linear(c, c, bias=False)
        self.conv = torch.nn.Conv1d(c, c, lorder, groups=c, bias=False)
        self.lorder = lorder

    def forward(self, x):
        f1 = torch.relu(self.linear(x))
        p1 = self.project(f1)
        y = torch.nn.functional.pad(p1.transpose(1, 2), (self.lorder - 1, 0))
        return x + p1 + self.conv(y).transpose(1, 2)


def test_mask_net_matches_torch_replica():
    torch.manual_seed(0)
    c, mels, bins, lorder, depth = 32, 12, 17, 5, 3
    lin1 = torch.nn.Linear(mels, c)
    lin2 = torch.nn.Linear(c, bins)
    ufs = [_TorchUF(c, lorder) for _ in range(depth)]
    x = torch.randn(2, 25, mels)
    with torch.no_grad():
        h = torch.relu(lin1(x))
        for uf in ufs:
            h = uf(h)
        ref = torch.sigmoid(lin2(h)).numpy()

    layers = []
    for uf in ufs:
        mem_w = uf.conv.weight.detach().numpy()  # (c, 1, lorder)
        mem_w = mem_w.transpose(2, 1, 0).copy()  # (lorder, 1, c)
        mem_w[-1, 0, :] += 1.0  # inner-residual fold
        layers.append(
            {
                "lin": {"w": jnp.asarray(uf.linear.weight.detach().numpy().T),
                        "b": jnp.asarray(uf.linear.bias.detach().numpy())},
                "proj": {"w": jnp.asarray(uf.project.weight.detach().numpy().T)},
                "mem": {"w": jnp.asarray(mem_w)},
            }
        )
    params = {
        "lin1": {"w": jnp.asarray(lin1.weight.detach().numpy().T), "b": jnp.asarray(lin1.bias.detach().numpy())},
        "lin2": {"w": jnp.asarray(lin2.weight.detach().numpy().T), "b": jnp.asarray(lin2.bias.detach().numpy())},
        "layers": layers,
    }
    mask, _ = dfsmn_mask_net(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(mask), ref, atol=1e-5)


def test_streaming_state_carry_matches_full():
    """Chunked streaming with state carry must equal one full causal pass."""
    cfg = DfsmnConfig(depth=3, hidden=32, lorder=6)
    key = jax.random.PRNGKey(1)
    params = init_dfsmn(key, cfg)
    fb = jax.random.normal(key, (1, 30, cfg.n_mels))
    full, _ = dfsmn_mask_net(params, fb)
    m1, st = dfsmn_mask_net(params, fb[:, :11])
    m2, st = dfsmn_mask_net(params, fb[:, 11:23], st)
    m3, _ = dfsmn_mask_net(params, fb[:, 23:], st)
    chunked = jnp.concatenate([m1, m2, m3], axis=1)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), atol=1e-5)


def test_forward_contract():
    cfg = DfsmnConfig(depth=2)  # shallow for test speed
    params = init_dfsmn(jax.random.PRNGKey(0), cfg)
    audio = jnp.asarray((np.random.default_rng(0).standard_normal(50000) * 5000).astype(np.int16)[None])
    out = dfsmn_forward(params, audio, cfg)
    assert out.shape == (1, 50000)
    assert out.dtype == jnp.int16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_streaming_pipeline_bit_exact_vs_zero_padded_offline():
    """The streaming pipeline's semantics: it processes the input as if
    (n_fft - hop) zeros were prepended.  Against the offline path on that
    zero-prepended signal it must match from the first full-overlap sample
    (index hop) onward to within 1 int16 LSB — same frame sequence, same FSMN
    state trajectory, same OLA sums; f32 reassociation between the chunked
    and whole-clip graphs accounts for the LSB."""
    from audiojax.models.dfsmn import dfsmn_stream_init, dfsmn_stream_step

    cfg = DfsmnConfig(depth=2, hidden=32)
    params = init_dfsmn(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(7)
    total = 16 * cfg.hop
    audio = (rng.standard_normal(total) * 6000).astype(np.int16)

    carry = cfg.n_fft - cfg.hop
    padded = np.concatenate([np.zeros(carry, np.int16), audio])
    offline = np.asarray(dfsmn_forward(params, jnp.asarray(padded[None]), cfg))[0]

    state = dfsmn_stream_init(cfg)
    outs = []
    for s in range(0, total, 4 * cfg.hop):
        state, out = dfsmn_stream_step(params, state, jnp.asarray(audio[None, s : s + 4 * cfg.hop]), cfg)
        outs.append(np.asarray(out)[0])
    streamed = np.concatenate(outs)

    np.testing.assert_allclose(
        streamed[cfg.hop : total].astype(np.int32),
        offline[cfg.hop : total].astype(np.int32),
        atol=1,
    )


def test_streaming_pipeline_matches_offline_interior():
    """Past the FSMN receptive field (1 + depth*(lorder-1) frames — the reach
    of the stream's extra zero-context first frame), chunked streaming matches
    the plain offline path with a (n_fft - hop)-sample delay."""
    from audiojax.models.dfsmn import dfsmn_stream_init, dfsmn_stream_step

    cfg = DfsmnConfig(depth=2, hidden=32, lorder=4)
    params = init_dfsmn(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(7)
    total = 32 * cfg.hop
    audio = (rng.standard_normal(total) * 6000).astype(np.int16)

    offline = np.asarray(dfsmn_forward(params, jnp.asarray(audio[None]), cfg))[0]

    state = dfsmn_stream_init(cfg)
    outs = []
    for s in range(0, total, 4 * cfg.hop):
        state, out = dfsmn_stream_step(params, state, jnp.asarray(audio[None, s : s + 4 * cfg.hop]), cfg)
        outs.append(np.asarray(out)[0])
    streamed = np.concatenate(outs)

    delay = cfg.n_fft - cfg.hop
    rf_frames = 1 + cfg.depth * (cfg.lorder - 1)
    lo = (rf_frames + 3) * cfg.hop
    hi = total - cfg.n_fft - delay
    a = offline[lo:hi].astype(np.int32)
    b = streamed[lo + delay : hi + delay].astype(np.int32)
    np.testing.assert_allclose(a, b, atol=1)
