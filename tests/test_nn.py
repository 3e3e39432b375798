"""NN core blocks vs torch golden implementations."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audiojax.nn import core, rnn
from audiojax.nn.erb import erb_compress, erb_expand, erb_filters
from audiojax.dsp.pcm import pcm_in, pcm_out, resample_linear


def _t2j_conv2d_w(w):  # torch (out, in/g, kh, kw) -> HWIO (kh, kw, in/g, out)
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def _t2j_conv1d_w(w):  # torch (out, in/g, k) -> WIO
    return jnp.asarray(w.detach().numpy().transpose(2, 1, 0))


@pytest.mark.parametrize("groups,dilation,stride,pad", [(1, 1, 1, 1), (2, 1, 2, 2), (4, 2, 1, 2)])
def test_conv2d_matches_torch(groups, dilation, stride, pad):
    torch.manual_seed(0)
    m = torch.nn.Conv2d(8, 16, (3, 5), stride=(1, stride), padding=(pad, 2), dilation=(dilation, 1), groups=groups)
    x = torch.randn(2, 8, 10, 20)
    ref = m(x).detach().numpy()
    p = {"w": _t2j_conv2d_w(m.weight), "b": jnp.asarray(m.bias.detach().numpy())}
    y = core.conv2d(p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    stride=(1, stride), padding=(pad, 2), dilation=(dilation, 1), groups=groups)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-5)


@pytest.mark.parametrize("groups,dilation,pad", [(1, 1, 0), (2, 1, 2), (1, 5, 10)])
def test_conv2d_transpose_matches_torch(groups, dilation, pad):
    torch.manual_seed(1)
    m = torch.nn.ConvTranspose2d(16, 16, (3, 3), stride=(1, 1), padding=(pad, 1), dilation=(dilation, 1), groups=groups)
    x = torch.randn(1, 16, 12 + 2 * dilation, 33)
    ref = m(x).detach().numpy()
    p = {"w": jnp.asarray(core.deconv_kernel(m.weight.detach().numpy(), groups)),
         "b": jnp.asarray(m.bias.detach().numpy())}
    y = core.conv2d_transpose(p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                              stride=(1, 1), padding=(pad, 1), dilation=(dilation, 1), groups=groups)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_conv2d_transpose_stride_matches_torch():
    torch.manual_seed(2)
    m = torch.nn.ConvTranspose2d(16, 2, (1, 5), stride=(1, 2), padding=(0, 2))
    x = torch.randn(1, 16, 7, 65)
    ref = m(x).detach().numpy()
    p = {"w": jnp.asarray(core.deconv_kernel(m.weight.detach().numpy())),
         "b": jnp.asarray(m.bias.detach().numpy())}
    y = core.conv2d_transpose(p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                              stride=(1, 2), padding=(0, 2))
    assert y.shape[2] == 129
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_conv1d_matches_torch():
    torch.manual_seed(3)
    m = torch.nn.Conv1d(6, 12, 20, stride=1, padding=19, dilation=1, groups=6)
    x = torch.randn(2, 6, 50)
    ref = m(x).detach().numpy()
    p = {"w": _t2j_conv1d_w(m.weight), "b": jnp.asarray(m.bias.detach().numpy())}
    y = core.conv1d(p, jnp.asarray(x.numpy().transpose(0, 2, 1)), padding=19, groups=6)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=1e-5)


@pytest.mark.parametrize("k,pad,dilation", [(20, 19, 1), (7, 3, 1), (5, 8, 2)])
def test_conv1d_depthwise_fast_path_matches_torch(k, pad, dilation):
    """True depthwise (multiplier 1) hits the unrolled shift-and-scale path;
    it must match torch exactly like the lax path does."""
    torch.manual_seed(4)
    c = 16
    m = torch.nn.Conv1d(c, c, k, padding=pad, dilation=dilation, groups=c)
    x = torch.randn(2, c, 40)
    ref = m(x).detach().numpy()
    p = {"w": _t2j_conv1d_w(m.weight), "b": jnp.asarray(m.bias.detach().numpy())}
    assert p["w"].shape == (k, 1, c)  # confirms the fast-path predicate
    y = core.conv1d(p, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                    padding=pad, dilation=dilation, groups=c)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=1e-5)


def test_conv1d_depthwise_fast_path_bf16_accumulates_f32():
    """bf16 inputs through the unrolled path must not round tap-by-tap: the
    f32 accumulator keeps error at single-rounding level (~0.5% mean)."""
    rng = np.random.default_rng(7)
    c, k, t = 32, 39, 60
    x = rng.standard_normal((2, t, c)).astype(np.float32)
    w = (rng.standard_normal((k, 1, c)) * 0.2).astype(np.float32)
    p32 = {"w": jnp.asarray(w)}
    ref = np.asarray(core.conv1d(p32, jnp.asarray(x), padding=(k - 1) // 2, groups=c))
    pb = {"w": jnp.asarray(w, jnp.bfloat16)}
    out = np.asarray(core.conv1d(pb, jnp.asarray(x, jnp.bfloat16),
                                 padding=(k - 1) // 2, groups=c)).astype(np.float32)
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-3)
    assert rel.mean() < 0.01, rel.mean()

    # mismatched dtypes fail at trace time, like the lax branch
    with pytest.raises(TypeError, match="dtype mismatch"):
        core.conv1d(p32, jnp.asarray(x, jnp.bfloat16), padding=(k - 1) // 2, groups=c)


@pytest.mark.parametrize("m,dil", [(2, 1), (3, 2)])
def test_conv1d_grouped_single_out_fast_path_matches_torch(m, dil):
    """Grouped conv with one output channel per group (the MossFormer2-SS
    dilated dense-FSMN memory shape) hits the generalised shift path."""
    torch.manual_seed(6)
    g, k = 12, 9
    conv = torch.nn.Conv1d(g * m, g, k, padding=dil * (k - 1) // 2, dilation=dil,
                           groups=g, bias=False)
    x = torch.randn(2, g * m, 37)
    ref = conv(x).detach().numpy()
    p = {"w": _t2j_conv1d_w(conv.weight)}
    assert p["w"].shape == (k, m, g)
    y = core.conv1d(p, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                    padding=dil * (k - 1) // 2, dilation=dil, groups=g)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=1e-5)


@pytest.mark.parametrize("kh,kw,pad,dil", [(1, 39, (0, 19), (1, 1)), (3, 3, (2, 1), (2, 1))])
def test_conv2d_depthwise_fast_path_matches_torch(kh, kw, pad, dil):
    torch.manual_seed(5)
    c = 8
    m = torch.nn.Conv2d(c, c, (kh, kw), padding=pad, dilation=dil, groups=c)
    x = torch.randn(1, c, 9, 50)
    ref = m(x).detach().numpy()
    p = {"w": _t2j_conv2d_w(m.weight), "b": jnp.asarray(m.bias.detach().numpy())}
    assert p["w"].shape == (kh, kw, 1, c)
    y = core.conv2d(p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    padding=pad, dilation=dil, groups=c)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-5)


def _torch_gru_params(m, suffix=""):
    return {
        "w_i": jnp.asarray(getattr(m, f"weight_ih_l0{suffix}").detach().numpy().T),
        "w_h": jnp.asarray(getattr(m, f"weight_hh_l0{suffix}").detach().numpy().T),
        "b_i": jnp.asarray(getattr(m, f"bias_ih_l0{suffix}").detach().numpy()),
        "b_h": jnp.asarray(getattr(m, f"bias_hh_l0{suffix}").detach().numpy()),
    }


def test_gru_matches_torch():
    torch.manual_seed(4)
    m = torch.nn.GRU(8, 16, 1, batch_first=True)
    x = torch.randn(3, 25, 8)
    ref, ref_h = m(x)
    y, h = rnn.gru(_torch_gru_params(m), jnp.asarray(x.numpy()), return_state=True)
    np.testing.assert_allclose(np.asarray(y), ref.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), ref_h.detach().numpy()[0], atol=1e-5)


def test_gru_bidir_matches_torch():
    torch.manual_seed(5)
    m = torch.nn.GRU(8, 4, 1, batch_first=True, bidirectional=True)
    x = torch.randn(2, 15, 8)
    ref, _ = m(x)
    y = rnn.gru_bidir(_torch_gru_params(m), _torch_gru_params(m, "_reverse"), jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), ref.detach().numpy(), atol=1e-5)


def test_grouped_gru_matches_two_torch_grus():
    torch.manual_seed(6)
    m1 = torch.nn.GRU(8, 8, 1, batch_first=True)
    m2 = torch.nn.GRU(8, 8, 1, batch_first=True)
    x = torch.randn(2, 20, 16)
    x1, x2 = x.split(8, dim=-1)
    ref = torch.cat([m1(x1)[0], m2(x2)[0]], dim=-1).detach().numpy()
    stacked = {
        k: jnp.stack([_torch_gru_params(m1)[k], _torch_gru_params(m2)[k]])
        for k in ("w_i", "w_h", "b_i", "b_h")
    }
    y = rnn.grouped_gru(stacked, jnp.asarray(x.numpy()), groups=2)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


def test_lstm_matches_torch():
    torch.manual_seed(7)
    m = torch.nn.LSTM(10, 12, 1, batch_first=True)
    x = torch.randn(2, 18, 10)
    ref, _ = m(x)
    p = {
        "w_i": jnp.asarray(m.weight_ih_l0.detach().numpy().T),
        "w_h": jnp.asarray(m.weight_hh_l0.detach().numpy().T),
        "b_i": jnp.asarray(m.bias_ih_l0.detach().numpy()),
        "b_h": jnp.asarray(m.bias_hh_l0.detach().numpy()),
    }
    y = rnn.lstm(p, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), ref.detach().numpy(), atol=1e-5)


def test_layer_norm_2d_matches_torch():
    torch.manual_seed(8)
    m = torch.nn.LayerNorm((33, 16), eps=1e-8)
    with torch.no_grad():
        m.weight.uniform_(0.5, 1.5)
        m.bias.uniform_(-0.5, 0.5)
    x = torch.randn(2, 7, 33, 16)
    ref = m(x).detach().numpy()
    p = {"g": jnp.asarray(m.weight.detach().numpy()), "b": jnp.asarray(m.bias.detach().numpy())}
    y = core.layer_norm(p, jnp.asarray(x.numpy()), ndims=2, eps=1e-8)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


def test_prelu_matches_torch():
    m = torch.nn.PReLU(16, init=0.2)
    with torch.no_grad():
        m.weight.uniform_(0.1, 0.4)
    x = torch.randn(2, 16, 5)  # torch PReLU is per-channel on dim 1
    ref = m(x).detach().numpy()
    y = core.prelu({"alpha": jnp.asarray(m.weight.detach().numpy())}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=1e-6)


@pytest.mark.parametrize("scale", [0.5, 2.0, 3.0, 1.0 / 3.0])
def test_resample_linear_matches_torch(scale):
    x = torch.randn(1, 1, 300)
    ref = torch.nn.functional.interpolate(x, scale_factor=scale, mode="linear", align_corners=False)
    out_len = ref.shape[-1]
    y = resample_linear(jnp.asarray(x.numpy()[:, 0]), out_len)
    np.testing.assert_allclose(np.asarray(y), ref.numpy()[:, 0], atol=2e-4)


def test_pcm_roundtrip():
    x = jnp.asarray(np.array([-32768, -1, 0, 1, 32767], np.int16))
    f = pcm_in(x)
    assert float(f.min()) == -1.0
    y = pcm_out(f * (32768.0 / 32767.0))
    assert y.dtype == jnp.int16
    np.testing.assert_array_equal(np.asarray(y), [-32768, -1, 0, 1, 32767])


def test_erb_partition_and_shapes():
    fb = erb_filters(65, 64, 512)
    assert fb.shape == (64, 257 - 65)
    sums = fb.sum(axis=0)
    # interior of the band range forms ~a partition of unity
    assert np.all(np.abs(sums[2:-2] - 1.0) < 1e-6)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 257, 3)).astype(np.float32))
    c = erb_compress(x, 65, 64, 512)
    assert c.shape == (1, 4, 129, 3)
    e = erb_expand(c, 65, 64, 512)
    assert e.shape == x.shape
    np.testing.assert_allclose(np.asarray(e[..., :65, :]), np.asarray(x[..., :65, :]), atol=1e-6)


def test_rope_mm_tables_match_apply_rotary():
    from audiojax.nn.mossformer import apply_rotary, rope_mm_tables, rotary_tables

    rng = np.random.default_rng(3)
    t, dim, rot = 101, 128, 32
    x = jnp.asarray(rng.standard_normal((5, t, dim)).astype(np.float32))
    cos, sin = rotary_tables(t, rot)
    want = apply_rotary(x, cos, sin, rot)
    cos_f, sin_f, swap = rope_mm_tables(t, rot, dim)
    got = x * cos_f + (x @ swap) * sin_f
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
