"""Importer transforms: BN/LN fusion goldens vs torch, GTCRN/DFSMN end-to-end
imports from synthetic upstream-shaped checkpoints."""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from audiojax.importers import import_checkpoint
from audiojax.importers.common import (
    fold_ln_into_linear,
    fuse_bn_conv2d,
    fuse_bn_deconv2d,
    unwrap_state_dict,
)
from audiojax.nn import core


def _bn_with_stats(c):
    bn = nn.BatchNorm2d(c)
    with torch.no_grad():
        bn.running_mean.uniform_(-0.5, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.uniform_(-0.3, 0.3)
    return bn.eval()


def test_fuse_bn_conv2d_matches_torch():
    torch.manual_seed(0)
    conv = nn.Conv2d(6, 12, (2, 3), groups=2)
    bn = _bn_with_stats(12)
    x = torch.randn(2, 6, 9, 11)
    with torch.no_grad():
        ref = bn(conv(x)).numpy()
    sd = {**{f"c.{k}": v for k, v in conv.state_dict().items()},
          **{f"b.{k}": v for k, v in bn.state_dict().items()}}
    p = fuse_bn_conv2d(sd, "c", "b", groups=2)
    y = core.conv2d({k: jnp.asarray(v) for k, v in p.items()},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), groups=2)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_fuse_bn_deconv2d_matches_torch():
    torch.manual_seed(1)
    conv = nn.ConvTranspose2d(8, 8, (1, 5), stride=(1, 2), padding=(0, 2), groups=2)
    bn = _bn_with_stats(8)
    x = torch.randn(1, 8, 7, 33)
    with torch.no_grad():
        ref = bn(conv(x)).numpy()
    sd = {**{f"c.{k}": v for k, v in conv.state_dict().items()},
          **{f"b.{k}": v for k, v in bn.state_dict().items()}}
    p = fuse_bn_deconv2d(sd, "c", "b", groups=2)
    y = core.conv2d_transpose({k: jnp.asarray(v) for k, v in p.items()},
                              jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                              stride=(1, 2), padding=(0, 2), groups=2)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_fold_ln_into_linear_matches_torch():
    torch.manual_seed(2)
    ln = nn.LayerNorm(10)
    with torch.no_grad():
        ln.weight.uniform_(0.5, 1.5)
        ln.bias.uniform_(-0.2, 0.2)
    lin = nn.Linear(10, 7)
    x = torch.randn(4, 10)
    with torch.no_grad():
        ref = lin(ln(x)).numpy()
    sd = {**{f"n.{k}": v for k, v in ln.state_dict().items()},
          **{f"l.{k}": v for k, v in lin.state_dict().items()}}
    p = fold_ln_into_linear(sd, "n", "l")
    normed = core.layer_norm(None, jnp.asarray(x.numpy()))  # affine-free LN
    y = core.dense({k: jnp.asarray(v) for k, v in p.items()}, normed)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)


def test_unwrap_state_dict():
    sd = {"module.a.weight": torch.ones(2)}
    out = unwrap_state_dict({"state_dict": sd})
    assert "a.weight" in out


# ── synthetic upstream-shaped checkpoints ────────────────────────────────────


def _gtcrn_state_dict():
    """Build a state dict with the upstream GTCRN naming and shapes."""
    sd = {}

    def conv_block(key, cin, cout, k, groups=1, deconv=False, last=False):
        m = (nn.ConvTranspose2d if deconv else nn.Conv2d)(cin, cout, k, groups=groups)
        sd.update({f"{key}.conv.{n}": v for n, v in m.state_dict().items()})
        sd.update({f"{key}.bn.{n}": v for n, v in _bn_with_stats(cout).state_dict().items()})
        if not last:  # the final decoder block is tanh — no PReLU weight
            sd[f"{key}.act.weight"] = torch.full((1,), 0.25)

    def gt_block(key, deconv=False):
        mod = nn.ConvTranspose2d if deconv else nn.Conv2d
        for name, cin, cout, k, g in (
            ("point_conv1", 24, 16, (1, 1), 1),
            ("depth_conv", 16, 16, (3, 3), 16),
            ("point_conv2", 16, 8, (1, 1), 1),
        ):
            m = mod(cin, cout, k, groups=g)
            sd.update({f"{key}.{name}.{n}": v for n, v in m.state_dict().items()})
        for bn_name, c in (("point_bn1", 16), ("depth_bn", 16), ("point_bn2", 8)):
            sd.update({f"{key}.{bn_name}.{n}": v for n, v in _bn_with_stats(c).state_dict().items()})
        sd[f"{key}.point_act.weight"] = torch.full((1,), 0.25)
        sd[f"{key}.depth_act.weight"] = torch.full((1,), 0.25)
        gru = nn.GRU(8, 16, 1, batch_first=True)
        sd.update({f"{key}.tra.att_gru.{n}": v for n, v in gru.state_dict().items()})
        fc = nn.Linear(16, 8)
        sd.update({f"{key}.tra.att_fc.{n}": v for n, v in fc.state_dict().items()})

    def dpgrnn(key):
        for rnn_name, hid, bi in (("intra_rnn", 4, True), ("inter_rnn", 8, False)):
            for sub in ("rnn1", "rnn2"):
                g = nn.GRU(8, hid, 1, batch_first=True, bidirectional=bi)
                sd.update({f"{key}.{rnn_name}.{sub}.{n}": v for n, v in g.state_dict().items()})
        for fc in ("intra_fc", "inter_fc"):
            sd.update({f"{key}.{fc}.{n}": v for n, v in nn.Linear(16, 16).state_dict().items()})
        for ln in ("intra_ln", "inter_ln"):
            m = nn.LayerNorm((33, 16))
            sd.update({f"{key}.{ln}.{n}": v for n, v in m.state_dict().items()})

    conv_block("encoder.en_convs.0", 9, 16, (1, 5))
    conv_block("encoder.en_convs.1", 16, 16, (1, 5), groups=2)
    for i in (2, 3, 4):
        gt_block(f"encoder.en_convs.{i}")
    dpgrnn("dpgrnn1")
    dpgrnn("dpgrnn2")
    for i in (0, 1, 2):
        gt_block(f"decoder.de_convs.{i}", deconv=True)
    conv_block("decoder.de_convs.3", 16, 16, (1, 5), groups=2, deconv=True)
    conv_block("decoder.de_convs.4", 16, 2, (1, 5), deconv=True, last=True)
    return sd


def test_import_gtcrn_runs_forward():
    torch.manual_seed(3)
    params = import_checkpoint("gtcrn", _gtcrn_state_dict())
    from audiojax.models.gtcrn import GtcrnConfig, gtcrn_forward

    audio = jnp.asarray((np.random.default_rng(0).standard_normal(8192) * 5000).astype(np.int16)[None])
    out = gtcrn_forward(params, audio, GtcrnConfig())
    assert out.shape == (1, 8192)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_import_dfsmn_matches_torch_semantics():
    """Importer + our mask net must reproduce the ModelScope UniDeepFsmn stack."""
    torch.manual_seed(4)
    c, mels, bins, lorder, depth = 32, 12, 17, 5, 3
    sd = {}
    sd["linear1.linear.weight"] = torch.randn(c, mels)
    sd["linear1.linear.bias"] = torch.randn(c)
    sd["linear2.linear.weight"] = torch.randn(bins, c)
    sd["linear2.linear.bias"] = torch.randn(bins)
    for i in range(depth):
        sd[f"deepfsmn.{i}.linear.weight"] = torch.randn(c, c)
        sd[f"deepfsmn.{i}.linear.bias"] = torch.randn(c)
        sd[f"deepfsmn.{i}.project.weight"] = torch.randn(c, c) * 0.3
        sd[f"deepfsmn.{i}.conv1.weight"] = torch.randn(c, 1, lorder, 1) * 0.3

    params = import_checkpoint("dfsmn", sd)
    from audiojax.models.dfsmn import dfsmn_mask_net

    x = torch.randn(1, 20, mels)
    # torch golden with ModelScope semantics: h += p1 + causal_conv(p1)
    with torch.no_grad():
        h = torch.relu(torch.nn.functional.linear(x, sd["linear1.linear.weight"], sd["linear1.linear.bias"]))
        for i in range(depth):
            f1 = torch.relu(torch.nn.functional.linear(h, sd[f"deepfsmn.{i}.linear.weight"], sd[f"deepfsmn.{i}.linear.bias"]))
            p1 = torch.nn.functional.linear(f1, sd[f"deepfsmn.{i}.project.weight"])
            mem = torch.nn.functional.conv1d(
                torch.nn.functional.pad(p1.transpose(1, 2), (lorder - 1, 0)),
                sd[f"deepfsmn.{i}.conv1.weight"][..., 0], groups=c).transpose(1, 2)
            h = h + p1 + mem
        ref = torch.sigmoid(torch.nn.functional.linear(h, sd["linear2.linear.weight"], sd["linear2.linear.bias"])).numpy()

    mask, _ = dfsmn_mask_net(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(mask), ref, atol=1e-5)


def test_import_nkf_kgnet_matches_torch_replica():
    """Upstream NKF KGNet (ComplexDense pairs + complex PReLU + ComplexGRU)
    one step vs our kg_net after the complex->real decomposition remap
    (Export_NKF_AEC.py:414-455 key layout)."""
    import jax
    import torch

    from audiojax.importers import import_checkpoint
    from audiojax.models.nkf_aec import NkfConfig, kg_net

    torch.manual_seed(3)
    cfg = NkfConfig()
    d_in, fc, rnn, L = 2 * cfg.filter_order + 1, cfg.fc_dim, cfg.rnn_dim, cfg.filter_order

    mods = {
        "kg_net.fc_in.0.linear_real": torch.nn.Linear(d_in, fc),
        "kg_net.fc_in.0.linear_imag": torch.nn.Linear(d_in, fc),
        "kg_net.fc_out.0.linear_real": torch.nn.Linear(rnn, fc),
        "kg_net.fc_out.0.linear_imag": torch.nn.Linear(rnn, fc),
        "kg_net.fc_out.2.linear_real": torch.nn.Linear(fc, L),
        "kg_net.fc_out.2.linear_imag": torch.nn.Linear(fc, L),
    }
    prelus = {
        "kg_net.fc_in.1.prelu": torch.nn.PReLU(init=0.2),
        "kg_net.fc_out.1.prelu": torch.nn.PReLU(init=0.1),
    }
    grus = {
        "kg_net.complex_gru.gru_r": torch.nn.GRU(fc, rnn, batch_first=True),
        "kg_net.complex_gru.gru_i": torch.nn.GRU(fc, rnn, batch_first=True),
    }
    sd = {}
    for key, m in {**mods, **prelus, **grus}.items():
        for pname, v in m.state_dict().items():
            sd[f"{key}.{pname}" if not isinstance(m, torch.nn.PReLU) else f"{key}.weight"] = v

    n = 5
    x = torch.randn(n, d_in, 2)

    with torch.no_grad():
        def cdense(key, re, im):
            return mods[f"{key}.linear_real"](re), mods[f"{key}.linear_imag"](im)

        def cprelu(key, re, im):
            p = prelus[f"{key}.prelu"]
            return p(re), p(im)

        re, im = cdense("kg_net.fc_in.0", x[..., 0], x[..., 1])
        re, im = cprelu("kg_net.fc_in.1", re, im)
        # complex GRU one step from zero state: y = gru_r(re)-gru_i(im) + i(gru_i(re)+gru_r(im))
        def step(gkey, inp):
            out, _ = grus[gkey](inp[:, None, :])
            return out[:, 0]

        y_re = step("kg_net.complex_gru.gru_r", re) - step("kg_net.complex_gru.gru_i", im)
        y_im = step("kg_net.complex_gru.gru_i", re) + step("kg_net.complex_gru.gru_r", im)
        re, im = cdense("kg_net.fc_out.0", y_re, y_im)
        re, im = cprelu("kg_net.fc_out.1", re, im)
        re, im = cdense("kg_net.fc_out.2", re, im)
        ref = torch.stack([re, im], dim=-1).numpy()

    params = import_checkpoint("nkf_aec", sd)
    params = jax.tree.map(jnp.asarray, params)
    zeros = tuple(jnp.zeros((n, rnn)) for _ in range(4))
    kg, _ = kg_net(params, jnp.asarray(x.numpy()), zeros)
    np.testing.assert_allclose(np.asarray(kg), ref, atol=2e-5)


def test_import_checkpoint_fail_closed_on_drift(tmp_path):
    """An unconsumed checkpoint key (layout drift) must abort the import and
    land in the JSON audit report (the reference rewrites' fail-closed +
    report contract, Rewrite_ONNX_GRU_Zero_State.py:16-24,307-326)."""
    import json

    from audiojax.models.nkf_aec import NkfConfig

    torch.manual_seed(0)
    cfg = NkfConfig()
    d_in, fc, rnn_d, L = 2 * cfg.filter_order + 1, cfg.fc_dim, cfg.rnn_dim, cfg.filter_order
    sd = {}
    for key, (o, i) in {
        "kg_net.fc_in.0.linear_real": (fc, d_in), "kg_net.fc_in.0.linear_imag": (fc, d_in),
        "kg_net.fc_out.0.linear_real": (fc, rnn_d), "kg_net.fc_out.0.linear_imag": (fc, rnn_d),
        "kg_net.fc_out.2.linear_real": (L, fc), "kg_net.fc_out.2.linear_imag": (L, fc),
    }.items():
        sd[f"{key}.weight"] = torch.randn(o, i)
        sd[f"{key}.bias"] = torch.randn(o)
    sd["kg_net.fc_in.1.prelu.weight"] = torch.randn(1)
    sd["kg_net.fc_out.1.prelu.weight"] = torch.randn(1)
    for g in ("gru_r", "gru_i"):
        sd[f"kg_net.complex_gru.{g}.weight_ih_l0"] = torch.randn(3 * rnn_d, fc)
        sd[f"kg_net.complex_gru.{g}.weight_hh_l0"] = torch.randn(3 * rnn_d, rnn_d)
        sd[f"kg_net.complex_gru.{g}.bias_ih_l0"] = torch.randn(3 * rnn_d)
        sd[f"kg_net.complex_gru.{g}.bias_hh_l0"] = torch.randn(3 * rnn_d)

    # clean import consumes everything
    import_checkpoint("nkf_aec", sd, report_path=tmp_path / "r.json")
    rep = json.loads((tmp_path / "r.json").read_text())
    assert rep["unconsumed"] == [] and rep["consumed"] == len(sd)

    # drift: an extra tensor the recipe doesn't know aborts (strict default)
    sd["kg_net.mystery.weight"] = torch.randn(3, 3)
    with pytest.raises(ValueError, match="mystery"):
        import_checkpoint("nkf_aec", sd)
    # …unless explicitly tolerated, and the report still names it
    import_checkpoint("nkf_aec", sd, strict=False, report_path=tmp_path / "r2.json")
    rep2 = json.loads((tmp_path / "r2.json").read_text())
    assert rep2["unconsumed"] == ["kg_net.mystery.weight"]

    # bookkeeping buffers are ignored, not drift
    del sd["kg_net.mystery.weight"]
    sd["some.bn.num_batches_tracked"] = torch.tensor(7)
    import_checkpoint("nkf_aec", sd)


# ── SDAEC (ICCRN + AlphaPredictor, Export_SDAEC.py layout) ───────────────────


def _sdaec_state_dict(c=20, k=10):
    """Synthetic union of the upstream ICCRN.ckpt + alpha.ckpt key spaces."""
    torch.manual_seed(6)
    sd = {}

    def conv2d(key, cin, cout, ksz):
        m = nn.Conv2d(cin, cout, ksz)
        sd.update({f"{key}.{n}": v for n, v in m.state_dict().items()})

    def iccrn_ln(key, ch, f):
        sd[f"{key}.w"] = torch.rand(1, ch, f, 1) + 0.5
        sd[f"{key}.b"] = torch.rand(1, ch, f, 1) * 1e-2

    def ch_lstm(key, cin, feat, out, bi, layers=1):
        m = nn.LSTM(cin, feat, num_layers=layers, bidirectional=bi)
        sd.update({f"{key}.lstm2.{n}": v for n, v in m.state_dict().items()})
        lin = nn.Linear((2 if bi else 1) * feat, out)
        sd.update({f"{key}.linear.{n}": v for n, v in lin.state_dict().items()})

    def cfb(key, cin):
        conv2d(f"{key}.conv_gate", cin, c, (1, 1))
        conv2d(f"{key}.conv_input", cin, c, (1, 1))
        conv2d(f"{key}.conv", c, c, (3, 1))
        iccrn_ln(f"{key}.LN0", cin, 160)
        iccrn_ln(f"{key}.LN1", c, 160)
        iccrn_ln(f"{key}.LN2", c, 160)
        iccrn_ln(f"{key}.ceps_unit.LN", 2 * c, 81)
        ch_lstm(f"{key}.ceps_unit.ch_lstm_f", 2 * c, c, 2 * c, bi=True)

    ch_lstm("in_ch_lstm", 4, c, c, bi=True)
    conv2d("in_conv", 4 + c, c, (1, 1))
    for i in range(1, 6):
        cfb(f"cfb_e{i}", c)
    iccrn_ln("ln", c, 160)
    ch_lstm("ch_lstm", c, 2 * c, c, bi=False, layers=2)
    cfb("cfb_d5", c)
    for i in (4, 3, 2, 1):
        cfb(f"cfb_d{i}", 2 * c)
    ch_lstm("out_ch_lstm", 2 * c, c, 2 * c, bi=False)
    conv2d("out_conv", 3 * c, 2, (1, 1))
    sd["linear1.weight"] = torch.randn(1, 2)
    sd["linear1.bias"] = torch.randn(1)
    sd["linear2.weight"] = torch.randn(1, k)
    sd["linear2.bias"] = torch.randn(1)
    return sd


def test_import_sdaec_structure_and_forward():
    import jax

    from audiojax.models.sdaec import SdaecConfig, init_sdaec, sdaec_forward

    params = import_checkpoint("sdaec", _sdaec_state_dict())
    cfg = SdaecConfig()
    ref = init_sdaec(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(ref) == jax.tree.structure(params)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(params)):
        assert tuple(r.shape) == tuple(np.asarray(g).shape)

    rng = np.random.default_rng(0)
    near = jnp.asarray((rng.standard_normal(4800) * 4000).astype(np.int16)[None])
    far = jnp.asarray((rng.standard_normal(4800) * 4000).astype(np.int16)[None])
    out = sdaec_forward(jax.tree.map(jnp.asarray, params), near, far, cfg)
    assert out.shape == (1, 4800)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_import_sdaec_alpha_fusion_matches_torch():
    """Fused causal conv == |linear2(linear1(power pairs over k frames))|."""
    from audiojax.models.sdaec import alpha_align

    sd = _sdaec_state_dict()
    params = import_checkpoint("sdaec", sd, strict=False)
    k = 10
    rng = np.random.default_rng(2)
    mix = rng.standard_normal(30).astype(np.float32) ** 2
    far = rng.standard_normal(30).astype(np.float32) ** 2

    w1 = sd["linear1.weight"].numpy()[0]
    b1 = sd["linear1.bias"].numpy()[0]
    w2 = sd["linear2.weight"].numpy()[0]
    b2 = sd["linear2.bias"].numpy()[0]
    padded = np.stack([np.concatenate([np.zeros(k - 1, np.float32), far]),
                       np.concatenate([np.zeros(k - 1, np.float32), mix])])
    ref = np.empty(30)
    for t in range(30):
        # upstream semantics: linear1 maps (far, mix) → scalar per frame,
        # linear2 maps the k-frame window → alpha
        per_frame = w1[0] * padded[0, t : t + k] + w1[1] * padded[1, t : t + k] + b1
        ref[t] = abs(float(w2 @ per_frame + b2))

    ours = np.asarray(alpha_align(params["alpha"], jnp.asarray(mix[None]), jnp.asarray(far[None]), k))[0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_import_sdaec_layer_norm_matches_reference_export():
    """iccrn_layer_norm with the RAW imported weights == the reference's
    fused F.layer_norm export pipeline (Export_SDAEC.py:128-170)."""
    from audiojax.nn.cfb import iccrn_layer_norm

    c, f = 6, 16
    torch.manual_seed(7)
    w = torch.rand(1, c, f, 1) + 0.5
    b = torch.rand(1, c, f, 1) * 1e-2
    x = torch.randn(2, 3, f, c)  # our layout (B, T, F, C)

    reduced = c * f
    # reference export math: fuse weight_scale then divide by sqrt(cf)
    export_w = (w.squeeze(0).squeeze(-1).T * (reduced - 1) ** 0.5 / reduced**0.5)
    export_b = b.squeeze(0).squeeze(-1).T
    export_eps = 1e-6 * (reduced - 1) / reduced
    with torch.no_grad():
        ref = torch.nn.functional.layer_norm(x, (f, c), export_w, export_b, export_eps).numpy()

    p = {"w": jnp.asarray(w.numpy()[0, :, :, 0].T), "b": jnp.asarray(b.numpy()[0, :, :, 0].T)}
    ours = np.asarray(iccrn_layer_norm(p, jnp.asarray(x.numpy()), 1e-6))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_import_deep_echo_structure_and_forward():
    import jax

    from audiojax.models.deep_echo import DeepEchoConfig, deep_echo_forward, init_deep_echo

    torch.manual_seed(8)
    c = 20
    sd = {}

    def conv2d(key, cin, cout, ksz):
        m = nn.Conv2d(cin, cout, ksz)
        sd.update({f"{key}.{n}": v for n, v in m.state_dict().items()})

    def iccrn_ln(key, ch, f):
        sd[f"{key}.w"] = torch.rand(1, ch, f, 1) + 0.5
        sd[f"{key}.b"] = torch.rand(1, ch, f, 1) * 1e-2

    def ch_lstm(key, cin, feat, out, bi, layers=1):
        m = nn.LSTM(cin, feat, num_layers=layers, bidirectional=bi)
        sd.update({f"{key}.lstm2.{n}": v for n, v in m.state_dict().items()})
        lin = nn.Linear((2 if bi else 1) * feat, out)
        sd.update({f"{key}.linear.{n}": v for n, v in lin.state_dict().items()})

    def cfb(key, cin):
        conv2d(f"{key}.conv_gate", cin, c, (1, 1))
        conv2d(f"{key}.conv_input", cin, c, (1, 1))
        conv2d(f"{key}.conv", c, c, (3, 1))
        iccrn_ln(f"{key}.LN0", cin, 160)
        iccrn_ln(f"{key}.LN1", c, 160)
        iccrn_ln(f"{key}.LN2", c, 160)
        iccrn_ln(f"{key}.ceps_unit.LN", 2 * c, 81)
        ch_lstm(f"{key}.ceps_unit.ch_lstm_f", 2 * c, c, 2 * c, bi=True)

    ch_lstm("in_ch_lstm", 4, c, c, bi=True)
    conv2d("in_conv", 4 + c, c, (1, 1))
    cfb("cfb_e1", c)
    iccrn_ln("ln", c, 160)
    ch_lstm("ch_lstm", c, 2 * c, c, bi=False, layers=2)
    cfb("cfb_d1", c)
    ch_lstm("out_ch_lstm", 2 * c, c, 2 * c, bi=False)
    conv2d("out_conv", 3 * c, 20, (1, 1))  # 2 * echo_order(10)

    params = import_checkpoint("deep_echo", sd)
    cfg = DeepEchoConfig()
    ref = init_deep_echo(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(ref) == jax.tree.structure(params)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(params)):
        assert tuple(r.shape) == tuple(np.asarray(g).shape)

    rng = np.random.default_rng(1)
    near = jnp.asarray((rng.standard_normal(4800) * 4000).astype(np.int16)[None])
    far = jnp.asarray((rng.standard_normal(4800) * 4000).astype(np.int16)[None])
    out = deep_echo_forward(jax.tree.map(jnp.asarray, params), near, far, cfg)
    assert out.shape == (1, 4800)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def _h_gtcrn_state_dict():
    """Upstream H-GTCRN (GTCRN-IVA) layout: GT-block convs nested under
    ConvBlock wrappers (point_conv1.conv/.bn/.act…), all regular Conv2d even
    in the decoder (/root/reference/H-GTCRN/Export_H_GTCRN.py:236-300)."""
    sd = {}

    def conv_block(key, cin, cout, k, groups=1, deconv=False, last=False):
        m = (nn.ConvTranspose2d if deconv else nn.Conv2d)(cin, cout, k, groups=groups)
        sd.update({f"{key}.conv.{n}": v for n, v in m.state_dict().items()})
        sd.update({f"{key}.bn.{n}": v for n, v in _bn_with_stats(cout).state_dict().items()})
        if not last:
            sd[f"{key}.act.weight"] = torch.full((1,), 0.25)

    def nested_gt(key):
        conv_block(f"{key}.point_conv1", 24, 16, (1, 1))
        conv_block(f"{key}.depth_conv", 16, 16, (3, 3), groups=16)
        conv_block(f"{key}.point_conv2", 16, 8, (1, 1), last=True)
        gru = nn.GRU(8, 16, 1, batch_first=True)
        sd.update({f"{key}.tra.att_gru.{n}": v for n, v in gru.state_dict().items()})
        sd.update({f"{key}.tra.att_fc.{n}": v for n, v in nn.Linear(16, 8).state_dict().items()})

    def dpgrnn(key):
        for rnn_name, hid, bi in (("intra_rnn", 4, True), ("inter_rnn", 8, False)):
            for sub in ("rnn1", "rnn2"):
                g = nn.GRU(8, hid, 1, batch_first=True, bidirectional=bi)
                sd.update({f"{key}.{rnn_name}.{sub}.{n}": v for n, v in g.state_dict().items()})
        for fc in ("intra_fc", "inter_fc"):
            sd.update({f"{key}.{fc}.{n}": v for n, v in nn.Linear(16, 16).state_dict().items()})
        for ln in ("intra_ln", "inter_ln"):
            sd.update({f"{key}.{ln}.{n}": v for n, v in nn.LayerNorm((33, 16)).state_dict().items()})

    conv_block("encoder.en_convs.0", 18, 16, (1, 5))
    conv_block("encoder.en_convs.1", 16, 16, (1, 5), groups=2)
    for i in (2, 3, 4):
        nested_gt(f"encoder.en_convs.{i}")
    dpgrnn("dpgrnn1")
    dpgrnn("dpgrnn2")
    for i in (0, 1, 2):
        nested_gt(f"decoder.de_convs.{i}")
    conv_block("decoder.de_convs.3", 16, 16, (1, 5), groups=2, deconv=True)
    conv_block("decoder.de_convs.4", 16, 2, (1, 5), deconv=True, last=True)
    return sd


def test_import_h_gtcrn_runs_forward():
    """H-GTCRN uses the nested GTCRN-IVA checkpoint layout; the 6-channel
    spatial front-end widens the first encoder conv (18 SFE channels)."""
    import jax

    torch.manual_seed(9)
    sd = _h_gtcrn_state_dict()

    params = import_checkpoint("h_gtcrn", sd)
    from audiojax.models.h_gtcrn import HGtcrnConfig, h_gtcrn_forward, init_h_gtcrn

    cfg = HGtcrnConfig()
    ref = init_h_gtcrn(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(ref) == jax.tree.structure(params)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(params)):
        gs = tuple(np.asarray(g).shape)
        # scalar PReLU alphas broadcast against our per-channel init
        assert gs == tuple(r.shape) or gs == (1,)

    rng = np.random.default_rng(2)
    audio = jnp.asarray((rng.standard_normal((1, 2, 6400)) * 4000).astype(np.int16))
    out = h_gtcrn_forward(jax.tree.map(jnp.asarray, params), audio, cfg)
    assert out.shape == (1, 6400)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_import_dfsmn_aec_cascade():
    """Cascade import: SDAEC backend union + ModelScope DFSMN mask net + VAD
    head + CMVN fold into the first affine (Export_DFSMN_AEC.py:1114-1124)."""
    import dataclasses

    import jax

    from audiojax.models.dfsmn_aec import DfsmnAecConfig, dfsmn_aec_forward, init_dfsmn_aec

    torch.manual_seed(10)
    cfg = dataclasses.replace(DfsmnAecConfig(), depth=2, hidden=32, output_vad=True)
    sd = dict(_sdaec_state_dict())  # backend keys
    feat_dim, bins = 3 * cfg.n_mels, cfg.mask_bins
    sd["linear1.linear.weight"] = torch.randn(cfg.hidden, feat_dim) * 0.05
    sd["linear1.linear.bias"] = torch.randn(cfg.hidden) * 0.05
    sd["linear2.linear.weight"] = torch.randn(bins, cfg.hidden) * 0.05
    sd["linear2.linear.bias"] = torch.randn(bins) * 0.05
    sd["linear3.linear.weight"] = torch.randn(1, cfg.hidden) * 0.05
    sd["linear3.linear.bias"] = torch.randn(1) * 0.05
    for i in range(cfg.depth):
        sd[f"deepfsmn.{i}.linear.weight"] = torch.randn(cfg.hidden, cfg.hidden) * 0.05
        sd[f"deepfsmn.{i}.linear.bias"] = torch.randn(cfg.hidden) * 0.05
        sd[f"deepfsmn.{i}.project.weight"] = torch.randn(cfg.hidden, cfg.hidden) * 0.05
        sd[f"deepfsmn.{i}.conv1.weight"] = torch.randn(cfg.hidden, 1, cfg.lorder, 1) * 0.05

    rng = np.random.default_rng(3)
    shift = rng.standard_normal(feat_dim).astype(np.float32)
    scale = (rng.random(feat_dim).astype(np.float32) + 0.5)
    params = import_checkpoint("dfsmn_aec", sd, cfg=cfg, cmvn=(shift, scale))

    ref = init_dfsmn_aec(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(ref) == jax.tree.structure(params)

    # CMVN fold golden: lin1(cmvn(x)) == folded_lin1(x)
    x = rng.standard_normal(feat_dim).astype(np.float32)
    w = sd["linear1.linear.weight"].numpy()
    b = sd["linear1.linear.bias"].numpy()
    want = w @ ((x + shift) * scale) + b
    got = x @ np.asarray(params["mask_net"]["lin1"]["w"]) + np.asarray(params["mask_net"]["lin1"]["b"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    near = jnp.asarray((rng.standard_normal(4800) * 4000).astype(np.int16)[None])
    far = jnp.asarray((rng.standard_normal(4800) * 4000).astype(np.int16)[None])
    out, vad = dfsmn_aec_forward(jax.tree.map(jnp.asarray, params), near, far, cfg)
    assert out.shape == (1, 4800)
    assert vad.shape[0] == 1 and bool(jnp.isfinite(vad).all())


# ── UL-UNAS (converted ULUNAS layout, Export_UL_UNAS.py:654-700) ─────────────


def _ul_unas_state_dict():
    torch.manual_seed(11)
    types = (0, 2, 1, 2, 1)
    channels = (12, 24, 24, 32, 16)
    widths = (65, 33, 33, 33, 33)
    kernels = ((3, 3), (2, 3), (2, 3), (1, 5), (1, 5))
    strides = (2, 2, 1, 1, 1)
    groups = (1, 2, 2, 2, 2)
    sd = {}

    def bn(key, c):
        sd.update({f"{key}.{n}": v for n, v in _bn_with_stats(c).state_dict().items()})

    def aprelu(key, c, w):
        sd[f"{key}.affine_weight"] = torch.randn(1, c, 1, w) * 0.1 + 1.0
        sd[f"{key}.affine_bias"] = torch.randn(1, c, 1, w) * 0.05
        sd[f"{key}.slope_weight"] = torch.full((1, c, 1, 1), 0.25)

    def ctfa(key, c, w):
        g = nn.GRU(c, 2 * c, batch_first=False)
        sd.update({f"{key}.ta_gru.{n}": v for n, v in g.state_dict().items()})
        sd.update({f"{key}.ta_fc.{n}": v for n, v in nn.Linear(2 * c, c).state_dict().items()})
        fg = nn.GRU(4, 4, bidirectional=True)
        sd.update({f"{key}.fa.gru.{n}": v for n, v in fg.state_dict().items()})
        sd.update({f"{key}.fa.fc.{n}": v for n, v in nn.Linear(8, 4).state_dict().items()})

    def in_width(w, s, deconv):
        return (w // 2 + 1 if deconv else w * 2 - 1) if s == 2 else w

    def block(key, btype, cin, cout, w, k, s, g, deconv=False, last=False):
        mod = nn.ConvTranspose2d if deconv else nn.Conv2d
        if btype == 0:
            m = mod(cin, cout, k, stride=(1, s), groups=g)
            sd.update({f"{key}.conv.{n}": v for n, v in m.state_dict().items()})
            bn(f"{key}.bn", cout)
            if not last:
                aprelu(f"{key}.act", cout, w)
            ctfa(f"{key}.ctfa", cout, w)
        elif btype == 1:
            m = nn.Conv2d(cin, cout, 1, groups=g)
            sd.update({f"{key}.pconv_conv.{n}": v for n, v in m.state_dict().items()})
            bn(f"{key}.pconv_bn", cout)
            aprelu(f"{key}.pconv_act", cout, in_width(w, s, deconv))
            m = mod(cout, cout, k, stride=(1, s), groups=cout)
            sd.update({f"{key}.dconv_conv.{n}": v for n, v in m.state_dict().items()})
            bn(f"{key}.dconv_bn", cout)
            if not last:
                aprelu(f"{key}.dconv_act", cout, w)
            ctfa(f"{key}.dconv_ctfa", cout, w)
        else:
            m = nn.Conv2d(cin, cout, 1, groups=g)
            sd.update({f"{key}.pconv1_conv.{n}": v for n, v in m.state_dict().items()})
            bn(f"{key}.pconv1_bn", cout)
            aprelu(f"{key}.pconv1_act", cout, in_width(w, s, deconv))
            m = mod(cout, cout, k, stride=(1, s), groups=cout)
            sd.update({f"{key}.dconv_conv.{n}": v for n, v in m.state_dict().items()})
            bn(f"{key}.dconv_bn", cout)
            aprelu(f"{key}.dconv_act", cout, w)
            m = nn.Conv2d(cout, cout, 1, groups=g)
            sd.update({f"{key}.pconv2_conv.{n}": v for n, v in m.state_dict().items()})
            bn(f"{key}.pconv2_bn", cout)
            ctfa(f"{key}.pconv2_ctfa", cout, w)

    # ERB learned filterbank (frozen linears): 192 high bins ↔ 64 bands
    sd["erb.erb_fc.weight"] = torch.rand(64, 192)
    sd["erb.ierb_fc.weight"] = torch.rand(192, 64)

    cin = 1
    for i, t in enumerate(types):
        block(f"encoder.en_convs.{i}", t, cin, channels[i], widths[i],
              kernels[i], strides[i], groups[i])
        cin = channels[i]
    for j, i in enumerate(range(len(types) - 1, 0, -1)):
        block(f"decoder.de_convs.{j}", types[i], channels[i], channels[i - 1],
              widths[i - 1], kernels[i], strides[i], groups[i], deconv=True)
    block(f"decoder.de_convs.{len(types) - 1}", types[0], channels[0], 1, 129,
          kernels[0], strides[0], groups[0], deconv=True, last=True)

    def dpgrnn(key, c=16, w=33):
        for rnn_name, hid, bi in (("intra_rnn", c // 4, True), ("inter_rnn", c // 2, False)):
            for sub in ("rnn1", "rnn2"):
                g = nn.GRU(c // 2, hid, 1, batch_first=False, bidirectional=bi)
                sd.update({f"{key}.{rnn_name}.{sub}.{n}": v for n, v in g.state_dict().items()})
        for fc in ("intra_fc", "inter_fc"):
            sd.update({f"{key}.{fc}.{n}": v for n, v in nn.Linear(c, c).state_dict().items()})
        for ln in ("intra_ln", "inter_ln"):
            sd.update({f"{key}.{ln}.{n}": v for n, v in nn.LayerNorm((w, c)).state_dict().items()})

    dpgrnn("dpgrnn.0")
    dpgrnn("dpgrnn.1")
    return sd


def test_import_ul_unas_runs_forward():
    import jax

    from audiojax.models.ul_unas import UlUnasConfig, ul_unas_forward

    params = import_checkpoint("ul_unas", _ul_unas_state_dict())
    audio = jnp.asarray((np.random.default_rng(4).standard_normal(8192) * 5000).astype(np.int16)[None])
    out = ul_unas_forward(jax.tree.map(jnp.asarray, params), audio, UlUnasConfig())
    assert out.shape == (1, 8192)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_import_ul_unas_affine_prelu_golden():
    """Fused AffinePReLU == raw (affine+1 | affine+slope)·x + bias."""
    from audiojax.models.ul_unas import affine_prelu

    sd = _ul_unas_state_dict()
    key = "encoder.en_convs.0.act"
    aw = sd[f"{key}.affine_weight"].numpy()[0, :, 0, :]  # (C, W)
    ab = sd[f"{key}.affine_bias"].numpy()[0, :, 0, :]
    sl = sd[f"{key}.slope_weight"].numpy()[0, :, 0, 0]

    params = import_checkpoint("ul_unas", sd, strict=False)
    x = np.random.default_rng(5).standard_normal((2, 3, 65, 12)).astype(np.float32)  # (B,T,F,C)
    ours = np.asarray(affine_prelu(
        {k: jnp.asarray(v) for k, v in params["enc0"]["act"].items()}, jnp.asarray(x)))
    xcw = x.transpose(0, 3, 1, 2)  # (B, C, T, W)
    ref = np.where(xcw > 0, (aw + 1.0)[None, :, None, :], (aw + sl[:, None])[None, :, None, :]) * xcw \
        + ab[None, :, None, :]
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=1e-6)


# ── MossFormer2-SE-48K (ClearVoice layout, Export_MossFormer_SE.py) ──────────


def _m2se_state_dict(cfg):
    torch.manual_seed(12)
    sd = {}
    P = "mossformer_se"
    d, qk, vu, inner, k = cfg.dim, cfg.qk_dim, cfg.vu_dim, cfg.fsmn_inner, cfg.dw_kernel

    def lin(key, o, i, bias=True, s=0.1):
        sd[f"{key}.weight"] = torch.randn(o, i) * s
        if bias:
            sd[f"{key}.bias"] = torch.randn(o) * s

    def dw(key, c):
        sd[f"{key}.weight"] = torch.randn(c, 1, k) * 0.1

    def ffconvm(key, o, i, scale_norm=True):
        if scale_norm:
            sd[f"{key}.mdl.0.g"] = torch.rand(1) + 0.5
        else:  # LayerNorm branch (gated FSMN gates)
            sd[f"{key}.mdl.0.weight"] = torch.rand(i) + 0.5
            sd[f"{key}.mdl.0.bias"] = torch.randn(i) * 0.05
        lin(f"{key}.mdl.1", o, i)
        dw(f"{key}.mdl.3.sequential.1.conv", o)

    feat = 3 * cfg.n_mels
    sd[f"{P}.norm.weight"] = torch.rand(feat) + 0.5
    sd[f"{P}.norm.bias"] = torch.randn(feat) * 0.05
    lin(f"{P}.conv1d_encoder", d, feat)
    sd[f"{P}.conv1d_encoder.weight"] = sd[f"{P}.conv1d_encoder.weight"].unsqueeze(-1)
    sd[f"{P}.pos_enc.scale"] = torch.rand(1)
    mm = f"{P}.mdl.intra_mdl.mossformerM"
    for i in range(cfg.depth):
        fl = f"{mm}.layers.{i}"
        ffconvm(f"{fl}.to_hidden", 2 * vu, d)
        ffconvm(f"{fl}.to_qk", qk, d)
        sd[f"{fl}.qk_offset_scale.gamma"] = torch.randn(4, qk) * 0.1 + 1.0
        sd[f"{fl}.qk_offset_scale.beta"] = torch.randn(4, qk) * 0.05
        ffconvm(f"{fl}.to_out", d, vu)
        fb = f"{mm}.fsmn.{i}"
        lin(f"{fb}.conv1.0", inner, d)
        sd[f"{fb}.conv1.0.weight"] = sd[f"{fb}.conv1.0.weight"].unsqueeze(-1)
        sd[f"{fb}.conv1.1.weight"] = torch.full((1,), 0.25)
        sd[f"{fb}.norm1.weight"] = torch.rand(inner) + 0.5
        sd[f"{fb}.norm1.bias"] = torch.randn(inner) * 0.05
        ffconvm(f"{fb}.gated_fsmn.to_u", inner, inner, scale_norm=False)
        ffconvm(f"{fb}.gated_fsmn.to_v", inner, inner, scale_norm=False)
        lin(f"{fb}.gated_fsmn.fsmn.linear", inner, inner)
        lin(f"{fb}.gated_fsmn.fsmn.project", inner, inner, bias=False)
        sd[f"{fb}.gated_fsmn.fsmn.conv1.weight"] = torch.randn(inner, 1, 2 * cfg.lorder - 1, 1) * 0.1
        sd[f"{fb}.norm2.weight"] = torch.rand(inner) + 0.5
        sd[f"{fb}.norm2.bias"] = torch.randn(inner) * 0.05
        lin(f"{fb}.conv2", d, inner)
        sd[f"{fb}.conv2.weight"] = sd[f"{fb}.conv2.weight"].unsqueeze(-1)
    sd[f"{P}.mdl.intra_mdl.norm.weight"] = torch.rand(d) + 0.5
    sd[f"{P}.mdl.intra_mdl.norm.bias"] = torch.randn(d) * 0.05
    sd[f"{P}.mdl.intra_norm.weight"] = torch.rand(d) + 0.5
    sd[f"{P}.mdl.intra_norm.bias"] = torch.randn(d) * 0.05
    sd[f"{P}.prelu.weight"] = torch.full((1,), 0.25)
    sd[f"{P}.conv1d_out.weight"] = torch.randn(2 * d, d, 1) * 0.1
    sd[f"{P}.conv1d_out.bias"] = torch.randn(2 * d) * 0.1
    lin(f"{P}.output.0", d, d)
    sd[f"{P}.output.0.weight"] = sd[f"{P}.output.0.weight"].unsqueeze(-1)
    lin(f"{P}.output_gate.0", d, d)
    sd[f"{P}.output_gate.0.weight"] = sd[f"{P}.output_gate.0.weight"].unsqueeze(-1)
    sd[f"{P}.conv1_decoder.weight"] = torch.randn(cfg.stft_bins, d, 1) * 0.1
    return sd


def test_import_mossformer2_se_structure_and_forward():
    import dataclasses

    import jax

    from audiojax.models.mossformer2_se import (
        MossFormer2SeConfig, init_mossformer2_se, mossformer2_se_forward)

    cfg = dataclasses.replace(MossFormer2SeConfig(), dim=32, depth=2, group_size=16,
                              qk_dim=8, vu_dim=64, fsmn_inner=16, lorder=4, dw_kernel=5, rot_dim=8)
    sd = _m2se_state_dict(cfg)
    params = import_checkpoint("mossformer2_se", sd, cfg=cfg)
    ref = init_mossformer2_se(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(ref) == jax.tree.structure(params)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(params)):
        gs = tuple(np.asarray(g).shape)
        # scalar PReLU alphas broadcast against our per-channel init
        assert gs == tuple(r.shape) or gs == (1,), (r.shape, gs)

    audio = jnp.asarray((np.random.default_rng(6).standard_normal(48000) * 5000).astype(np.int16)[None])
    out = mossformer2_se_forward(jax.tree.map(jnp.asarray, params), audio, cfg)
    assert out.shape == (1, 48000)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_import_mossformer2_se_tail_fold_golden():
    """tail_gate == output‖output_gate applied to the speaker-0 conv1d_out rows."""
    import dataclasses

    from audiojax.models.mossformer2_se import MossFormer2SeConfig

    cfg = dataclasses.replace(MossFormer2SeConfig(), dim=32, depth=1, group_size=16,
                              qk_dim=8, vu_dim=64, fsmn_inner=16, lorder=4, dw_kernel=5, rot_dim=8)
    sd = _m2se_state_dict(cfg)
    params = import_checkpoint("mossformer2_se", sd, cfg=cfg, strict=False)

    d = cfg.dim
    x = np.random.default_rng(7).standard_normal(d).astype(np.float32)
    spk = sd["mossformer_se.conv1d_out.weight"].numpy()[:d, :, 0] @ x \
        + sd["mossformer_se.conv1d_out.bias"].numpy()[:d]
    want = np.concatenate([
        sd["mossformer_se.output.0.weight"].numpy()[:, :, 0] @ spk + sd["mossformer_se.output.0.bias"].numpy(),
        sd["mossformer_se.output_gate.0.weight"].numpy()[:, :, 0] @ spk + sd["mossformer_se.output_gate.0.bias"].numpy(),
    ])
    got = x @ np.asarray(params["tail_gate"]["w"]) + np.asarray(params["tail_gate"]["b"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_import_mossformer2_ss_structure_and_forward():
    """ClearVoice separation layout: encoder/decoder convs, dilated-FSMN
    memory stacks imported raw, per-speaker tail fold."""
    import dataclasses

    import jax

    from audiojax.models.mossformer2_ss import (
        MossFormer2SsConfig, init_mossformer2_ss, mossformer2_ss_forward)

    torch.manual_seed(13)
    cfg = dataclasses.replace(MossFormer2SsConfig(), dim=32, depth=2, group_size=16,
                              qk_dim=8, vu_dim=64, fsmn_inner=16, lorder=4,
                              dw_kernel=5, rot_dim=8, mem_depth=2)
    sd = {}
    P, mn = "mossformer_ss", "mossformer_ss.mask_net"
    mm = f"{mn}.mdl.intra_mdl.mossformerM"
    d, qk, vu, inner, k = cfg.dim, cfg.qk_dim, cfg.vu_dim, cfg.fsmn_inner, cfg.dw_kernel

    def lin(key, o, i, bias=True, k1=False, s=0.1):
        w = torch.randn(o, i) * s
        sd[f"{key}.weight"] = w.unsqueeze(-1) if k1 else w
        if bias:
            sd[f"{key}.bias"] = torch.randn(o) * s

    def ffconvm(key, o, i, scale_norm=True):
        if scale_norm:
            sd[f"{key}.mdl.0.g"] = torch.rand(1) + 0.5
        else:
            sd[f"{key}.mdl.0.weight"] = torch.rand(i) + 0.5
            sd[f"{key}.mdl.0.bias"] = torch.randn(i) * 0.05
        lin(f"{key}.mdl.1", o, i)
        sd[f"{key}.mdl.3.sequential.1.conv.weight"] = torch.randn(o, 1, k) * 0.1

    sd[f"{P}.enc.conv1d.weight"] = torch.randn(d, 1, cfg.enc_kernel) * 0.1
    sd[f"{P}.enc.conv1d.bias"] = torch.randn(d) * 0.1
    sd[f"{P}.dec.weight"] = torch.randn(d, 1, cfg.enc_kernel) * 0.1
    sd[f"{P}.dec.bias"] = torch.randn(1) * 0.1
    sd[f"{mn}.norm.weight"] = torch.rand(d) + 0.5
    sd[f"{mn}.norm.bias"] = torch.randn(d) * 0.05
    lin(f"{mn}.conv1d_encoder", d, d, k1=True)
    sd[f"{mn}.pos_enc.scale"] = torch.rand(1)
    for i in range(cfg.depth):
        fl = f"{mm}.layers.{i}"
        ffconvm(f"{fl}.to_hidden", 2 * vu, d)
        ffconvm(f"{fl}.to_qk", qk, d)
        sd[f"{fl}.qk_offset_scale.gamma"] = torch.randn(4, qk) * 0.1 + 1.0
        sd[f"{fl}.qk_offset_scale.beta"] = torch.randn(4, qk) * 0.05
        ffconvm(f"{fl}.to_out", d, vu)
        fb = f"{mm}.fsmn.{i}"
        lin(f"{fb}.conv1.0", inner, d, k1=True)
        sd[f"{fb}.conv1.1.weight"] = torch.full((1,), 0.25)
        for nrm in ("norm1", "norm2"):
            sd[f"{fb}.{nrm}.weight"] = torch.rand(inner) + 0.5
            sd[f"{fb}.{nrm}.bias"] = torch.randn(inner) * 0.05
        ffconvm(f"{fb}.gated_fsmn.to_u", inner, inner, scale_norm=False)
        ffconvm(f"{fb}.gated_fsmn.to_v", inner, inner, scale_norm=False)
        lin(f"{fb}.gated_fsmn.fsmn.linear", inner, inner)
        lin(f"{fb}.gated_fsmn.fsmn.project", inner, inner, bias=False)
        for j in range(cfg.mem_depth):
            cin = inner * (j + 1)
            sd[f"{fb}.gated_fsmn.fsmn.conv.conv{j + 1}.weight"] = \
                torch.randn(inner, cin // inner, 2 * cfg.lorder - 1, 1) * 0.1
            sd[f"{fb}.gated_fsmn.fsmn.conv.norm{j + 1}.weight"] = torch.rand(inner) + 0.5
            sd[f"{fb}.gated_fsmn.fsmn.conv.norm{j + 1}.bias"] = torch.randn(inner) * 0.05
            sd[f"{fb}.gated_fsmn.fsmn.conv.prelu{j + 1}.weight"] = torch.full((inner,), 0.25)
        lin(f"{fb}.conv2", d, inner, k1=True)
    sd[f"{mn}.mdl.intra_mdl.norm.weight"] = torch.rand(d) + 0.5
    sd[f"{mn}.mdl.intra_mdl.norm.bias"] = torch.randn(d) * 0.05
    sd[f"{mn}.mdl.intra_norm.weight"] = torch.rand(d) + 0.5
    sd[f"{mn}.mdl.intra_norm.bias"] = torch.randn(d) * 0.05
    sd[f"{mn}.prelu.weight"] = torch.full((1,), 0.25)
    sd[f"{mn}.conv1d_out.weight"] = torch.randn(cfg.num_spks * d, d, 1) * 0.1
    sd[f"{mn}.conv1d_out.bias"] = torch.randn(cfg.num_spks * d) * 0.1
    lin(f"{mn}.output.0", d, d, k1=True)
    lin(f"{mn}.output_gate.0", d, d, k1=True)
    sd[f"{mn}.conv1_decoder.weight"] = torch.randn(d, d, 1) * 0.1

    params = import_checkpoint("mossformer2_ss", sd, cfg=cfg)
    ref = init_mossformer2_ss(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(ref) == jax.tree.structure(params)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(params)):
        gs = tuple(np.asarray(g).shape)
        assert gs == tuple(r.shape) or gs == (1,), (r.shape, gs)

    audio = jnp.asarray((np.random.default_rng(8).standard_normal(16000) * 5000).astype(np.int16)[None])
    outs = mossformer2_ss_forward(jax.tree.map(jnp.asarray, params), audio, cfg)
    assert len(outs) == 2
    for o in outs:
        assert o.shape == (1, 16000)
        assert bool(jnp.isfinite(o.astype(jnp.float32)).all())


def test_import_mossformer_sr_structure_and_forward():
    """SR importer: mask net (SE recipe, 1-speaker tail fold) + HiFi-GAN
    generator including weight-norm (weight_g/weight_v) composition."""
    import dataclasses

    import jax

    from audiojax.models.mossformer_sr import (
        MossFormerSrConfig, init_mossformer_sr, mossformer_sr_forward)

    torch.manual_seed(14)
    cfg = dataclasses.replace(
        MossFormerSrConfig(), dim=32, depth=1, group_size=16, qk_dim=8, vu_dim=64,
        fsmn_inner=16, lorder=4, dw_kernel=5, rot_dim=8, n_mels=16,
        gen_channels=32, gen_up_rates=(4, 4, 4, 4), gen_up_kernels=(8, 8, 8, 8),
        gen_res_kernels=(3,), gen_res_dilations=(1, 3))
    sd = {}
    mn, mm = "mask_net", "mask_net.mdl.intra_mdl.mossformerM"
    d, qk, vu, inner, k = cfg.dim, cfg.qk_dim, cfg.vu_dim, cfg.fsmn_inner, cfg.dw_kernel

    def lin(key, o, i, bias=True, k1=False, s=0.1):
        w = torch.randn(o, i) * s
        sd[f"{key}.weight"] = w.unsqueeze(-1) if k1 else w
        if bias:
            sd[f"{key}.bias"] = torch.randn(o) * s

    def ffconvm(key, o, i, scale_norm=True):
        if scale_norm:
            sd[f"{key}.mdl.0.g"] = torch.rand(1) + 0.5
        else:
            sd[f"{key}.mdl.0.weight"] = torch.rand(i) + 0.5
            sd[f"{key}.mdl.0.bias"] = torch.randn(i) * 0.05
        lin(f"{key}.mdl.1", o, i)
        sd[f"{key}.mdl.3.sequential.1.conv.weight"] = torch.randn(o, 1, k) * 0.1

    sd[f"{mn}.norm.weight"] = torch.rand(cfg.n_mels) + 0.5
    sd[f"{mn}.norm.bias"] = torch.randn(cfg.n_mels) * 0.05
    lin(f"{mn}.conv1d_encoder", d, cfg.n_mels, k1=True)
    sd[f"{mn}.pos_enc.scale"] = torch.rand(1)
    for i in range(cfg.depth):
        fl = f"{mm}.layers.{i}"
        ffconvm(f"{fl}.to_hidden", 2 * vu, d)
        ffconvm(f"{fl}.to_qk", qk, d)
        sd[f"{fl}.qk_offset_scale.gamma"] = torch.randn(4, qk) * 0.1 + 1.0
        sd[f"{fl}.qk_offset_scale.beta"] = torch.randn(4, qk) * 0.05
        ffconvm(f"{fl}.to_out", d, vu)
        fb = f"{mm}.fsmn.{i}"
        lin(f"{fb}.conv1.0", inner, d, k1=True)
        sd[f"{fb}.conv1.1.weight"] = torch.full((1,), 0.25)
        for nrm in ("norm1", "norm2"):
            sd[f"{fb}.{nrm}.weight"] = torch.rand(inner) + 0.5
            sd[f"{fb}.{nrm}.bias"] = torch.randn(inner) * 0.05
        ffconvm(f"{fb}.gated_fsmn.to_u", inner, inner, scale_norm=False)
        ffconvm(f"{fb}.gated_fsmn.to_v", inner, inner, scale_norm=False)
        lin(f"{fb}.gated_fsmn.fsmn.linear", inner, inner)
        lin(f"{fb}.gated_fsmn.fsmn.project", inner, inner, bias=False)
        sd[f"{fb}.gated_fsmn.fsmn.conv1.weight"] = torch.randn(inner, 1, 2 * cfg.lorder - 1, 1) * 0.1
        lin(f"{fb}.conv2", d, inner, k1=True)
    sd[f"{mn}.mdl.intra_mdl.norm.weight"] = torch.rand(d) + 0.5
    sd[f"{mn}.mdl.intra_mdl.norm.bias"] = torch.randn(d) * 0.05
    sd[f"{mn}.mdl.intra_norm.weight"] = torch.rand(d) + 0.5
    sd[f"{mn}.mdl.intra_norm.bias"] = torch.randn(d) * 0.05
    sd[f"{mn}.prelu.weight"] = torch.full((1,), 0.25)
    sd[f"{mn}.conv1d_out.weight"] = torch.randn(d, d, 1) * 0.1
    sd[f"{mn}.conv1d_out.bias"] = torch.randn(d) * 0.1
    lin(f"{mn}.output.0", d, d, k1=True)
    lin(f"{mn}.output_gate.0", d, d, k1=True)
    sd[f"{mn}.conv1_decoder.weight"] = torch.randn(cfg.n_mels, d, 1) * 0.1

    # generator (weight-norm form for ups + plain for the rest)
    ch = cfg.gen_channels
    sd["generator.conv_pre.weight"] = torch.randn(ch, cfg.n_mels, 7) * 0.1
    sd["generator.conv_pre.bias"] = torch.randn(ch) * 0.1
    for i, (r, kk) in enumerate(zip(cfg.gen_up_rates, cfg.gen_up_kernels)):
        sd[f"generator.snakes.{i}.alpha"] = torch.rand(ch) + 0.5
        w = torch.randn(ch, ch // 2, kk) * 0.1
        sd[f"generator.ups.{i}.weight_v"] = w
        sd[f"generator.ups.{i}.weight_g"] = torch.rand(ch, 1, 1) + 0.5
        sd[f"generator.ups.{i}.bias"] = torch.randn(ch // 2) * 0.1
        ch //= 2
        for j, rk in enumerate(cfg.gen_res_kernels):
            base = f"generator.resblocks.{i * len(cfg.gen_res_kernels) + j}"
            for jj in range(len(cfg.gen_res_dilations)):
                sd[f"{base}.convs1_activates.{jj}.alpha"] = torch.rand(ch) + 0.5
                sd[f"{base}.convs1.{jj}.weight"] = torch.randn(ch, ch, rk) * 0.1
                sd[f"{base}.convs1.{jj}.bias"] = torch.randn(ch) * 0.1
                sd[f"{base}.convs2_activates.{jj}.alpha"] = torch.rand(ch) + 0.5
                sd[f"{base}.convs2.{jj}.weight"] = torch.randn(ch, ch, rk) * 0.1
                sd[f"{base}.convs2.{jj}.bias"] = torch.randn(ch) * 0.1
    sd["generator.snake_post.alpha"] = torch.rand(ch) + 0.5
    sd["generator.conv_post.weight"] = torch.randn(1, ch, 7) * 0.1
    sd["generator.conv_post.bias"] = torch.randn(1) * 0.1

    params = import_checkpoint("mossformer2_sr", sd, cfg=cfg)
    ref = init_mossformer_sr(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(ref) == jax.tree.structure(params)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(params)):
        gs = tuple(np.asarray(g).shape)
        assert gs == tuple(r.shape) or gs == (1,), (r.shape, gs)

    audio = jnp.asarray((np.random.default_rng(9).standard_normal(8192) * 5000).astype(np.int16)[None])
    out = mossformer_sr_forward(jax.tree.map(jnp.asarray, params), audio, cfg)
    assert out.shape == (1, 8192 * 3)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_import_mossformergan_se_structure_and_forward():
    """SyncANet layout: dense-FSMN blocks, Norm4D folds into Fconv/unfold,
    fused FFConvM pairs, GAU LayerNorm folds, per-head triple-attention
    affines with the D^-1/4 scale, SE layers, sub-pixel decoders."""
    import dataclasses

    import jax

    from audiojax.models.mossformergan_se import (
        MossFormerGanConfig, init_mossformergan, mossformergan_forward)

    torch.manual_seed(15)
    cfg = dataclasses.replace(
        MossFormerGanConfig(), emb_dim=8, uv_channels=16, n_blocks=2, dense_depth=2,
        lorder=3, mf_hidden=16, mf_vdim=8, mf_qk=16, mf_rot=8, dw_kernel=5,
        attn_heads=2, attn_q_ch=2, attn_v_ch=4, fold_window=0)
    c, f = cfg.emb_dim, cfg.n_freqs
    sd = {}

    def conv2d(key, cout, cin, k, bias=True, s=0.1):
        sd[f"{key}.weight"] = torch.randn(cout, cin, *k) * s
        if bias:
            sd[f"{key}.bias"] = torch.randn(cout) * s

    def in2d(key, ch):
        sd[f"{key}.weight"] = torch.rand(ch) + 0.5
        sd[f"{key}.bias"] = torch.randn(ch) * 0.05

    def prelu(key, n=1):
        sd[f"{key}.weight"] = torch.full((n,), 0.25)

    def dense(key):
        for i in range(cfg.dense_depth):
            conv2d(f"{key}.conv{i + 1}", c, c * (i + 1), (2, 3))
            in2d(f"{key}.norm{i + 1}", c)
            prelu(f"{key}.prelu{i + 1}", c)
            fs = f"{key}.fsmn{i + 1}.fsmn"
            sd[f"{fs}.linear.weight"] = torch.randn(c, c) * 0.1
            sd[f"{fs}.linear.bias"] = torch.randn(c) * 0.1
            sd[f"{fs}.project.weight"] = torch.randn(c, c) * 0.1
            sd[f"{fs}.conv1.weight"] = torch.randn(c, 1, 2 * cfg.lorder - 1, 1) * 0.1

    def ffconvm(key, o, i):
        sd[f"{key}.mdl.0.weight"] = torch.rand(i) + 0.5
        sd[f"{key}.mdl.0.bias"] = torch.randn(i) * 0.05
        sd[f"{key}.mdl.1.weight"] = torch.randn(o, i) * 0.1
        sd[f"{key}.mdl.1.bias"] = torch.randn(o) * 0.1
        sd[f"{key}.mdl.3.sequential.1.conv.weight"] = torch.randn(o, 1, cfg.dw_kernel) * 0.1

    conv2d("dense_encoder.conv_1.0", c, 3, (1, 1))
    in2d("dense_encoder.conv_1.1", c)
    prelu("dense_encoder.conv_1.2", c)
    dense("dense_encoder.dilated_dense")
    conv2d("dense_encoder.conv_2.0", c, c, (1, 3))
    in2d("dense_encoder.conv_2.1", c)
    prelu("dense_encoder.conv_2.2", c)

    uvc = cfg.uv_channels
    for i in range(cfg.n_blocks):
        key = f"blocks.{i}"
        # intra: Norm4D + Fconv (grouped, each group 1 in-ch, emb_ks out)
        sd[f"{key}.intra_norm.gamma"] = torch.rand(1, c, 1, 1) + 0.5
        sd[f"{key}.intra_norm.beta"] = torch.randn(1, c, 1, 1) * 0.05
        conv2d(f"{key}.Fconv", c * cfg.emb_ks, 1, (1, cfg.emb_ks))
        sd[f"{key}.inter_norm.gamma"] = torch.rand(1, c, 1, 1) + 0.5
        sd[f"{key}.inter_norm.beta"] = torch.randn(1, c, 1, 1) * 0.05
        for pre in ("intra", "inter"):
            ffconvm(f"{key}.{pre}_to_u", uvc, c * cfg.emb_ks)
            ffconvm(f"{key}.{pre}_to_v", uvc, c * cfg.emb_ks)
            fs = f"{key}.{pre}_rnn.0"
            sd[f"{fs}.linear.weight"] = torch.randn(uvc, uvc) * 0.1
            sd[f"{fs}.linear.bias"] = torch.randn(uvc) * 0.1
            sd[f"{fs}.project.weight"] = torch.randn(uvc, uvc) * 0.1
            sd[f"{fs}.conv1.weight"] = torch.randn(uvc, 1, 2 * cfg.lorder - 1) * 0.1
            sd[f"{key}.{pre}_linear.weight"] = torch.randn(uvc, c, cfg.emb_ks) * 0.1
            sd[f"{key}.{pre}_linear.bias"] = torch.randn(c) * 0.1
            mf = f"{key}.{pre}_mossformer"
            ffconvm(f"{mf}.to_hidden", cfg.mf_hidden, c)
            ffconvm(f"{mf}.to_qk", cfg.mf_qk, c)
            sd[f"{mf}.qk_offset_scale.gamma"] = torch.randn(4, cfg.mf_qk) * 0.1 + 1.0
            sd[f"{mf}.qk_offset_scale.beta"] = torch.randn(4, cfg.mf_qk) * 0.05
            ffconvm(f"{mf}.to_out", c, cfg.mf_vdim)
            se = f"{key}.{pre}_se"
            for pool in ("avg_pool_layer", "max_pool_layer"):
                sd[f"{se}.{pool}.0.weight"] = torch.randn(c // 4, c) * 0.1
                sd[f"{se}.{pool}.0.bias"] = torch.randn(c // 4) * 0.1
                sd[f"{se}.{pool}.2.weight"] = torch.randn(c, c // 4) * 0.1
                sd[f"{se}.{pool}.2.bias"] = torch.randn(c) * 0.1
        for j in range(cfg.attn_heads):
            for qkv, ch in (("Q", cfg.attn_q_ch), ("K", cfg.attn_q_ch), ("V", cfg.attn_v_ch)):
                m = f"{key}.attn_conv_{qkv}_{j}"
                conv2d(f"{m}.0", ch, c, (1, 1))
                prelu(f"{m}.1", 1)
                sd[f"{m}.2.gamma"] = torch.rand(1, ch, 1, f) + 0.5
                sd[f"{m}.2.beta"] = torch.randn(1, ch, 1, f) * 0.05
        conv2d(f"{key}.attn_concat_proj.0", c, cfg.attn_heads * cfg.attn_v_ch, (1, 1))
        prelu(f"{key}.attn_concat_proj.1", 1)
        sd[f"{key}.attn_concat_proj.2.gamma"] = torch.rand(1, c, 1, f) + 0.5
        sd[f"{key}.attn_concat_proj.2.beta"] = torch.randn(1, c, 1, f) * 0.05

    for dec in ("mask_decoder", "complex_decoder"):
        dense(f"{dec}.dense_block")
        conv2d(f"{dec}.sub_pixel.conv", 2 * c, c, (1, 3))
        in2d(f"{dec}.norm", c)
        prelu(f"{dec}.prelu", c)
    conv2d("mask_decoder.conv_1", c, c, (1, 1))
    conv2d("mask_decoder.final_conv", 1, c, (1, 2))
    prelu("mask_decoder.prelu_out", 1)
    conv2d("complex_decoder.conv", 2, c, (1, 2))

    params = import_checkpoint("mossformergan_se", sd, cfg=cfg)
    ref = init_mossformergan(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(ref) == jax.tree.structure(params)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(params)):
        gs = tuple(np.asarray(g).shape)
        assert gs == tuple(r.shape) or gs == (1,), (r.shape, gs)

    audio = jnp.asarray((np.random.default_rng(10).standard_normal(8000) * 5000).astype(np.int16)[None])
    out = mossformergan_forward(jax.tree.map(jnp.asarray, params), audio, cfg)
    assert out.shape == (1, 8000)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_import_mossformergan_subpixel_matches_torch():
    """Our sub-pixel merge must equal torch's view/permute/view exactly."""
    from audiojax.models.mossformergan_se import _decoder  # noqa: F401  (layout under test)

    b, t, f, c, r = 1, 3, 5, 4, 2
    x = torch.randn(b, r * c, t, f)
    ref = x.view(b, r, c, t, f).permute(0, 3, 4, 1, 2).contiguous()  # (b,t,f,r,c)
    ref = ref.view(b, t, f * r, c).numpy()
    ours = np.asarray(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # (b,t,f,rc)
                      .reshape(b, t, f, r, c).reshape(b, t, f * r, c))
    np.testing.assert_allclose(ours, ref, atol=0)


def test_import_zipenhancer_structure_and_forward():
    """ModelScope Zipformer2 layout imports RAW (our model keeps the unfused
    algebraic form); phase r/i heads fuse into one 2-channel conv."""
    import dataclasses

    import jax

    from audiojax.models.zipenhancer import (
        ZipEnhancerConfig, init_zipenhancer, zipenhancer_forward)

    torch.manual_seed(16)
    cfg = dataclasses.replace(
        ZipEnhancerConfig(), channels=16, dense_depth=2, num_heads=2,
        query_head_dim=4, pos_head_dim=2, value_head_dim=4, ff_hidden=24,
        nonlin_hidden=12, conv_kernel=5, pos_dim=8,
        encoder_downsample=((1, 1), (2, 2)), fold_window=0)
    c = cfg.channels
    sd = {}
    P, de = "zip_enhancer", "zip_enhancer.dense_encoder"

    def conv2d(key, cout, cin, k, s=0.1):
        sd[f"{key}.weight"] = torch.randn(cout, cin, *k) * s
        sd[f"{key}.bias"] = torch.randn(cout) * s

    def in2d(key, ch):
        sd[f"{key}.weight"] = torch.rand(ch) + 0.5
        sd[f"{key}.bias"] = torch.randn(ch) * 0.05

    def prelu(key, n):
        sd[f"{key}.weight"] = torch.full((n,), 0.25)

    def lin(key, o, i, bias=True):
        sd[f"{key}.weight"] = torch.randn(o, i) * 0.1
        if bias:
            sd[f"{key}.bias"] = torch.randn(o) * 0.1

    def dense(key):
        for i in range(cfg.dense_depth):
            conv2d(f"{key}.dense_block.{i}.1", c, c * (i + 1), (2, 3))
            in2d(f"{key}.dense_block.{i}.2", c)
            prelu(f"{key}.dense_block.{i}.3", c)

    def zlayer(key):
        h, qd, pdim, vd = cfg.num_heads, cfg.query_head_dim, cfg.pos_head_dim, cfg.value_head_dim
        lin(f"{key}.self_attn_weights.in_proj", h * (2 * qd + pdim), c)
        lin(f"{key}.self_attn_weights.linear_pos", h * pdim, cfg.pos_dim, bias=False)
        for ffn in ("feed_forward1", "feed_forward2", "feed_forward3"):
            lin(f"{key}.{ffn}.in_proj", cfg.ff_hidden, c)
            lin(f"{key}.{ffn}.out_proj", c, cfg.ff_hidden)
        lin(f"{key}.nonlin_attention.in_proj", 3 * cfg.nonlin_hidden, c)
        lin(f"{key}.nonlin_attention.out_proj", c, cfg.nonlin_hidden)
        for san in ("self_attn1", "self_attn2"):
            lin(f"{key}.{san}.in_proj", h * vd, c)
            lin(f"{key}.{san}.out_proj", c, h * vd)
        for cmn in ("conv_module1", "conv_module2"):
            lin(f"{key}.{cmn}.in_proj", 2 * c, c)
            sd[f"{key}.{cmn}.depthwise_conv.weight"] = torch.randn(c, 1, cfg.conv_kernel) * 0.1
            sd[f"{key}.{cmn}.depthwise_conv.bias"] = torch.randn(c) * 0.1
            lin(f"{key}.{cmn}.out_proj", c, c)
        sd[f"{key}.bypass_mid.bypass_scale"] = torch.rand(c)
        sd[f"{key}.bypass.bypass_scale"] = torch.rand(c)
        sd[f"{key}.norm.bias"] = torch.randn(c) * 0.05
        sd[f"{key}.norm.log_scale"] = torch.randn(1) * 0.1

    conv2d(f"{de}.dense_conv_1.0", c, 2, (1, 1))
    in2d(f"{de}.dense_conv_1.1", c)
    prelu(f"{de}.dense_conv_1.2", c)
    dense(f"{de}.dense_block")
    conv2d(f"{de}.dense_conv_2.0", c, c, (1, 3))
    in2d(f"{de}.dense_conv_2.1", c)
    prelu(f"{de}.dense_conv_2.2", c)

    for i, (t_ds, f_ds) in enumerate(cfg.encoder_downsample):
        key = f"{P}.TSConformer.encoders.{i}"
        inner = f"{key}.encoder" if t_ds > 1 or f_ds > 1 else key
        zlayer(f"{inner}.f_layers.0")
        zlayer(f"{inner}.t_layers.0")
        sd[f"{inner}.bypass_layers.0.bypass_scale"] = torch.rand(c)
        sd[f"{inner}.bypass_layers.1.bypass_scale"] = torch.rand(c)
        if t_ds > 1 or f_ds > 1:
            sd[f"{key}.out_combiner.bypass_scale"] = torch.rand(c)
            sd[f"{key}.downsample_t.bias"] = torch.randn(t_ds) * 0.1
            sd[f"{key}.downsample_f.bias"] = torch.randn(f_ds) * 0.1

    for dec, head in (("mask_decoder", "mask_conv"), ("phase_decoder", "phase_conv")):
        dense(f"{P}.{dec}.dense_block")
        conv2d(f"{P}.{dec}.{head}.0.conv1", 2 * c, c, (1, 3))
        in2d(f"{P}.{dec}.{head}.1", c)
        prelu(f"{P}.{dec}.{head}.2", c)
    conv2d(f"{P}.mask_decoder.mask_conv.3", 1, c, (1, 2))
    conv2d(f"{P}.phase_decoder.phase_conv_r", 1, c, (1, 2))
    conv2d(f"{P}.phase_decoder.phase_conv_i", 1, c, (1, 2))

    params = import_checkpoint("zipenhancer", sd, cfg=cfg)
    ref = init_zipenhancer(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(ref) == jax.tree.structure(params)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(params)):
        gs = tuple(np.asarray(g).shape)
        assert gs == tuple(r.shape) or gs == (1,), (r.shape, gs)

    audio = jnp.asarray((np.random.default_rng(11).standard_normal(8000) * 5000).astype(np.int16)[None])
    out = zipenhancer_forward(jax.tree.map(jnp.asarray, params), audio, cfg)
    assert out.shape == (1, 8000)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
