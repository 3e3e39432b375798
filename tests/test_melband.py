"""Mel-Band Roformer: band layout, overlap-average mask, mono/stereo e2e."""
import numpy as np

import jax
import jax.numpy as jnp

from audiojax.models.melband_roformer import (
    MelBandConfig,
    band_layout,
    init_melband,
    melband_forward,
)


def _tiny(ch=1):
    return MelBandConfig(n_fft=256, hop=64, num_bands=8, dim=32, depth=1, heads=2,
                         dim_head=16, mlp_expansion=2, channels=ch, mask_depth=1,
                         sample_rate=44100, in_sample_rate=44100, out_sample_rate=44100)


def test_band_layout_covers_all_bins():
    cfg = _tiny()
    idx, widths, counts = band_layout(cfg)
    f = cfg.f_bins
    assert idx.min() == 0 and idx.max() == f - 1
    # every bin belongs to at least one band (corners forced in)
    covered = np.zeros(f, bool)
    covered[idx] = True
    assert covered.all()
    assert sum(widths) == 2 * len(idx)
    # overlap is at most a couple of bands per bin for a mel layout
    assert counts.max() <= 4


def test_band_layout_stereo_interleave():
    cfg = _tiny(ch=2)
    idx, widths, _ = band_layout(cfg)
    assert idx.max() == 2 * cfg.f_bins - 1
    # stereo pairs are adjacent: for every even entry, its odd partner follows
    assert np.all(idx.reshape(-1, 2)[:, 1] == idx.reshape(-1, 2)[:, 0] + 1)


def test_forward_mono_contract():
    cfg = _tiny()
    params = init_melband(jax.random.PRNGKey(0), cfg)
    audio = jnp.asarray((np.random.default_rng(0).standard_normal(4410) * 8000).astype(np.int16)[None])
    out = melband_forward(params, audio, cfg)
    assert out.shape == (1, 4410)
    assert out.dtype == jnp.int16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_melband_bf16_close_to_f32():
    """bf16 transformer compute (f32 mask/ISTFT island) must stay close to
    f32 — this is the one model the reference even recommends INT8 for
    (README.md:93), so bf16 is well inside its numeric tolerance."""
    import dataclasses

    cfg = _tiny()
    params = init_melband(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    t = np.arange(4410) / 44100.0
    wave = 0.4 * np.sin(2 * np.pi * 880 * t) + 0.05 * rng.standard_normal(4410)
    audio = jnp.asarray((wave * 20000).astype(np.int16)[None])

    f32 = np.asarray(melband_forward(params, audio, cfg)).astype(np.float64)
    bf16 = np.asarray(melband_forward(
        params, audio, dataclasses.replace(cfg, compute_dtype="bfloat16"))).astype(np.float64)
    err = bf16 - f32
    snr = 10 * np.log10(max(np.sum(f32 * f32), 1e-12) / max(np.sum(err * err), 1e-12))
    assert snr > 15, f"bf16 drifted too far from f32: {snr:.1f} dB"


def test_forward_stereo_contract():
    cfg = _tiny(ch=2)
    params = init_melband(jax.random.PRNGKey(1), cfg)
    audio = jnp.asarray((np.random.default_rng(1).standard_normal((1, 2, 4410)) * 8000).astype(np.int16))
    out = melband_forward(params, audio, cfg)
    assert out.shape == (1, 2, 4410)
    assert out.dtype == jnp.int16


# ── checkpoint importer (lucidrains layout; Export_MelBandRoformer.py parity) ──


def _upstream_sd(cfg, widths, *, stereo_widths=None):
    """Synthetic upstream (lucidrains-layout) state dict for a tiny config."""
    import torch

    torch.manual_seed(0)
    inner = cfg.mlp_expansion * cfg.dim
    dim_inner = cfg.heads * cfg.dim_head
    sd = {}
    bw = stereo_widths or widths
    for b, w in enumerate(bw):
        sd[f"band_split.to_features.{b}.0.gamma"] = torch.randn(w)
        sd[f"band_split.to_features.{b}.1.weight"] = torch.randn(cfg.dim, w) * 0.1
        sd[f"band_split.to_features.{b}.1.bias"] = torch.randn(cfg.dim) * 0.1
        sd[f"mask_estimators.0.to_freqs.{b}.0.0.weight"] = torch.randn(inner, cfg.dim) * 0.1
        sd[f"mask_estimators.0.to_freqs.{b}.0.0.bias"] = torch.randn(inner) * 0.1
        sd[f"mask_estimators.0.to_freqs.{b}.0.2.weight"] = torch.randn(2 * w, inner) * 0.1
        sd[f"mask_estimators.0.to_freqs.{b}.0.2.bias"] = torch.randn(2 * w) * 0.1
    for i in range(cfg.depth):
        for j in (0, 1):
            base = f"layers.{i}.{j}"
            sd[f"{base}.layers.0.0.norm.gamma"] = torch.randn(cfg.dim)
            sd[f"{base}.layers.0.0.to_qkv.weight"] = torch.randn(3 * dim_inner, cfg.dim) * 0.1
            sd[f"{base}.layers.0.0.to_gates.weight"] = torch.randn(cfg.heads, cfg.dim) * 0.1
            sd[f"{base}.layers.0.0.to_gates.bias"] = torch.randn(cfg.heads) * 0.1
            sd[f"{base}.layers.0.0.to_out.0.weight"] = torch.randn(cfg.dim, dim_inner) * 0.1
            sd[f"{base}.layers.0.1.net.0.gamma"] = torch.randn(cfg.dim)
            sd[f"{base}.layers.0.1.net.1.weight"] = torch.randn(inner, cfg.dim) * 0.1
            sd[f"{base}.layers.0.1.net.1.bias"] = torch.randn(inner) * 0.1
            sd[f"{base}.layers.0.1.net.4.weight"] = torch.randn(cfg.dim, inner) * 0.1
            sd[f"{base}.layers.0.1.net.4.bias"] = torch.randn(cfg.dim) * 0.1
            sd[f"{base}.norm.gamma"] = torch.randn(cfg.dim)
    return sd


def test_import_melband_structure_and_forward():
    from audiojax.importers import import_checkpoint

    cfg = _tiny()
    _, widths, _ = band_layout(cfg)
    sd = _upstream_sd(cfg, widths)
    from audiojax.importers.melband import import_melband

    params = import_melband(sd, cfg)
    ref = init_melband(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(ref) == jax.tree.structure(params)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(params)):
        assert tuple(r.shape) == tuple(np.asarray(g).shape)

    audio = (np.random.default_rng(0).standard_normal(4410) * 8000).astype(np.int16)[None]
    out = melband_forward(jax.tree.map(jnp.asarray, params), jnp.asarray(audio), cfg)
    assert out.shape == audio.shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_import_melband_mask_estimator_matches_torch():
    """Imported mask-estimator weights through our tanh-stack + GLU must equal
    the upstream Sequential(MLP, GLU) exactly."""
    import torch

    from audiojax.importers.melband import import_melband

    cfg = _tiny()
    _, widths, _ = band_layout(cfg)
    sd = _upstream_sd(cfg, widths)
    params = import_melband(sd, cfg)

    b = 2
    x = torch.randn(7, cfg.dim)
    with torch.no_grad():
        h = torch.tanh(torch.nn.functional.linear(
            x, sd[f"mask_estimators.0.to_freqs.{b}.0.0.weight"],
            sd[f"mask_estimators.0.to_freqs.{b}.0.0.bias"]))
        g = torch.nn.functional.linear(
            h, sd[f"mask_estimators.0.to_freqs.{b}.0.2.weight"],
            sd[f"mask_estimators.0.to_freqs.{b}.0.2.bias"])
        ref = torch.nn.functional.glu(g, dim=-1).numpy()

    xj = jnp.asarray(x.numpy())
    h = jnp.tanh(xj @ jnp.asarray(params["me_hidden"][0]["w"][b]) + jnp.asarray(params["me_hidden"][0]["b"][b]))
    g = h @ jnp.asarray(params["me_out"][b]["w"]) + jnp.asarray(params["me_out"][b]["b"])
    w = widths[b]
    ours = np.asarray(g[..., :w] * jax.nn.sigmoid(g[..., w:]))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_import_melband_stereo_to_mono_fold():
    """Folded mono weights must behave like the stereo weights on an L=R
    input: band-split features equal, and the mono mask equals the L/R mask
    average (Export_MelBandRoformer.py:270-344 semantics)."""
    from audiojax.importers.melband import import_melband

    mono = _tiny(ch=1)
    stereo = _tiny(ch=2)
    _, widths_m, _ = band_layout(mono)
    _, widths_s, _ = band_layout(stereo)
    assert tuple(2 * w for w in widths_m) == tuple(widths_s)
    sd = _upstream_sd(mono, widths_m, stereo_widths=widths_s)
    params = import_melband(sd, mono)  # auto-detects stereo ckpt, folds

    rng = np.random.default_rng(3)
    b = 1
    wm = widths_m[b]
    x = rng.standard_normal(wm).astype(np.float32)  # mono band features
    # stereo input with L = R = x: interleave per (bin, complex) pair
    xs = np.repeat(x.reshape(-1, 2), 2, axis=0).reshape(-1)
    w_st = np.asarray(sd[f"band_split.to_features.{b}.1.weight"])
    w_mo = params["band_split"][b]["lin"]["w"]  # (wm, dim), already transposed
    # mono columns are the L/R AVERAGE, so on an L=R input: W_m x = ½ · W_st xs
    np.testing.assert_allclose(x @ w_mo, 0.5 * (w_st @ xs), atol=1e-5)

    # pre-GLU rows: mono output = L/R average of stereo outputs per (re, im)
    h = rng.standard_normal(mono.mlp_expansion * mono.dim).astype(np.float32)
    w_g = np.asarray(sd[f"mask_estimators.0.to_freqs.{b}.0.2.weight"])
    b_g = np.asarray(sd[f"mask_estimators.0.to_freqs.{b}.0.2.bias"])
    g_st = w_g @ h + b_g  # (2 * 2*wm,)
    halves = g_st.reshape(2, -1)  # per GLU half: (4*fi,) = (fi, ch, complex)
    expect = halves.reshape(2, -1, 2, 2).mean(axis=2).reshape(2, -1).reshape(-1)
    g_mo = h @ params["me_out"][b]["w"] + params["me_out"][b]["b"]
    np.testing.assert_allclose(g_mo, expect, atol=1e-5)


def test_import_melband_stereo_direct():
    """A stereo checkpoint imports 1:1 for a stereo (channels=2) config —
    no L/R folding."""
    from audiojax.importers.melband import import_melband

    stereo = _tiny(ch=2)
    _, ws, _ = band_layout(stereo)
    sd = _upstream_sd(stereo, ws)
    params = import_melband(sd, stereo)
    ref = init_melband(jax.random.PRNGKey(0), stereo)
    assert jax.tree.structure(ref) == jax.tree.structure(params)

    audio = (np.random.default_rng(3).standard_normal((1, 2, 4410)) * 8000).astype(np.int16)
    out = melband_forward(jax.tree.map(jnp.asarray, params), jnp.asarray(audio), stereo)
    assert out.shape == audio.shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
