"""Mel-Band Roformer checkpoint importer, with optional stereo→mono folding.

Parity target: /root/reference/Mel_Band_Roformer/Mono/Export_MelBandRoformer.py
— the upstream (lucidrains-layout) checkpoint tree:

    band_split.to_features.{b}.0.gamma / .1.{weight,bias}
    layers.{i}.{0|1}.layers.0.0.{norm.gamma,to_qkv,to_gates,to_out.0}   (attn)
    layers.{i}.{0|1}.layers.0.1.net.{0.gamma,1,4}                        (ff)
    layers.{i}.{0|1}.norm.gamma                                          (out)
    mask_estimators.{s}.to_freqs.{b}.0.{0,2,...}.{weight,bias}           (MLP)

(j=0 time transformer, j=1 freq transformer; MLP linears sit at even
Sequential indices with Tanh between, the LAST linear feeds the GLU.)

Stereo→mono folding (:270-344 ``fold_stereo_to_mono``): channel-agnostic
weights copy verbatim; the channel-dependent edges average L/R per
(real, imag) — BandSplit gamma + input-Linear COLUMNS, MaskEstimator final
pre-GLU Linear ROWS (per GLU half).  Column groups of 4 are laid out
[real_L, imag_L, real_R, imag_R].
"""
from __future__ import annotations

import numpy as np

from .common import linear, stereo_to_mono_linear, to_np, unwrap_state_dict

__all__ = ["import_melband", "fold_glu_rows_stereo_to_mono"]


def _rms(sd, key):
    return {"g": to_np(sd[f"{key}.gamma"]).astype(np.float32)}


def _transformer(sd, base):
    attn = f"{base}.layers.0.0"
    ff = f"{base}.layers.0.1.net"
    return {
        "attn": {
            "norm": _rms(sd, f"{attn}.norm"),
            "to_qkv": linear(sd, f"{attn}.to_qkv", bias=False),
            "to_gates": linear(sd, f"{attn}.to_gates"),
            "to_out": linear(sd, f"{attn}.to_out.0", bias=False),
        },
        "ff_norm": _rms(sd, f"{ff}.0"),
        "ff1": linear(sd, f"{ff}.1"),
        "ff2": linear(sd, f"{ff}.4"),
        "out_norm": _rms(sd, f"{base}.norm"),
    }


def _fold_gamma_stereo_to_mono(gamma: np.ndarray) -> np.ndarray:
    """(4·fi,) grouped [re_L, im_L, re_R, im_R] → (2·fi,) L/R average."""
    g4 = gamma.reshape(-1, 2, 2)  # (fi, ch, complex)
    return g4.mean(axis=1).reshape(-1).astype(np.float32)


def fold_glu_rows_stereo_to_mono(w: np.ndarray, b: np.ndarray):
    """Final pre-GLU Linear rows (8·fi = 2 GLU halves × 4·fi) → (4·fi):
    average L/R per (real, imag) within each half
    (Export_MelBandRoformer.py:318-344)."""
    out2, hidden = w.shape
    half = out2 // 2

    def fold(rows):  # (4·fi, …)
        r4 = rows.reshape(-1, 2, 2, *rows.shape[1:])  # (fi, ch, complex, …)
        return r4.mean(axis=1).reshape(-1, *rows.shape[1:])

    w_new = np.concatenate([fold(w[:half]), fold(w[half:])], axis=0)
    b_new = np.concatenate([fold(b[:half]), fold(b[half:])], axis=0)
    return w_new.astype(np.float32), b_new.astype(np.float32)


def import_melband(ckpt, cfg=None, stem: int = 0):
    """Upstream Mel-Band Roformer state dict → audiojax melband params.

    When ``cfg`` targets mono (channels=1) but the checkpoint is stereo
    (band-split input widths are doubled), the reference's stereo→mono L/R
    averaging is applied automatically."""
    from ..models.melband_roformer import MelBandConfig, band_layout

    cfg = cfg or MelBandConfig()
    sd = unwrap_state_dict(ckpt)
    _, widths, _ = band_layout(cfg)

    params = {}
    depth = 0
    while f"layers.{depth}.0.norm.gamma" in sd:
        depth += 1
    if depth != cfg.depth:
        raise ValueError(f"checkpoint has {depth} axial layers, config expects {cfg.depth}")
    for i in range(depth):
        params[f"time{i}"] = _transformer(sd, f"layers.{i}.0")
        params[f"freq{i}"] = _transformer(sd, f"layers.{i}.1")

    # band split (detect stereo checkpoint by the input width of band 0)
    ck_w0 = to_np(sd["band_split.to_features.0.1.weight"]).shape[1]
    fold_mono = cfg.channels == 1 and ck_w0 == 2 * widths[0]
    if not fold_mono and ck_w0 != widths[0]:
        raise ValueError(
            f"band 0 width mismatch: checkpoint {ck_w0}, config {widths[0]} "
            f"(channels={cfg.channels})"
        )
    band_split = []
    for b, w in enumerate(widths):
        gamma = to_np(sd[f"band_split.to_features.{b}.0.gamma"]).astype(np.float32)
        lin = linear(sd, f"band_split.to_features.{b}.1")
        if fold_mono:
            gamma = _fold_gamma_stereo_to_mono(gamma)
            # stereo_to_mono_linear folds torch-layout (out, in) columns
            lin = {"w": stereo_to_mono_linear(lin["w"].T).T, "b": lin["b"]}
        band_split.append({"norm": {"g": gamma}, "lin": lin})
    params["band_split"] = band_split

    # mask estimator MLP: linears at even Sequential indices; last one is the
    # per-band GLU head, the rest are the shared-width tanh hidden stack
    n_lin = 0
    while f"mask_estimators.{stem}.to_freqs.0.0.{2 * n_lin}.weight" in sd:
        n_lin += 1
    if n_lin - 1 != cfg.mask_depth:
        raise ValueError(f"checkpoint mask MLP depth {n_lin - 1}, config expects {cfg.mask_depth}")
    hidden = []
    for j in range(cfg.mask_depth):
        ws, bs = [], []
        for b in range(len(widths)):
            lay = linear(sd, f"mask_estimators.{stem}.to_freqs.{b}.0.{2 * j}")
            ws.append(lay["w"])
            bs.append(lay["b"])
        hidden.append({"w": np.stack(ws), "b": np.stack(bs)})
    params["me_hidden"] = hidden

    me_out = []
    for b in range(len(widths)):
        lay = linear(sd, f"mask_estimators.{stem}.to_freqs.{b}.0.{2 * cfg.mask_depth}")
        if fold_mono:
            w_t, b_t = fold_glu_rows_stereo_to_mono(lay["w"].T, lay["b"])
            lay = {"w": w_t.T, "b": b_t}
        me_out.append(lay)
    params["me_out"] = me_out
    return params
