"""Checkpoint-import toolbox: torch state-dict → audiojax pytree transforms.

The reference's deployment pipeline bakes dozens of weight *prefusions* into
its export wrappers (SURVEY.md §2.4).  Here those recipes are importer
transforms: load the upstream torch checkpoint, apply the fusion in float64,
and emit arrays in audiojax's layouts.  All functions take/return numpy.

Layout conversions
------------------
torch Linear  (out, in)            → dense  w (in, out)
torch Conv1d  (out, in/g, k)       → conv1d w (k, in/g, out)
torch Conv2d  (out, in/g, kh, kw)  → conv2d w (kh, kw, in/g, out)
torch ConvT{1,2}d                  → equivalent forward kernel (core.deconv_kernel)
torch GRU/LSTM weight_ih/hh (G·H, in) → transposed (in, G·H)

Tolerant checkpoint unwrapping mirrors the reference's loaders
(/root/reference/Deep_Echo_AEC/Export_Deep_Echo.py:56-77).
"""
from __future__ import annotations

import numpy as np

from ..nn.core import deconv_kernel

__all__ = [
    "KeyTracker",
    "unwrap_state_dict",
    "to_np",
    "linear",
    "conv1d_w",
    "conv2d_w",
    "deconv_w",
    "gru_params",
    "lstm_params",
    "fuse_bn_conv2d",
    "fuse_bn_deconv2d",
    "fold_ln_into_linear",
    "prelu_alpha",
    "stereo_to_mono_linear",
]


def to_np(t) -> np.ndarray:
    """torch tensor / array-like → float64 numpy (fusions run in f64)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float64)


class KeyTracker(dict):
    """State dict that records which keys an importer consumed.

    The reference's graph rewrites are fail-closed: they validate the COMPLETE
    expected topology and abort on any drift
    (/root/reference/GTCRN/Rewrite_ONNX_GRU_Zero_State.py:16-24,220-305).  The
    importer-side analog: after an import, any unread checkpoint tensor means
    the upstream layout drifted from the recipe — surfaced by
    :func:`audiojax.importers.import_checkpoint` instead of silently dropped.
    """

    def __init__(self, sd):
        super().__init__(sd)
        self.consumed: set = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)

    def get(self, key, default=None):
        if key in self:
            return self[key]
        return default

    @property
    def unconsumed(self) -> list:
        return sorted(set(self) - self.consumed)


def unwrap_state_dict(ckpt, prefixes=("module.", "model.", "network.", "net.")):
    """Dig the state dict out of common checkpoint wrappers and strip a
    uniform prefix."""
    if isinstance(ckpt, dict):
        for key in ("state_dict", "model_state_dict", "model", "network", "net"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    if not isinstance(ckpt, dict):
        raise TypeError("unsupported checkpoint format (expected a mapping)")
    for prefix in prefixes:
        if ckpt and all(k.startswith(prefix) for k in ckpt):
            ckpt = {k[len(prefix) :]: v for k, v in ckpt.items()}
    return ckpt


def linear(sd, key, bias=True):
    p = {"w": to_np(sd[f"{key}.weight"]).T.astype(np.float32)}
    if bias and f"{key}.bias" in sd:
        p["b"] = to_np(sd[f"{key}.bias"]).astype(np.float32)
    return p


def conv1d_w(w) -> np.ndarray:
    return to_np(w).transpose(2, 1, 0).astype(np.float32)  # (k, in/g, out)


def conv2d_w(w) -> np.ndarray:
    return to_np(w).transpose(2, 3, 1, 0).astype(np.float32)  # (kh, kw, in/g, out)


def deconv_w(w, groups: int = 1) -> np.ndarray:
    return deconv_kernel(to_np(w), groups).astype(np.float32)


def gru_params(sd, key, suffix=""):
    """torch nn.GRU layer-0 weights → audiojax gru params (gate order r|z|n)."""
    return {
        "w_i": to_np(sd[f"{key}.weight_ih_l0{suffix}"]).T.astype(np.float32),
        "w_h": to_np(sd[f"{key}.weight_hh_l0{suffix}"]).T.astype(np.float32),
        "b_i": to_np(sd[f"{key}.bias_ih_l0{suffix}"]).astype(np.float32),
        "b_h": to_np(sd[f"{key}.bias_hh_l0{suffix}"]).astype(np.float32),
    }


def lstm_params(sd, key, suffix="", layer=0):
    return {
        "w_i": to_np(sd[f"{key}.weight_ih_l{layer}{suffix}"]).T.astype(np.float32),
        "w_h": to_np(sd[f"{key}.weight_hh_l{layer}{suffix}"]).T.astype(np.float32),
        "b_i": to_np(sd[f"{key}.bias_ih_l{layer}{suffix}"]).astype(np.float32),
        "b_h": to_np(sd[f"{key}.bias_hh_l{layer}{suffix}"]).astype(np.float32),
    }


def _bn_scale_bias(sd, bn_key, eps=1e-5):
    var = to_np(sd[f"{bn_key}.running_var"])
    mean = to_np(sd[f"{bn_key}.running_mean"])
    gamma = to_np(sd[f"{bn_key}.weight"])
    beta = to_np(sd[f"{bn_key}.bias"])
    scale = gamma / np.sqrt(var + eps)
    return scale, beta - mean * scale


def fuse_bn_conv2d(sd, conv_key, bn_key, groups: int = 1, eps=1e-5):
    """BatchNorm folded into a Conv2d (reference fuse_bn_,
    /root/reference/GTCRN/Export_GTCRN.py:171-194), emitted in HWIO layout.

    ``groups`` is accepted for call-site symmetry but intentionally unused:
    BN scales the OUTPUT channel axis (axis 0 of torch's (out, in/g, kh, kw)
    layout), which grouping never re-partitions — the fold is identical for
    any groups value."""
    w = to_np(sd[f"{conv_key}.weight"])  # (out, in/g, kh, kw)
    scale, bias = _bn_scale_bias(sd, bn_key, eps)
    w = w * scale[:, None, None, None]
    b = bias.copy()
    if f"{conv_key}.bias" in sd:
        b = b + to_np(sd[f"{conv_key}.bias"]) * scale
    return {"w": w.transpose(2, 3, 1, 0).astype(np.float32), "b": b.astype(np.float32)}


def fuse_bn_deconv2d(sd, conv_key, bn_key, groups: int = 1, eps=1e-5):
    """BatchNorm folded into a ConvTranspose2d; the scale applies to the
    OUT-channel axis which for torch deconvs is axis 1 within each group."""
    w = to_np(sd[f"{conv_key}.weight"])  # (in, out/g, kh, kw)
    scale, bias = _bn_scale_bias(sd, bn_key, eps)
    cin, opg = w.shape[0], w.shape[1]
    ipg = cin // groups
    wg = w.reshape(groups, ipg, opg, *w.shape[2:])
    scale_g = scale.reshape(groups, opg)
    wg = wg * scale_g[:, None, :, None, None]
    w = wg.reshape(cin, opg, *w.shape[2:])
    b = bias.copy()
    if f"{conv_key}.bias" in sd:
        b = b + to_np(sd[f"{conv_key}.bias"]) * scale
    return {"w": deconv_kernel(w, groups).astype(np.float32), "b": b.astype(np.float32)}


def fold_ln_into_linear(sd, ln_key, lin_key):
    """Affine LayerNorm folded into the following Linear (f64, the reference's
    recipe: W' = W·diag(γ), b' = W·β + b,
    /root/reference/MossFormerGAN_SE_16K/Export_MossFormer_SE.py:83-92)."""
    w = to_np(sd[f"{lin_key}.weight"])
    b = to_np(sd[f"{lin_key}.bias"]) if f"{lin_key}.bias" in sd else 0.0
    g = to_np(sd[f"{ln_key}.weight"])
    beta = to_np(sd[f"{ln_key}.bias"])
    w2 = w * g[None, :]
    b2 = w @ beta + b
    return {"w": w2.T.astype(np.float32), "b": b2.astype(np.float32)}


def prelu_alpha(sd, key):
    return {"alpha": to_np(sd[f"{key}.weight"]).astype(np.float32)}


def stereo_to_mono_linear(w):
    """Mel-Band mono folding: average the interleaved L/R input columns of a
    band-split Linear (/root/reference/Mel_Band_Roformer/Mono/
    Export_MelBandRoformer.py:270-344).  w: (out, 2·win) → (out, win)."""
    w = to_np(w)
    out, win2 = w.shape
    # stereo layout interleaves (bin, channel, complex): columns alternate L/R
    # per (bin, complex) pair → average each L/R pair
    w4 = w.reshape(out, win2 // 4, 2, 2)  # (out, bins, ch, complex)
    return w4.mean(axis=2).reshape(out, win2 // 2).astype(np.float32)
