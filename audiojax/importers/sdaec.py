"""SDAEC checkpoint importer: upstream ICCRN + AlphaPredictor → audiojax.

Parity target: /root/reference/SDAEC/Export_SDAEC.py — the upstream repo
ships TWO checkpoints (ICCRN.ckpt + alpha.ckpt, :477-484); pass their UNION
as one dict (key spaces don't collide).  The recipes re-applied here:

- AlphaPredictor fusion (:371-381): linear2(k→1) ∘ linear1(2→1) over frame
  powers folds into one causal 2-channel conv kernel
  [mix: w₂·w₁[1], far: w₂·w₁[0]] with bias b₂ + Σw₂·b₁.
- ICCRN LayerNorm (:128-170): raw (1, C, F, 1) weights transpose to (F, C);
  the unbiased-variance semantics live in our ``iccrn_layer_norm`` so the raw
  weights import unchanged (no weight_scale fusion needed).
- CFB 1×1 convs → dense, the (3, 1) freq conv → HWIO (1, 3, in, out),
  CH_LSTM_F/T (attr ``lstm2`` + ``linear``; bidirectional uses the torch
  ``_reverse`` suffix, the mid bottleneck stacks num_layers=2).
"""
from __future__ import annotations

import numpy as np

from .common import linear, lstm_params, to_np, unwrap_state_dict

__all__ = ["import_sdaec"]


def _iccrn_ln(sd, key):
    return {"w": to_np(sd[f"{key}.w"])[0, :, :, 0].T.astype(np.float32),
            "b": to_np(sd[f"{key}.b"])[0, :, :, 0].T.astype(np.float32)}


def _dense_1x1(sd, key):
    w = to_np(sd[f"{key}.weight"])  # (out, in, 1, 1)
    return {"w": w[:, :, 0, 0].T.astype(np.float32),
            "b": to_np(sd[f"{key}.bias"]).astype(np.float32)}


def _freq_conv3(sd, key):
    w = to_np(sd[f"{key}.weight"])  # (out, in, 3, 1) — kernel over frequency
    return {"w": w[:, :, :, 0].transpose(2, 1, 0)[None].astype(np.float32),
            "b": to_np(sd[f"{key}.bias"]).astype(np.float32)}


def _ch_lstm_f(sd, key):
    return {
        "fwd": lstm_params(sd, f"{key}.lstm2"),
        "bwd": lstm_params(sd, f"{key}.lstm2", suffix="_reverse"),
        "linear": linear(sd, f"{key}.linear"),
    }


def _ch_lstm_t(sd, key, num_layers=1):
    return {
        "layers": [lstm_params(sd, f"{key}.lstm2", layer=i) for i in range(num_layers)],
        "linear": linear(sd, f"{key}.linear"),
    }


def _cfb(sd, key):
    return {
        "gate": _dense_1x1(sd, f"{key}.conv_gate"),
        "input": _dense_1x1(sd, f"{key}.conv_input"),
        "conv": _freq_conv3(sd, f"{key}.conv"),
        "ln0": _iccrn_ln(sd, f"{key}.LN0"),
        "ln1": _iccrn_ln(sd, f"{key}.LN1"),
        "ln2": _iccrn_ln(sd, f"{key}.LN2"),
        "ceps": {
            "ln": _iccrn_ln(sd, f"{key}.ceps_unit.LN"),
            "lstm": _ch_lstm_f(sd, f"{key}.ceps_unit.ch_lstm_f"),
        },
    }


def _alpha(sd):
    """Fuse linear2 ∘ linear1 into the causal 2-ch conv kernel (k, 2, 1)."""
    w1 = to_np(sd["linear1.weight"])[0]  # (2,)
    b1 = to_np(sd["linear1.bias"])[0]
    w2 = to_np(sd["linear2.weight"])[0]  # (k,)
    b2 = to_np(sd["linear2.bias"])
    k = w2.shape[0]
    kernel = np.zeros((k, 2, 1))
    kernel[:, 0, 0] = w2 * w1[1]  # mix-power taps
    kernel[:, 1, 0] = w2 * w1[0]  # far-power taps
    bias = b2 + w2.sum() * b1
    return {"w": kernel.astype(np.float32), "b": bias.astype(np.float32)}


def import_sdaec(ckpt, cfg=None):
    """Union of the upstream ICCRN + alpha state dicts → audiojax SDAEC params."""
    sd = unwrap_state_dict(ckpt)
    params = {
        "alpha": _alpha(sd),
        "in_lstm": _ch_lstm_f(sd, "in_ch_lstm"),
        "in_conv": _dense_1x1(sd, "in_conv"),
        "mid_ln": _iccrn_ln(sd, "ln"),
        "mid_lstm": _ch_lstm_t(sd, "ch_lstm", num_layers=2),
        "out_lstm": _ch_lstm_t(sd, "out_ch_lstm"),
        "out_conv": _dense_1x1(sd, "out_conv"),
    }
    for i in range(5):
        params[f"enc{i}"] = _cfb(sd, f"cfb_e{i + 1}")
        params[f"dec{i}"] = _cfb(sd, f"cfb_d{5 - i}")
    return params
