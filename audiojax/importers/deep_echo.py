"""Deep-Echo-AEC checkpoint importer (ICCRN family, order-10 echo path head).

Parity target: /root/reference/Deep_Echo_AEC/Export_Deep_Echo.py:271-301 —
one CFB encoder + one CFB decoder around a 2-layer time-LSTM bottleneck, with
a (2·order)-channel 1×1 head predicting the complex echo-path filter.  The
LayerNorms (including the CepsUnit's sum_scale=0.25 fp16-safety variant,
:180-208) reduce to the same unbiased-variance form as SDAEC's, so raw
weights import unchanged with eps 1e-8.
"""
from __future__ import annotations

from .common import unwrap_state_dict
from .sdaec import _cfb, _ch_lstm_f, _ch_lstm_t, _dense_1x1, _iccrn_ln

__all__ = ["import_deep_echo"]


def import_deep_echo(ckpt, cfg=None):
    """Upstream Deep-Echo state dict → audiojax deep_echo params."""
    sd = unwrap_state_dict(ckpt)
    return {
        "in_lstm": _ch_lstm_f(sd, "in_ch_lstm"),
        "in_conv": _dense_1x1(sd, "in_conv"),
        "enc": _cfb(sd, "cfb_e1"),
        "mid_ln": _iccrn_ln(sd, "ln"),
        "mid_lstm": _ch_lstm_t(sd, "ch_lstm", num_layers=2),
        "dec": _cfb(sd, "cfb_d1"),
        "out_lstm": _ch_lstm_t(sd, "out_ch_lstm"),
        "out_conv": _dense_1x1(sd, "out_conv"),
    }
