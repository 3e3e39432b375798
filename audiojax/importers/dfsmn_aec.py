"""DFSMN-AEC cascade importer: backend ckpt + ModelScope DFSMN-AEC net.

Parity target: /root/reference/DFSMN_AEC/Export_DFSMN_AEC.py:1420-1470 — the
cascade loads TWO upstream checkpoints (the light-AEC backend selected by
config, plus the ModelScope DFSMN mask net).  Pass their UNION as one dict
(the key spaces don't collide: backend keys are ``in_ch_lstm``/``kg_net``/…,
the mask net uses ``linear1.linear``/``deepfsmn.*``/``linear2.linear`` and
the VAD head ``linear3.linear``, :1318).

The reference folds the preprocessor CMVN (shift, scale) into the first
affine (:1114-1124); pass ``cmvn=(shift, scale)`` (each (3·n_mels,)) to apply
the same fold — omitted, the feature linear imports unfolded.
"""
from __future__ import annotations

import numpy as np

from .common import linear, to_np, unwrap_state_dict
from .deep_echo import import_deep_echo
from .dfsmn import import_dfsmn
from .nkf import import_nkf
from .sdaec import import_sdaec

__all__ = ["import_dfsmn_aec"]

_BACKEND_IMPORTERS = {"sdaec": import_sdaec, "deep_echo": import_deep_echo, "nkf": import_nkf}


def import_dfsmn_aec(ckpt, cfg=None, *, cmvn=None):
    """Union of backend + ModelScope DFSMN-AEC state dicts → cascade params."""
    from ..models.dfsmn_aec import DfsmnAecConfig

    cfg = cfg or DfsmnAecConfig()
    sd = unwrap_state_dict(ckpt)
    params = {
        "backend": _BACKEND_IMPORTERS[cfg.backend](sd),
        "mask_net": import_dfsmn(sd),
    }
    if cmvn is not None:
        shift = np.asarray(cmvn[0], np.float64)
        scale = np.asarray(cmvn[1], np.float64)
        w = np.asarray(params["mask_net"]["lin1"]["w"], np.float64)  # (in, out)
        b = np.asarray(params["mask_net"]["lin1"]["b"], np.float64)
        params["mask_net"]["lin1"] = {
            "w": (w * scale[:, None]).astype(np.float32),
            "b": (b + (shift * scale) @ w).astype(np.float32),
        }
    if "linear3.linear.weight" in sd:
        params["vad_head"] = linear(sd, "linear3.linear")
    return params
