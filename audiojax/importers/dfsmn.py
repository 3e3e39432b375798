"""DFSMN checkpoint importer: ModelScope DfsmnAns state dict → audiojax pytree.

Key map (ModelScope ``speech_dfsmn_ans_psm_48k_causal``, loaded by
/root/reference/DFSMN/Export_DFSMN.py:151-174):

  linear1.linear.{weight,bias}   → lin1
  deepfsmn.{i}.linear.{weight,bias} / .project.weight / .conv1.weight
                                 → layers[i] (inner residual folded into the
                                   current-frame memory tap)
  linear2.linear.{weight,bias}   → lin2
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .common import to_np, unwrap_state_dict

__all__ = ["import_dfsmn"]


def import_dfsmn(ckpt):
    import jax

    sd = unwrap_state_dict(ckpt)
    layers = []
    i = 0
    while f"deepfsmn.{i}.linear.weight" in sd:
        mem = to_np(sd[f"deepfsmn.{i}.conv1.weight"])  # (C, 1, lorder[, 1])
        if mem.ndim == 4:
            mem = mem[..., 0]
        mem = mem.transpose(2, 1, 0).copy()  # (lorder, 1, C)
        mem[-1, 0, :] += 1.0  # fold the inner residual p1 + conv(p1)
        layers.append(
            {
                "lin": {
                    "w": to_np(sd[f"deepfsmn.{i}.linear.weight"]).T.astype(np.float32),
                    "b": to_np(sd[f"deepfsmn.{i}.linear.bias"]).astype(np.float32),
                },
                "proj": {"w": to_np(sd[f"deepfsmn.{i}.project.weight"]).T.astype(np.float32)},
                "mem": {"w": mem.astype(np.float32)},
            }
        )
        i += 1
    if not layers:
        raise KeyError("no deepfsmn layers found in checkpoint")
    params = {
        "lin1": {
            "w": to_np(sd["linear1.linear.weight"]).T.astype(np.float32),
            "b": to_np(sd["linear1.linear.bias"]).astype(np.float32),
        },
        "lin2": {
            "w": to_np(sd["linear2.linear.weight"]).T.astype(np.float32),
            "b": to_np(sd["linear2.linear.bias"]).astype(np.float32),
        },
        "layers": layers,
    }
    return jax.tree.map(jnp.asarray, params)
