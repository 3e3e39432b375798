"""Checkpoint importers: upstream torch checkpoints → audiojax parameter pytrees.

The reference's deployed artifact IS the checkpoint (weights become ONNX
initializers after the export wrapper's prefusions, SURVEY.md §5).  Here the
equivalent is: ``import_checkpoint(model, ckpt)`` applies the same fusion
recipes (float64) and returns a pytree for ``audiojax.runtime.save_artifact``.

Fail-closed like the reference's graph surgery (SURVEY.md §2.2): every
checkpoint tensor must be consumed by the recipe — an unread key means the
upstream layout drifted, and the import aborts with the leftover keys instead
of silently dropping weights.  A JSON audit report (the rewrite scripts'
report analog, /root/reference/GTCRN/Rewrite_ONNX_GRU_Zero_State.py:307-326)
can be written via ``report_path``.

Importers cover ALL 14 model families (one per reference model directory);
H-GTCRN shares the GTCRN recipe and DFSMN-AEC composes its backend's.
"""
from __future__ import annotations

import json
import re
from pathlib import Path

from . import common
from .common import KeyTracker, unwrap_state_dict
from .dfsmn import import_dfsmn
from .gtcrn import import_gtcrn, import_h_gtcrn
from .deep_echo import import_deep_echo
from .dfsmn_aec import import_dfsmn_aec
from .melband import import_melband
from .mossformer2_se import import_mossformer2_se
from .mossformer2_ss import import_mossformer2_ss
from .mossformer_sr import import_mossformer_sr
from .mossformergan_se import import_mossformergan_se
from .nkf import import_nkf
from .sdaec import import_sdaec
from .ul_unas import import_ul_unas
from .zipenhancer import import_zipenhancer

_IMPORTERS = {
    "gtcrn": import_gtcrn,
    "dfsmn": import_dfsmn,
    "nkf_aec": import_nkf,
    "melband_roformer": import_melband,
    "melband_roformer_stereo": import_melband,
    "sdaec": import_sdaec,
    "deep_echo": import_deep_echo,
    # H-GTCRN's GTCRN-IVA network shares the upstream GTCRN module layout
    # (encoder.en_convs/dpgrnn1/dpgrnn2/decoder.de_convs,
    # /root/reference/H-GTCRN/Export_H_GTCRN.py:383-447); the first encoder
    # conv simply has 18 input channels (6 spatial features × SFE), which the
    # shape-agnostic BN fusions handle unchanged.
    "h_gtcrn": import_h_gtcrn,
    "dfsmn_aec": import_dfsmn_aec,
    "ul_unas": import_ul_unas,
    "mossformer2_se": import_mossformer2_se,
    "mossformer2_ss": import_mossformer2_ss,
    "mossformer2_sr": import_mossformer_sr,
    "mossformergan_se": import_mossformergan_se,
    "zipenhancer": import_zipenhancer,
}

# torch bookkeeping buffers that carry no weights — ignored, not drift.
# BN running_mean/running_var are NOT here: the fusion recipes consume them
# (fold into conv/linear), so an unread running stat means a recipe fused a
# BN's weight/bias but forgot its statistics — that must abort, not pass.
_IGNORED = re.compile(r"num_batches_tracked$|^_metadata")


def import_checkpoint(model_name: str, ckpt, *, strict: bool = True, report_path=None, **kw):
    if model_name not in _IMPORTERS:
        raise KeyError(
            f"no importer registered for {model_name!r}; available: {sorted(_IMPORTERS)}"
        )
    tracker = KeyTracker(unwrap_state_dict(ckpt))
    params = _IMPORTERS[model_name](tracker, **kw)

    leftover = [k for k in tracker.unconsumed if not _IGNORED.search(k)]
    ignored = [k for k in tracker.unconsumed if _IGNORED.search(k)]
    report = {
        "model": model_name,
        "checkpoint_keys": len(tracker),
        "consumed": len(tracker.consumed),
        "ignored_buffers": ignored,
        "unconsumed": leftover,
    }
    if report_path is not None:
        p = Path(report_path)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(report, indent=2))
    if strict and leftover:
        head = leftover[:20]
        raise ValueError(
            f"import drift for {model_name!r}: {len(leftover)} checkpoint keys were "
            f"not consumed by the recipe (first {len(head)}): {head}. "
            "Pass strict=False to import anyway."
        )
    return params


__all__ = ["common", "import_checkpoint", "import_gtcrn", "import_dfsmn",
           "import_nkf", "import_melband", "import_sdaec", "import_deep_echo", "import_h_gtcrn",
           "import_dfsmn_aec", "import_ul_unas", "import_mossformer2_se",
           "import_mossformer2_ss", "import_mossformer_sr",
           "import_mossformergan_se", "import_zipenhancer"]
