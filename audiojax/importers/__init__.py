"""Checkpoint importers: upstream torch checkpoints → audiojax parameter pytrees.

The reference's deployed artifact IS the checkpoint (weights become ONNX
initializers after the export wrapper's prefusions, SURVEY.md §5).  Here the
equivalent is: ``import_checkpoint(model, ckpt)`` applies the same fusion
recipes (float64) and returns a pytree for ``audiojax.runtime.save_artifact``.

Importers exist for the models whose upstream checkpoints map 1:1 onto our
parameter trees; the remaining families share the same toolbox
(importers.common) and land as their checkpoints are exercised.
"""
from __future__ import annotations

from . import common
from .dfsmn import import_dfsmn
from .gtcrn import import_gtcrn
from .melband import import_melband
from .nkf import import_nkf

_IMPORTERS = {
    "gtcrn": import_gtcrn,
    "dfsmn": import_dfsmn,
    "nkf_aec": import_nkf,
    "melband_roformer": import_melband,
}


def import_checkpoint(model_name: str, ckpt):
    if model_name not in _IMPORTERS:
        raise KeyError(
            f"no importer registered for {model_name!r}; available: {sorted(_IMPORTERS)}"
        )
    return _IMPORTERS[model_name](ckpt)


__all__ = ["common", "import_checkpoint", "import_gtcrn", "import_dfsmn", "import_nkf"]
