"""Model registry: one place mapping model names → configs/builders/manifests.

Replaces the reference's per-model script cloning (14 near-identical
Inference_*.py) and its demo-audio registry (/root/reference/Example_Audio.py)
with data: every model registers a spec; the session/CLI are generic.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Callable

from .manifest import Manifest

_REFERENCE_EXAMPLES = Path("/root/reference/Test_Examples")

# name → (relative demo wav paths per input), mirroring the reference
# registry (/root/reference/Example_Audio.py:6-21)
EXAMPLE_AUDIO = {
    "gtcrn": ("denoise/gtcrn_mix.wav",),
    "ul_unas": ("denoise/ul_unas_0174.wav",),
    "zipenhancer": ("denoise/speech_with_noise1.wav",),
    "mossformergan_se": ("denoise/speech_with_noise1.wav",),
    "mossformer2_se": ("denoise/speech_with_noise1.wav",),
    "dfsmn": ("denoise/speech_with_noise_48k.wav",),
    "h_gtcrn": ("denoise/h_gtcrn_noisy.wav",),
    "nkf_aec": ("aec/nearend_mic1.wav", "aec/farend_speech1.wav"),
    "sdaec": ("aec/nearend_mic1.wav", "aec/farend_speech1.wav"),
    "deep_echo": ("aec/nearend_mic1.wav", "aec/farend_speech1.wav"),
    "dfsmn_aec": ("aec/nearend_mic1.wav", "aec/farend_speech1.wav"),
    "mossformer2_ss": ("separation/mixed_speech.wav",),
    "melband_roformer": ("denoise/mel_band_roformer.wav",),
    "melband_roformer_stereo": ("denoise/mel_band_roformer.wav",),
    "mossformer2_sr": ("super_resolution/basic_ref_zh.wav",),
}


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    task: str
    make_config: Callable[..., object]
    init_params: Callable[..., object]  # (key, cfg) -> params
    make_forward: Callable[[object], Callable]  # cfg -> fn(params, *audios)
    make_manifest: Callable[[object], Manifest]  # cfg -> Manifest
    # optional low-latency serving: cfg -> (init_fn(batch), step_fn(params,
    # state, chunk), delay_samples).  Present for models with state-carry
    # streaming (the SURVEY.md §5 north star).
    # CONTRACT: every state leaf init_fn(batch) returns must fold the batch
    # axis BATCH-MAJOR (viewing the folded axis as (batch, sub) recovers the
    # lane dimension), and no leaf may be batch-independent — StreamingServer
    # infers each leaf's lane axis from shapes and masks per-lane updates on
    # it; StreamingServer.verify_lane_isolation() checks the contract and the
    # suite runs it for every streaming model.
    make_stream: Callable[[object], tuple] | None = None
    # optional host-side compute-dtype preparation: (params, cfg) -> params.
    # Defaults to casting every f32 leaf to cfg.compute_dtype (see
    # prepare_compute_params); models with deliberate in-tree f32 islands
    # (MossFormer-SR's HiFi-GAN generator) override it.
    prepare_params: Callable[[object, object], object] | None = None


_REGISTRY: dict[str, ModelSpec] = {}


def register(spec: ModelSpec) -> ModelSpec:
    _REGISTRY[spec.name] = spec
    return spec


def get(name: str) -> ModelSpec:
    _ensure_builtin()
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def names() -> list[str]:
    _ensure_builtin()
    return sorted(_REGISTRY)


def has_compute_dtype(cfg) -> bool:
    """True when a model config exposes the activation ``compute_dtype`` knob."""
    return dataclasses.is_dataclass(cfg) and any(
        f.name == "compute_dtype" for f in dataclasses.fields(cfg)
    )


def prepare_compute_params(params, cfg, spec: ModelSpec | None = None):
    """Host-side compute-dtype preparation: cast f32 param leaves to
    ``cfg.compute_dtype`` ONCE, so the model's (idempotent) in-net cast
    traces to a no-op.  Left to the in-net cast alone, the whole-tree
    convert re-materializes per call and costs more HBM traffic than the
    bf16 matmuls save on small-batch models (MossFormer2-SE measured 4.16 ms
    in-jit cast vs 3.40 ms pre-cast vs 3.88 ms f32, v5e).

    Quantized trees ({'q8','scale'} leaves) pass through untouched — their
    scale dtypes are part of the dequant contract, and q8 plans pin
    compute_dtype to f32 anyway."""
    if not has_compute_dtype(cfg):
        return params
    import jax
    import jax.numpy as jnp

    if jnp.dtype(getattr(cfg, "compute_dtype")) == jnp.float32:
        return params
    # defensive: never touch quantized trees (scale dtype = dequant contract)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    if any(str(getattr(k, "key", "")) == "q8" for path, _ in flat for k in path):
        return params
    if spec is not None and spec.prepare_params is not None:
        return spec.prepare_params(params, cfg)
    from ..nn.core import cast_f32_tree

    return cast_f32_tree(params, getattr(cfg, "compute_dtype"))


def example_audio(name: str) -> tuple[Path, ...] | None:
    rel = EXAMPLE_AUDIO.get(name)
    if rel is None:
        return None
    paths = tuple(_REFERENCE_EXAMPLES / r for r in rel)
    return paths if all(p.exists() for p in paths) else None


_BUILTIN_LOADED = False


def _ensure_builtin():
    global _BUILTIN_LOADED
    if _BUILTIN_LOADED:
        return
    # mark loaded only AFTER the import succeeds: a failed model import must
    # keep failing on every call, not leave a silently partial registry
    from . import builtin_models  # noqa: F401  (registers on import)

    _BUILTIN_LOADED = True
