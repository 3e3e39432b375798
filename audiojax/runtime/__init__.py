from .aot import attach_graph, has_graph, load_compiled
from .audio_io import read_audio, read_wav, register_decoder, resample_np, to_mono, write_wav
from .checkpoint import load_artifact, save_artifact
from .manifest import Manifest, validate_manifest_dict
from .optimize import PLANS, Plan, apply_plan, optimize_artifact, plan_for, wrap_forward
from .session import Session, SessionResult
from .streaming import StreamingServer, StreamingSession

__all__ = [
    "Manifest",
    "attach_graph",
    "has_graph",
    "load_compiled",
    "PLANS",
    "Plan",
    "Session",
    "SessionResult",
    "StreamingServer",
    "StreamingSession",
    "apply_plan",
    "load_artifact",
    "optimize_artifact",
    "plan_for",
    "read_audio",
    "read_wav",
    "register_decoder",
    "resample_np",
    "save_artifact",
    "to_mono",
    "validate_manifest_dict",
    "wrap_forward",
    "write_wav",
]
