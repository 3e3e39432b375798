from .audio_io import read_wav, resample_np, to_mono, write_wav
from .checkpoint import load_artifact, save_artifact
from .manifest import Manifest, validate_manifest_dict
from .session import Session, SessionResult

__all__ = [
    "Manifest",
    "Session",
    "SessionResult",
    "load_artifact",
    "read_wav",
    "resample_np",
    "save_artifact",
    "to_mono",
    "validate_manifest_dict",
    "write_wav",
]
