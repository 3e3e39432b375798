"""AST-extraction loader for the reference's torch model definitions.

The reference Export scripts (`/root/reference/*/Export_*.py`) contain
self-contained ``nn.Module`` re-implementations of each network followed by
top-level export code (``torch.onnx.export`` + graph surgery + a subprocess
demo — e.g. /root/reference/GTCRN/Export_GTCRN.py:705-792).  To golden-test
audiojax end-to-end against the reference's *own torch math* we need those
class definitions without running the export tail (which needs onnx,
onnxruntime, downloaded checkpoints, and network access).

This loader parses a reference script with ``ast`` and executes ONLY:

  * ``import``/``from .. import`` statements (unavailable third-party modules
    are stubbed; repo-local imports like ``STFT_Process`` are satisfied from
    a caller-supplied preset namespace),
  * top-level constant assignments (the UPPER_CASE config block — statements
    that fail, e.g. download paths touching ``Path.home()``, are skipped),
  * ``class``/``def`` definitions.

All other top-level statements (the export body) are discarded, so nothing
from the reference runs except the model code the tests explicitly call.
"""
from __future__ import annotations

import ast
import sys
import types
import typing
from pathlib import Path
from unittest import mock

REFERENCE_ROOT = Path("/root/reference")

# Repo-local modules of the reference scripts: never imported; the caller
# pre-seeds the namespace with what the classes need (e.g. STFT_Process).
_SKIP_LOCAL = (
    "STFT_Process",
    "Rewrite_ONNX",
    "audio_onnx_metadata",
    "Example_Audio",
    "Export_",
    "Inference_",
    "Optimize_ONNX",
)

# Third-party modules absent from this image that appear in Export-script
# imports.  Only needed so `from X import Y` resolves; the symbols are used
# exclusively by the export tails we never execute — except beartype /
# ml_collections, which Mel-Band uses at class-definition time and therefore
# get real no-op implementations below.
_STUB_MODULES = [
    "onnx",
    "onnx.helper",
    "onnxruntime",
    "onnxruntime.capi",
    "onnxruntime.capi._pybind_state",
    "onnxslim",
    "pydub",
    "soundfile",
    "librosa",
    "yaml",
    "modelscope",
    "modelscope.pipelines",
    "modelscope.utils",
    "modelscope.utils.constant",
    "modelscope.models",
    "modelscope.models.base",
    "clearvoice",
    "clearvoice.models",
    "clearvoice.models.mossformer_gan_se",
    "clearvoice.models.mossformer_gan_se.generator",
    "clearvoice.models.mossformer2_se",
    "clearvoice.models.mossformer2_se.mossformer2_se_wrapper",
    "clearvoice.models.mossformer2_ss",
    "clearvoice.models.mossformer2_ss.mossformer2",
    "clearvoice.models.mossformer2_sr",
    "clearvoice.models.mossformer2_sr.mossformer2_sr_wrapper",
]


def _install_stubs() -> None:
    for name in _STUB_MODULES:
        if name in sys.modules:
            continue
        try:
            __import__(name)
        except Exception:
            sys.modules[name] = mock.MagicMock(name=f"stub:{name}")

    if "beartype" not in sys.modules:
        bt = types.ModuleType("beartype")
        bt.beartype = lambda obj=None, **kw: (obj if obj is not None else (lambda o: o))
        bt_typing = types.ModuleType("beartype.typing")
        for attr in dir(typing):
            if not attr.startswith("_"):
                setattr(bt_typing, attr, getattr(typing, attr))
        bt.typing = bt_typing
        sys.modules["beartype"] = bt
        sys.modules["beartype.typing"] = bt_typing

    if "torchaudio" not in sys.modules:
        # DFSMN's export needs torchaudio.compliance.kaldi.get_mel_banks at
        # module __init__ time; the image has no torchaudio, so provide a
        # REAL implementation written from the Kaldi formula (not a Mock —
        # the values feed the network).
        import math

        import torch as _torch

        def get_mel_banks(num_bins, window_length_padded, sample_freq,
                          low_freq, high_freq, vtln_low, vtln_high,
                          vtln_warp_factor):
            assert vtln_warp_factor == 1.0, "VTLN warping not implemented"
            num_fft_bins = window_length_padded // 2
            nyquist = 0.5 * sample_freq
            if high_freq <= 0.0:
                high_freq += nyquist
            fft_bin_width = sample_freq / window_length_padded
            mel_low = 1127.0 * math.log(1.0 + low_freq / 700.0)
            mel_high = 1127.0 * math.log(1.0 + high_freq / 700.0)
            mel_delta = (mel_high - mel_low) / (num_bins + 1)
            b = _torch.arange(num_bins, dtype=_torch.float64).unsqueeze(1)
            left, center, right = (mel_low + (b + k) * mel_delta for k in (0, 1, 2))
            center_freqs = 700.0 * ((center / 1127.0).exp() - 1.0)
            mel = (1127.0 * (1.0 + fft_bin_width
                             * _torch.arange(num_fft_bins, dtype=_torch.float64)
                             / 700.0).log()).unsqueeze(0)
            up = (mel - left) / (center - left)
            down = (right - mel) / (right - center)
            banks = _torch.clamp(_torch.minimum(up, down), min=0.0)
            return banks.float(), center_freqs.float()

        def melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate,
                            norm=None, mel_scale="htk"):
            """Slaney-scale mel filterbank (torchaudio.functional semantics),
            implemented from the Slaney formula — MossFormer-SR feeds these
            values into the network."""
            assert mel_scale == "slaney" and norm == "slaney"

            def hz_to_mel(f):
                f = _torch.as_tensor(f, dtype=_torch.float64)
                lin = 3.0 * f / 200.0
                logstep = math.log(6.4) / 27.0
                return _torch.where(f >= 1000.0,
                                    15.0 + (f / 1000.0).log() / logstep, lin)

            def mel_to_hz(m):
                logstep = math.log(6.4) / 27.0
                return _torch.where(m >= 15.0,
                                    1000.0 * ((m - 15.0) * logstep).exp(),
                                    200.0 * m / 3.0)

            all_freqs = _torch.linspace(0, sample_rate // 2, n_freqs,
                                        dtype=_torch.float64)
            m_pts = _torch.linspace(hz_to_mel(f_min).item(), hz_to_mel(f_max).item(),
                                    n_mels + 2, dtype=_torch.float64)
            f_pts = mel_to_hz(m_pts)
            f_diff = f_pts[1:] - f_pts[:-1]
            slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)  # (n_freqs, n_mels+2)
            down = -slopes[:, :-2] / f_diff[:-1]
            up = slopes[:, 2:] / f_diff[1:]
            fb = _torch.clamp(_torch.minimum(down, up), min=0.0)
            enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
            return (fb * enorm.unsqueeze(0)).float()

        ta = types.ModuleType("torchaudio")
        compliance = types.ModuleType("torchaudio.compliance")
        kaldi = types.ModuleType("torchaudio.compliance.kaldi")
        kaldi.get_mel_banks = get_mel_banks
        compliance.kaldi = kaldi
        ta.compliance = compliance
        functional = types.ModuleType("torchaudio.functional")
        functional.melscale_fbanks = melscale_fbanks
        ta.functional = functional
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.compliance"] = compliance
        sys.modules["torchaudio.compliance.kaldi"] = kaldi
        sys.modules["torchaudio.functional"] = functional

    if "ml_collections" not in sys.modules:
        mlc = types.ModuleType("ml_collections")

        class ConfigDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:  # pragma: no cover
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        mlc.ConfigDict = ConfigDict
        sys.modules["ml_collections"] = mlc


def _assignments_only(body: list) -> bool:
    """True if a statement list contains only (possibly nested-if) assignments
    and class/function DEFINITIONS — i.e. executing it can at worst compute a
    constant or define code, never export/write.  Definitions matter for
    backend-switched exports (DFSMN_AEC embeds each light-AEC NET class under
    ``if LIGHT_AEC_MODEL == ...:``)."""
    for stmt in body:
        if isinstance(stmt, (ast.Assign, ast.AnnAssign, ast.AugAssign, ast.Pass,
                             ast.ClassDef, ast.FunctionDef, ast.Raise)):
            continue
        if isinstance(stmt, ast.If):
            if not (_assignments_only(stmt.body) and _assignments_only(stmt.orelse)):
                return False
            continue
        return False
    return True


def _is_main_guard(node: ast.If) -> bool:
    t = node.test
    return (
        isinstance(t, ast.Compare)
        and isinstance(t.left, ast.Name)
        and t.left.id == "__name__"
    )


def _is_local_import(node: ast.ImportFrom | ast.Import) -> bool:
    if isinstance(node, ast.ImportFrom):
        mod = node.module or ""
        return any(mod.startswith(p) for p in _SKIP_LOCAL)
    return any(any(a.name.startswith(p) for p in _SKIP_LOCAL) for a in node.names)


class _AtexitShim(types.SimpleNamespace):
    """No-op ``atexit`` stand-in: reference scripts register cleanup hooks via
    top-level *assignments* (``_x = atexit.register(fn)``,
    Export_DFSMN_AEC.py:1370), which the assignment pass would otherwise
    execute — handing untrusted reference code an interpreter-exit hook."""

    @staticmethod
    def register(fn, *a, **k):
        return fn

    @staticmethod
    def unregister(fn):
        pass


def load_reference(relpath: str, preset: dict | None = None) -> dict:
    """Execute the definitions (only) of ``/root/reference/<relpath>``.

    Returns the resulting namespace dict: config constants, classes, and
    functions.  ``preset`` pre-seeds names the script would import from its
    own directory (e.g. ``{"STFT_Process": <class>}``).
    """
    _install_stubs()
    path = REFERENCE_ROOT / relpath
    tree = ast.parse(path.read_text(), filename=str(path))
    ns: dict = {
        "__file__": str(path),
        "__name__": f"_ref_{Path(relpath).stem}",
        "__builtins__": __builtins__,
    }
    if preset:
        ns.update(preset)
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            if _is_local_import(node):
                continue
            exec(compile(ast.Module(body=[node], type_ignores=[]), str(path), "exec"), ns)
            # shim EVERY name the import bound to the real atexit module or
            # its attributes ("import atexit as _ae", "from atexit import
            # register" included), not just the literal "atexit" binding
            import atexit as _real_atexit

            shim = _AtexitShim()
            for alias in node.names:
                bound = alias.asname or alias.name.split(".")[0]
                val = ns.get(bound)
                if val is _real_atexit:
                    ns[bound] = shim
                elif getattr(val, "__module__", None) == "atexit" or (
                    isinstance(node, ast.ImportFrom) and node.module == "atexit"
                ):
                    ns[bound] = getattr(shim, alias.name, shim.register)
        elif isinstance(node, (ast.ClassDef, ast.FunctionDef)):
            exec(compile(ast.Module(body=[node], type_ignores=[]), str(path), "exec"), ns)
        elif isinstance(node, (ast.Assign, ast.AnnAssign, ast.AugAssign)) or (
            isinstance(node, ast.If)
            and not _is_main_guard(node)
            and _assignments_only(node.body)
            and _assignments_only(node.orelse)
        ):
            try:
                exec(compile(ast.Module(body=[node], type_ignores=[]), str(path), "exec"), ns)
            except Exception:
                # Download paths / metadata paths referencing stubbed helpers —
                # irrelevant to the model classes.
                pass
        # every other top-level statement (the export body) is dropped
    return ns


def load_stft_process(model_dir: str) -> type:
    """The reference's per-model ``STFT_Process`` class (L1 DSP kernel)."""
    return load_reference(f"{model_dir}/STFT_Process.py")["STFT_Process"]


def randomize_(module, seed: int, scale: float = 0.05) -> None:
    """Perturb every *parameter* (not structural buffers) plus BatchNorm
    running stats, in place, deterministically.

    Parameters keep torch's per-layer default init (well-scaled, so random
    nets stay numerically sane) and get an additive uniform perturbation so
    constant-initialised ones (LayerNorm γ=1/β=0, PReLU α=0.25) become
    non-trivial for the importer's fusion rules.  Structural buffers (ERB
    filter banks, DFT kernels, rotary tables, eye kernels…) are computed in
    ``__init__`` and must keep their values; BN ``running_mean``/
    ``running_var`` ARE checkpoint state the importer must fuse correctly,
    so they get non-trivial values.
    """
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            # requires_grad=False parameters are structural constants kept in
            # the state dict for compatibility (e.g. GTCRN's analytic ERB
            # filter bank, /root/reference/GTCRN/Export_GTCRN.py:66-68) —
            # perturbing them would break in-module invariants.
            if p.dtype.is_floating_point and p.requires_grad:
                p.add_(torch.empty_like(p).uniform_(-scale, scale, generator=g))
        for name, b in module.named_buffers():
            leaf = name.rsplit(".", 1)[-1]
            if leaf == "running_mean":
                b.copy_(torch.empty_like(b).uniform_(-0.5, 0.5, generator=g))
            elif leaf == "running_var":
                b.copy_(torch.empty_like(b).uniform_(0.5, 2.0, generator=g))


def snr_db(ref, out) -> float:
    """Output SNR of ``out`` against reference signal ``ref`` (both int16/float)."""
    import numpy as np

    ref = np.asarray(ref, np.float64).ravel()
    out = np.asarray(out, np.float64).ravel()
    n = min(ref.size, out.size)
    ref, out = ref[:n], out[:n]
    err = ref - out
    denom = float(np.sum(err * err))
    if denom == 0.0:
        return float("inf")
    return 10.0 * float(np.log10(np.sum(ref * ref) / denom))
