"""parity_suite mechanics: kit discovery, export path, case grouping, gating.

The reference-parity *math* is covered by tests/test_reference_parity.py;
this file covers the scripted pretrained-weights gate (utils/parity_suite.py)
end-to-end on a synthetic kit: a self-consistent ref passes (the ref wav IS
this framework's output), a noise ref fails, errors are actionable."""
import json

import numpy as np
import pytest
import torch

from test_importers import _gtcrn_state_dict


def _build_kit(tmp_path, seed=0):
    from audiojax.runtime.audio_io import write_wav

    kit = tmp_path / "kit"
    mdir = kit / "gtcrn"
    (mdir / "inputs").mkdir(parents=True)
    (mdir / "ref").mkdir()
    torch.manual_seed(seed)
    torch.save(_gtcrn_state_dict(), mdir / "checkpoint.pt")
    rng = np.random.default_rng(seed)
    noisy = (rng.standard_normal(16000) * 5000).astype(np.int16)
    write_wav(mdir / "inputs" / "case0.wav", noisy, 16000)
    return kit, mdir, noisy


def test_parity_suite_passes_on_self_consistent_kit(tmp_path):
    from audiojax.runtime.audio_io import write_wav
    from audiojax.utils.parity_suite import run_kit, run_model_dir

    kit, mdir, noisy = _build_kit(tmp_path)
    # produce the "reference output" with the same export path the suite
    # uses — the gate must then read ~inf SNR (identical pipeline)
    out = run_model_dir("gtcrn", mdir, workdir=tmp_path / "w0")
    assert out["cases"][0].get("error", "").startswith("missing")

    from audiojax.runtime import Session, load_artifact, registry
    from audiojax.runtime.optimize import wrap_forward

    params, manifest = load_artifact(tmp_path / "w0" / "gtcrn")
    spec = registry.get("gtcrn")
    res = Session(wrap_forward(spec.make_forward(spec.make_config()), manifest),
                  params, manifest).process(noisy[None])
    write_wav(mdir / "ref" / "case0.wav", res.audio, 16000)

    report = run_kit(kit, workdir=tmp_path / "w1")
    assert report["passed"] is True
    (m,) = report["models"]
    assert m["model"] == "gtcrn" and m["cases"][0]["snr_db"] >= 60

    # a noise ref must fail the 40 dB gate
    rng = np.random.default_rng(9)
    write_wav(mdir / "ref" / "case0.wav",
              (rng.standard_normal(16000) * 5000).astype(np.int16), 16000)
    report = run_kit(kit, workdir=tmp_path / "w2")
    assert report["passed"] is False


def test_parity_suite_case_grouping_and_errors(tmp_path):
    from audiojax.utils.parity_suite import _cases, run_kit

    d = tmp_path / "inputs"
    d.mkdir()
    for n in ("a.wav", "b.0.wav", "b.1.wav", "c.2.wav"):
        (d / n).write_bytes(b"")
    cases = _cases(d)
    assert sorted(cases) == ["a", "b", "c"]
    assert [p.name for p in cases["b"]] == ["b.0.wav", "b.1.wav"]

    (tmp_path / "kit" / "not_a_model").mkdir(parents=True)
    with pytest.raises(SystemExit, match="not registry models"):
        run_kit(tmp_path / "kit")


def test_parity_suite_threshold_override(tmp_path):
    from audiojax.utils.parity_suite import run_kit

    kit, mdir, noisy = _build_kit(tmp_path, seed=3)
    (mdir / "config.json").write_text(json.dumps({"threshold_db": -100.0}))
    from audiojax.runtime.audio_io import write_wav

    rng = np.random.default_rng(1)
    write_wav(mdir / "ref" / "case0.wav",
              (rng.standard_normal(16000) * 5000).astype(np.int16), 16000)
    report = run_kit(kit, workdir=tmp_path / "w")
    assert report["passed"] is True  # anything clears a -100 dB gate
