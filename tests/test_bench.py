"""Guard the canonical scoreboard: bench.py must run end-to-end.

Round 2 shipped a bench.py edit that was never executed (NameError at line
75) so the driver's BENCH artifact was rc=1 and no TPU numbers exist for the
round.  ``bench.run(smoke=True)`` executes every line of the benchmark with
tiny model depths on the test CPU backend, so a broken scoreboard can no
longer ship.
"""
from __future__ import annotations

import json


def test_bench_smoke_runs_every_line():
    import bench

    payload = bench.run(smoke=True)
    # one JSON line, as the driver expects
    line = json.dumps(payload)
    parsed = json.loads(line)
    assert parsed["smoke"] is True
    assert parsed["unit"] == "RTF"
    for key in ("value", "vs_baseline", "gtcrn_rtf", "gtcrn_stream_rtf_64ms_blocks",
                "gtcrn_stream_chip_rtf_64ms_blocks",
                "mossformer2_se_bf16_rtf", "mossformer2_ss_bf16_rtf", "melband_bf16_rtf",
                "mossformergan_bf16_rtf",
                "zipenhancer_bf16_bs8_rtf_per_clip"):
        assert parsed[key] > 0, key


def test_bench_all_throughput_mode():
    """batch>1 amortizes RTF per clip and labels the row."""
    from audiojax.utils.bench_all import bench_model

    row = bench_model("gtcrn", iters=1, batch=2)
    assert row["model"] == "gtcrn@bs2"
    assert row["rtf"] > 0


def test_bench_all_row_shape():
    """bench_all.bench_model returns the row contract readme_tables consumes."""
    from audiojax.utils.bench_all import bench_model

    row = bench_model("gtcrn", iters=1)
    assert row["model"] == "gtcrn"
    assert row["rtf"] > 0 and row["chunk_s"] > 0
    assert row["baseline_rtf"] == 0.0036
