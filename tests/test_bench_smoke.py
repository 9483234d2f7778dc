"""bench.py headline contract: the driver captures stdout and parses the
LAST-printed JSON line within a bounded time budget.  Round 4 lost its
headline (BENCH_r04.json rc=124, parsed:null) because the JSON printed
after ~8 informational sections; bench.py now prints it immediately after
the bf16+int8 measurements.  This test runs ``bench.py --smoke`` (tiny
grid, CPU backend) and asserts:

* exit code 0,
* stdout's FIRST line is the headline JSON with the required keys,
* stdout contains exactly one line (diagnostics go to stderr).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_smoke_headline_first():
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--smoke"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900)
    assert r.returncode == 0, r.stderr[-4000:]
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert lines, f"no stdout from bench.py --smoke: {r.stderr[-2000:]}"
    head = json.loads(lines[0])  # FIRST line must be the headline
    assert head["metric"] == "radar frames/sec/chip (HRRadarPose infer)"
    assert head["unit"] == "frames/s"
    assert head["value"] > 0
    assert 0 < head["vs_baseline"] == pytest.approx(head["value"] / 5000.0,
                                                    abs=1e-3)
    assert len(lines) == 1, f"extra stdout lines pollute the capture: {lines}"
