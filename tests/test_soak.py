"""CI smoke of the soak harness (scripts/soak.py): one short CPU run
must execute the full machinery — concurrent WS+SSE workers, a live
hot-swap, the monitor, transfer accounting — and emit a verdict JSON
with every check evaluated. The real artifacts are the banked 16-min
real-chip runs (scripts/soak_result.json, soak_beam_result.json); this
pins that the instrument itself keeps working.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_soak_smoke_cpu(tmp_path):
    out = tmp_path / "soak.json"
    env = dict(os.environ)
    env["NOBS_WHISPER_TPU_HOME"] = str(tmp_path)
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "soak.py"),
         "--minutes", "0.5", "--sessions", "2", "--batch", "2",
         "--platform", "cpu", "--swap-interval", "15",
         "--audio-seconds", "1.5", "--out", str(out)],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode in (0, 1), proc.stderr[-2000:]
    d = json.loads(out.read_text())
    # machinery exercised: cycles ran, a swap happened, monitor sampled
    assert d["cycles"] > 0
    assert d["swaps"] >= 1 and d["swap_failures"] == 0
    assert d["transferred_mb"] > 0
    assert set(d["checks"]) == {
        "watchdog_zero", "no_leaked_sessions", "no_leaked_engines",
        "rss_flat", "p50_stable", "no_errors", "swaps_applied"}
    # lifecycle checks must hold even in the smoke (rss_flat may not:
    # a sub-minute CPU run is dominated by compile growth)
    for k in ("watchdog_zero", "no_leaked_sessions",
              "no_leaked_engines", "no_errors", "swaps_applied"):
        assert d["checks"][k], (k, d)


@pytest.mark.slow
def test_soak_router_smoke_cpu(tmp_path):
    """The ROUTER soak (scripts/soak_router.py): a short CPU run must
    fire a real rolling restart (deterministic interval trigger) with
    zero failed requests — the managed-backend machinery end to end:
    spawn, drain, SIGTERM, respawn, rejoin, requests queued through
    the gap."""
    out = tmp_path / "soak_router.json"
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "soak_router.py"),
         "--minutes", "1.0", "--sessions", "2", "--batch", "2",
         "--platform", "cpu", "--restart-interval-s", "25",
         "--rss-watermark-mb", "0", "--audio-seconds", "1.5",
         "--health-timeout-s", "300", "--out", str(out)],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    d = json.loads(out.read_text())
    assert d["cycles"] > 0
    assert d["restarts"] >= 1          # the roll actually fired
    assert d["rolls_failed"] == 0
    assert d["errors_first10"] == []   # zero failed requests through it
    assert d["ok"], d["checks"]
