"""bench.py watchdog: the driver-facing failure mode.

A wedged axon relay hangs even ``jax.devices()`` (observed >3 h round 5),
so bench.py arms a timer that emits a parseable error JSON row and exits
instead of hanging the driver forever.  Round 5 added a ``last_good_round``
payload — the newest BENCH_r*.json parsed values — so a wedged-relay
round's capture still reports the last measured state, not a bare zero.
Runs bench.py in a subprocess (the watchdog calls os._exit)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_watchdog_row_parses_and_carries_last_good_round():
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys; sys.path.insert(0, %r); "
        "import bench, time; bench._start_watchdog(); time.sleep(30)"
        % REPO)
    env = dict(os.environ, MC_BENCH_WATCHDOG_S="1")
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          cwd=REPO, capture_output=True, text=True,
                          timeout=120)
    assert proc.returncode == 3, (proc.returncode, proc.stderr[-500:])
    rows = [json.loads(l) for l in proc.stdout.splitlines()
            if l.startswith("{")]
    assert len(rows) == 1, proc.stdout
    row = rows[0]
    # the driver's contract: metric/value/unit/vs_baseline always present
    assert row["metric"] == "decode_tokens_per_sec_per_chip"
    assert row["value"] == 0 and row["vs_baseline"] is None
    assert "wedged" in row["error"]
    # the newest prior capture rides along (BENCH_r04.json exists in-repo)
    good = row["last_good_round"]
    assert good["file"].startswith("BENCH_r")
    assert good["result"]["value"] > 0


def test_watchdog_disabled_by_env():
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys; sys.path.insert(0, %r); "
        "import bench; bench._start_watchdog(); print('alive')" % REPO)
    env = dict(os.environ, MC_BENCH_WATCHDOG_S="0")
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          cwd=REPO, capture_output=True, text=True,
                          timeout=120)
    assert proc.returncode == 0 and "alive" in proc.stdout
