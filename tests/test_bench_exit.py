"""bench.py process-exit contract.

The driver records ``rc`` plus the LAST stdout JSON line of ``python
bench.py`` (BENCH_r{N}.json).  Two invariants keep a flaky axon tunnel
from corrupting that record:

- every exit path (success, stage failure, brownout abort) leaves a
  parseable one-line JSON summary as the last stdout line, and
- the process exits through ``os._exit`` after flushing, so a daemon
  readback thread wedged inside a PJRT call cannot turn the exit into
  SIGABRT ("terminate called ... FATAL: exception not rethrown",
  rc=134 — observed 2026-08-20 on a >390s tunnel brownout).

Replaces the reference's unguarded benchmark entrypoint
(``benchmarks/hubness_attack_benchmark.py`` has no driver contract).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_bench_fault_path_exits_1_with_json_line():
    """An exception inside main() must yield rc=1 (not SIGABRT) and a
    final stdout line that parses as the driver-schema error JSON."""
    env = dict(os.environ)
    env["TVC_BENCH_FAULT"] = "1"
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--small"],
        capture_output=True,
        text=True,
        timeout=120,
        env=env,
        cwd=str(REPO),
    )
    assert proc.returncode == 1, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, "no stdout at all"
    rec = json.loads(lines[-1])
    assert rec["metric"] == "defended_queries_per_sec"
    assert rec["value"] == 0.0
    assert "injected fault" in rec["error"]
    # the traceback goes to stderr for the driver's tail capture
    assert "Traceback" in proc.stderr
