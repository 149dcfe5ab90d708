"""Failure-detection supervisor: crash restart, hang kill, clean pass-through.

Children are plain Python subprocesses (no jax) so the tests are cheap
and exercise the real process-group handling.
"""

import os
import sys
import time

from hypergraph_diffusion_for_recommendation_tpu.utils.supervisor import (
    run_supervised,
    main as supervisor_main,
)

PY = sys.executable


def test_clean_child_no_restart(tmp_path):
    report = run_supervised(
        [PY, "-c", "print('fine')"], max_restarts=3, backoff_s=0.0, log=lambda *_: None
    )
    assert report.outcomes == ["ok"]
    assert report.final_returncode == 0


def test_crash_once_then_resume(tmp_path):
    """First run crashes; the restart (with --resume appended) succeeds."""
    marker = tmp_path / "crashed_once"
    child = (
        "import os, sys\n"
        f"marker = {str(marker)!r}\n"
        "if not os.path.exists(marker):\n"
        "    open(marker, 'w').close()\n"
        "    sys.exit(17)\n"
        "assert '--resume' in sys.argv, sys.argv\n"
        "print('resumed ok')\n"
    )
    script = tmp_path / "child.py"
    script.write_text(child)
    report = run_supervised(
        [PY, str(script)], max_restarts=2, backoff_s=0.0, log=lambda *_: None
    )
    assert report.outcomes == ["exit:17", "ok"]
    assert report.restarts == 1
    assert report.final_returncode == 0


def test_budget_exhausted(tmp_path):
    report = run_supervised(
        [PY, "-c", "import sys; sys.exit(3)"],
        max_restarts=1,
        backoff_s=0.0,
        log=lambda *_: None,
    )
    assert report.outcomes == ["exit:3", "exit:3"]
    assert report.final_returncode == 3


def test_hang_detected_and_killed(tmp_path):
    """A silent child is killed by process group and counted as a hang;
    the restart succeeds (simulating resume after a wedged worker)."""
    marker = tmp_path / "hung_once"
    child = (
        "import os, sys, time\n"
        f"marker = {str(marker)!r}\n"
        "if not os.path.exists(marker):\n"
        "    open(marker, 'w').close()\n"
        "    sys.stdout.write('starting\\n'); sys.stdout.flush()\n"
        "    time.sleep(600)\n"  # wedged: no further output
        "print('recovered')\n"
    )
    script = tmp_path / "child.py"
    script.write_text(child)
    t0 = time.monotonic()
    report = run_supervised(
        [PY, str(script)],
        max_restarts=1,
        hang_timeout=5.0,  # generous vs child startup latency under load
        backoff_s=0.0,
        log=lambda *_: None,
    )
    assert report.outcomes == ["hang", "ok"]
    assert report.final_returncode == 0
    assert time.monotonic() - t0 < 60  # killed promptly, not after 600s


def test_cli_entry(tmp_path):
    rc = supervisor_main(["--max_restarts", "0", "--", PY, "-c", "print('x')"])
    assert rc == 0
    rc = supervisor_main(["--max_restarts", "0", "--", PY, "-c", "import sys; sys.exit(9)"])
    assert rc == 9
