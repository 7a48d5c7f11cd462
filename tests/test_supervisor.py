"""Supervisor (tools/supervisor.py): crash restart with resume flags,
hang detection via heartbeat staleness, bounded restarts, event log."""
import json
import sys

from automoe_tpu.tools.supervisor import Supervisor, main

# Child: crashes until a counter file reaches a threshold, then succeeds.
# Records its argv so resume-flag injection can be asserted.
CRASHY = r"""
import json, sys
from pathlib import Path
state = Path(sys.argv[1])
argv_log = Path(sys.argv[2])
n = int(state.read_text()) if state.exists() else 0
state.write_text(str(n + 1))
with argv_log.open("a") as f:
    f.write(json.dumps(sys.argv[3:]) + "\n")
sys.exit(0 if n >= 2 else 1)
"""

# Child: writes one heartbeat then sleeps without ever updating it —
# unless the state file says a previous attempt already hung.
HANGY = r"""
import sys, time
from pathlib import Path
state = Path(sys.argv[1])
hb = Path(sys.argv[2])
n = int(state.read_text()) if state.exists() else 0
state.write_text(str(n + 1))
hb.touch()
if n == 0:
    time.sleep(600)
sys.exit(0)
"""


def _script(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(body)
    return str(p)


def test_crash_restart_with_resume_args(tmp_path):
    script = _script(tmp_path, "crashy.py", CRASHY)
    state, argv_log = tmp_path / "state", tmp_path / "argv.jsonl"
    sup = Supervisor(
        [sys.executable, script, str(state), str(argv_log)],
        max_restarts=5,
        resume_args=["--resume", "full"],
        backoff_s=0.01,
        event_log=str(tmp_path / "events.jsonl"),
    )
    assert sup.run() == 0
    launches = [json.loads(l) for l in argv_log.read_text().splitlines()]
    assert len(launches) == 3  # 2 crashes + 1 success
    assert launches[0] == []  # first attempt: no resume flags
    assert launches[1] == ["--resume", "full"]
    assert launches[2] == ["--resume", "full"]
    events = [json.loads(l)
              for l in (tmp_path / "events.jsonl").read_text().splitlines()]
    kinds = [e["event"] for e in events]
    assert kinds.count("failure") == 2 and kinds[-1] == "success"


def test_bounded_restarts(tmp_path):
    script = _script(tmp_path, "always_fail.py", "import sys; sys.exit(3)")
    sup = Supervisor(
        [sys.executable, script], max_restarts=2, backoff_s=0.01,
    )
    assert sup.run() == 3
    kinds = [e["event"] for e in sup.events]
    assert kinds.count("failure") == 3  # initial + 2 restarts
    assert kinds[-1] == "giving_up"


def test_hang_detection_and_recovery(tmp_path):
    script = _script(tmp_path, "hangy.py", HANGY)
    state, hb = tmp_path / "state", tmp_path / "heartbeat"
    sup = Supervisor(
        [sys.executable, script, str(state), str(hb)],
        max_restarts=2,
        heartbeat_path=str(hb),
        # generous: python startup on a loaded 1-core box can take seconds,
        # and startup time counts against the heartbeat timeout
        heartbeat_timeout_s=15.0,
        backoff_s=0.01,
        poll_s=0.05,
    )
    assert sup.run() == 0
    kinds = [e["event"] for e in sup.events]
    assert "hang_detected" in kinds
    assert kinds[-1] == "success"
    assert int(state.read_text()) == 2  # hung attempt + clean attempt


def test_cli_entry(tmp_path):
    script = _script(tmp_path, "ok.py", "import sys; sys.exit(0)")
    rc = main([
        "--max-restarts", "1", "--backoff", "0.01", "--",
        sys.executable, script,
    ])
    assert rc == 0
