"""bench.py is the driver's ONLY performance artifact — it must emit one
parseable JSON line under every exit path (rounds 2 and 3 were lost to a
silent timeout and a watchdog zero-emit respectively). These smoke tests run
the real script as a subprocess on the forced-CPU backend.
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BENCH = REPO / "bench.py"


def _env(**over):
    env = dict(os.environ)
    env.pop("BENCH_T0", None)  # fresh budget per test
    env.pop("BENCH_ATTEMPT", None)
    env.pop("PYTHONPATH", None)
    # conftest exports an 8-virtual-device XLA_FLAGS into the pytest process;
    # the driver runs bench.py without it, and 8 CPU "devices" contending for
    # this host's one core stretched warm-up past the oracle gate mid-suite.
    env.pop("XLA_FLAGS", None)
    env.update(
        VISUALRAG_PLATFORM="cpu",
        JAX_PLATFORMS="cpu",  # the session env carries axon; never inherit it
        BENCH_DOCS="40",
        BENCH_QUERIES="64",
        **{k: str(v) for k, v in over.items()},
    )
    return env


def _parse_line(stdout: str) -> dict:
    lines = [ln for ln in stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line in stdout: {stdout!r}"
    return json.loads(lines[-1])


def test_bench_emits_json_and_oracle():
    proc = subprocess.run(
        [sys.executable, str(BENCH)],
        # TAIL_S=60 gates out the 256-round repeats AND the rung ladder
        # (their lead gates need >=100 s of tail), so the run is
        # warm -> quick -> oracle -> done; the oracle itself only needs
        # HARD_CAP-45 of headroom since the r4 gate fix.
        cwd=REPO, env=_env(BENCH_BUDGET_S=25, BENCH_TAIL_S=60,
                           BENCH_HARD_CAP_S=300),
        capture_output=True, text=True, timeout=280,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = _parse_line(proc.stdout)
    assert rec["metric"] == "two_stage_qps_3000doc_bf16"
    assert rec["value"] > 0, rec
    assert rec["unit"] == "queries/s"
    assert rec["vs_baseline"] > 0
    # the exactness witness must have run and passed (CPU f32 is bit-exact)
    assert rec["oracle_ok"] is True, rec


def test_bench_claim_stall_waits_past_hard_cap_then_emits():
    """A terminal-claim stall (no measurement ever) must NOT give up at
    HARD_CAP_S — exiting mid-claim poisons the next process's claim — but
    must still emit the 0.0 JSON line at CLAIM_CAP_S (simulated here with
    the BENCH_FAKE_STALL hook and a tiny cap)."""
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, str(BENCH)],
        cwd=REPO, env=_env(BENCH_FAKE_STALL=1, BENCH_BUDGET_S=5,
                           BENCH_HARD_CAP_S=6, BENCH_CLAIM_CAP_S=18),
        capture_output=True, text=True, timeout=120,
    )
    took = time.time() - t0
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = _parse_line(proc.stdout)
    assert rec["value"] == 0.0
    # survived past HARD_CAP (6 s) and emitted around CLAIM_CAP (18 s)
    assert took > 10, f"gave up at {took:.0f}s (HARD_CAP?)"


def test_bench_sigterm_still_emits_json():
    """External timeout-kill (the round-2 failure mode): TERM mid-run must
    still flush the best-so-far JSON line and exit 0."""
    proc = subprocess.Popen(
        [sys.executable, str(BENCH)],
        cwd=REPO, env=_env(BENCH_BUDGET_S=600, BENCH_TAIL_S=600,
                           BENCH_HARD_CAP_S=900),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        # wait until at least one real measurement exists (the quick pass
        # logs its stage transition to stderr), then simulate driver timeout
        deadline = time.time() + 150
        seen = ""
        while time.time() < deadline:
            line = proc.stderr.readline()
            if not line:
                break
            seen += line
            # any post-quick-pass stage means a measurement exists (r5 stage
            # order: quick_256 -> rung_* -> oracle -> scale -> drift)
            if any(s in line for s in ("rung_", "oracle", "drift")):
                break
        else:
            raise AssertionError(f"never reached a measured stage: {seen}")
        proc.send_signal(signal.SIGTERM)
        out, _err = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0
    rec = _parse_line(out)
    assert rec["value"] > 0, (rec, seen)
