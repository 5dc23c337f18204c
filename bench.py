"""Headline benchmark: batched two-stage retrieval QPS on the real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "oracle_ok",
"sustained", "drift", "qps_100k", "qps_100k_single_full", "oracle_100k_ok"}.

Protocol: a ViDoRe-v2-scale synthetic corpus (3000 ColSmol-shaped pages,
320-832 tokens/doc, pooled named vectors, bf16 storage) and batched queries
of 8-24 tokens, searched with the reference's default serving operating
point — two_stage, prefetch_k=200, top_k=10 (reference two_stage.py:128-129)
— in pipelined batches of 256, then opportunistically 512/1024/2048 (best
value wins; bigger batches amortize per-dispatch host+tunnel work).

Round-5 additions (VERDICT r4 #1-#3):
  * the drift loop is INSTRUMENTED: each sample decomposes its batch time
    into dispatch (host pack + enqueue) vs finish (device+tunnel result
    wait), plus independent probes — one tiny device round-trip (tunnel RTT)
    and one host wire-pack timing — and /proc/self/stat vs /proc/stat CPU
    deltas + loadavg. The emitted JSON carries "sustained" (median of drift
    samples) next to the best-of "value", and "drift" holds a fastest- vs
    slowest-quartile decomposition with a heuristic attribution string.
    Per-sample records also land in results/bench_drift_samples.jsonl.
  * the oracle is STRICT on the scan path: two_stage(prefetch=corpus) is
    score-bit-equal to single_full there (BENCH_SUMMARY r4: measured max
    gap 0.0), so the check is exact id-list equality allowing swaps only
    between equal-score ties (strict_rank_equal below; CPU-pinned by
    tests/test_bench_oracle.py). Matches the reference exactness contract
    (two_stage.py:161-180, exact=True).
  * a 100k-doc phase runs inside the same budget: synth 100k in HBM,
    measure two_stage (bs=1024) + single_full (bs=256) + a 100k oracle, and
    emit them as extra keys in the SAME final JSON line — every >=100k
    number in rounds 1-4 was script-self-reported; this one is
    driver-captured.

Robustness (round-3 postmortem — BENCH_r03.json value=0.0):
  * SIGTERM/SIGINT handlers emit the best-so-far JSON line before dying;
  * the watchdog is ADAPTIVE: while NO measurement exists it extends in
    30 s steps up to BENCH_HARD_CAP_S (the axon terminal claim on the first
    device execution can take 5-12+ min if poisoned — CLAUDE.md);
  * corpus is generated directly in HBM (index/synth.py), no host seal;
  * a cheap timed pass runs IMMEDIATELY after warm-up.

Baseline: the reference's published latency illustration for the same plan
is ~50 ms/query on a 1000-doc corpus (two_stage.py:62-64), i.e. 20 QPS; no
absolute QPS is published (BASELINE.md), so vs_baseline = measured_qps / 20.
"""

import json
import os
import signal
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np  # noqa: E402

if os.environ.get("VISUALRAG_PLATFORM"):  # CPU smoke-testing; driver unset
    # Also pin the env var: an inherited JAX_PLATFORMS=axon would initialize
    # the tunnel plugin (and fail UNAVAILABLE if another process holds the
    # terminal claim) even though the config below selects cpu.
    os.environ["JAX_PLATFORMS"] = os.environ["VISUALRAG_PLATFORM"]
    import jax

    jax.config.update("jax_platforms", os.environ["VISUALRAG_PLATFORM"])

BASELINE_QPS = 20.0  # reference two_stage.py:62-64 illustration (~50 ms/query)
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "480"))
# The hard cap exists for claim-stall runs: the axon terminal claim +
# first-compile can eat 6+ min (observed 365 s in the r5 validation), and a
# 550 s cap then starves the 1024/2048 rungs where the headline lives. The
# SIGTERM handler still emits best-so-far if the driver kills us earlier.
HARD_CAP_S = float(os.environ.get("BENCH_HARD_CAP_S", "640"))
# No-measurement cap: while the terminal claim / first execution is still
# pending, the watchdog waits up to this long (see _watchdog for why giving
# up earlier is strictly worse). Once ANY measurement exists, HARD_CAP_S /
# the deadline govern as before.
CLAIM_CAP_S = float(os.environ.get("BENCH_CLAIM_CAP_S", "1800"))
N_DOCS = int(os.environ.get("BENCH_DOCS", "3000"))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", "2048"))
SCALE_DOCS = int(os.environ.get("BENCH_SCALE_DOCS", "100000"))
# T0 survives re-execs (see _retry_fresh_process): the budget is wall-clock
# from the FIRST attempt, not per attempt. NOTE: the env default must be ""
# (falsy) — a "0" default is a truthy STRING, makes T0=0.0 and _elapsed()
# ~1.8e9 s, and the watchdog then emits 0.0 at its first tick (this exact
# bug produced BENCH_r03.json's zero).
_t0_env = os.environ.get("BENCH_T0", "")
T0 = float(_t0_env) if _t0_env else time.time()
os.environ["BENCH_T0"] = str(T0)

_state = {"best_qps": 0.0, "printed": False, "oracle_ok": None,
          "stage": "init", "deadline": BUDGET_S, "samples": [],
          "qps_100k": None, "qps_100k_single_full": None,
          "oracle_100k_ok": None}
_lock = threading.Lock()


# ---------------------------------------------------------------------------
# Strict oracle (VERDICT r4 #3): exact id-list equality modulo equal-score
# tie swaps. On the TPU scan path two_stage(prefetch=corpus) and single_full
# produce BIT-EQUAL scores (measured max gap 0.0), so score_tol=0.0 there;
# CPU f32 reaches the two results through differently-ordered reductions
# (gather-rerank vs doc-major scan), so the CPU smoke allows a few ulps of
# score noise while still requiring rank/set equality.
# ---------------------------------------------------------------------------


def strict_rank_equal(exact_hits, wide_hits, score_tol=0.0):
    """True iff two top-k hit lists agree exactly, allowing reorderings only
    between entries whose scores tie (within ``score_tol``).

    exact_hits: hits with "score"; wide_hits: hits with "score_final".
    Conditions:
      1. same length, scores elementwise equal within score_tol;
      2. every id present in both lists carries the same score in both
         (within score_tol);
      3. ids appearing in only one list must ALL carry the boundary (last)
         score — a tie group straddling the top-k cut is the one place two
         exact engines may legitimately surface different members.
    """
    if len(exact_hits) != len(wide_hits):
        return False
    s_ex = [float(h["score"]) for h in exact_hits]
    s_wd = [float(h.get("score_final", h.get("score"))) for h in wide_hits]
    if any(abs(a - b) > score_tol for a, b in zip(s_ex, s_wd)):
        return False
    ids_ex = [h["id"] for h in exact_hits]
    ids_wd = [h["id"] for h in wide_hits]
    by_ex = dict(zip(ids_ex, s_ex))
    by_wd = dict(zip(ids_wd, s_wd))
    for i in set(ids_ex) & set(ids_wd):
        if abs(by_ex[i] - by_wd[i]) > score_tol:
            return False
    diff = set(ids_ex) ^ set(ids_wd)
    if not diff:
        return True
    if not s_ex:
        return False
    boundary = s_ex[-1]
    return all(abs((by_ex.get(i) if i in by_ex else by_wd[i]) - boundary)
               <= score_tol for i in diff)


def run_strict_oracle(engine, queries, num_docs, score_tol=0.0, top_k=10):
    """single_full vs two_stage(prefetch=corpus) under strict_rank_equal."""
    exact = engine.search_embedded_batch(
        queries, mode="single_full", top_k=top_k, with_payload=False)
    wide = engine.search_embedded_batch(
        queries, mode="two_stage", top_k=top_k, prefetch_k=num_docs,
        with_payload=False)
    return all(strict_rank_equal(ex, wd, score_tol=score_tol)
               for ex, wd in zip(exact, wide))


# ---------------------------------------------------------------------------
# Host/CPU probes for drift attribution (VERDICT r4 #1)
# ---------------------------------------------------------------------------

_CLK = float(os.sysconf("SC_CLK_TCK")) if hasattr(os, "sysconf") else 100.0


def _cpu_snapshot():
    """(self_cpu_s, total_busy_s, idle_s, load1) from procfs; zeros on any
    failure so the probe can never break a measurement."""
    try:
        with open("/proc/self/stat") as f:
            st = f.read()
        fields = st[st.rindex(")") + 2:].split()  # after "comm)" — field 3+
        self_s = (int(fields[11]) + int(fields[12])) / _CLK  # utime+stime
        with open("/proc/stat") as f:
            cpu = f.readline().split()[1:]
        vals = [int(x) for x in cpu[:8]]
        idle_s = (vals[3] + vals[4]) / _CLK  # idle + iowait
        busy_s = (sum(vals) - vals[3] - vals[4]) / _CLK
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
        return self_s, busy_s, idle_s, load1
    except Exception:
        return 0.0, 0.0, 0.0, 0.0


def _quantile(sorted_vals, q):
    if not sorted_vals:
        return 0.0
    i = min(len(sorted_vals) - 1, int(q * (len(sorted_vals) - 1) + 0.5))
    return sorted_vals[i]


def _drift_summary(samples):
    """Fastest- vs slowest-quartile decomposition + attribution heuristic."""
    if len(samples) < 4:
        return {"n": len(samples)}
    by_qps = sorted(samples, key=lambda s: s["qps"])
    nq = max(2, len(samples) // 4)
    slow, fast = by_qps[:nq], by_qps[-nq:]

    def mean(group, k):
        return sum(s[k] for s in group) / len(group)

    keys = ("batch_ms", "disp_ms", "fin_ms", "rtt_ms", "pack_ms",
            "self_cpu_frac", "other_cpu_frac", "load1")
    dec = {k: {"fast": round(mean(fast, k), 2), "slow": round(mean(slow, k), 2)}
           for k in keys}
    # attribution: which per-batch component absorbs the slowdown?
    d_disp = dec["disp_ms"]["slow"] - dec["disp_ms"]["fast"]
    d_fin = dec["fin_ms"]["slow"] - dec["fin_ms"]["fast"]
    d_rtt = dec["rtt_ms"]["slow"] - dec["rtt_ms"]["fast"]
    grew_other_cpu = (dec["other_cpu_frac"]["slow"]
                      > dec["other_cpu_frac"]["fast"] + 0.15)
    if d_fin >= d_disp:
        # result-wait grew: device/tunnel side. If the independent tiny
        # round-trip slowed comparably (relative), it's the tunnel/host RTT,
        # not device compute.
        base_rtt = max(0.5, dec["rtt_ms"]["fast"])
        who = ("tunnel_rtt" if d_rtt > 0.5 * base_rtt else
               "device_or_remote")
        verdict = f"finish_wait ({who})"
    else:
        verdict = ("dispatch_host (co-tenant CPU)" if grew_other_cpu
                   else "dispatch_host (self)")
    if grew_other_cpu:
        verdict += " +host_contention"
    qs = sorted(s["qps"] for s in samples)
    return {
        "n": len(samples),
        "qps_min": round(qs[0], 1), "qps_p25": round(_quantile(qs, 0.25), 1),
        "qps_median": round(_quantile(qs, 0.5), 1),
        "qps_p75": round(_quantile(qs, 0.75), 1), "qps_max": round(qs[-1], 1),
        "decomposition": dec,
        "attribution": verdict,
    }


def _elapsed():
    return time.time() - T0


def _emit():
    with _lock:
        if _state["printed"]:
            return
        _state["printed"] = True
        qps = _state["best_qps"]
        samples = _state["samples"]
        sus = sorted(s["qps"] for s in samples)
        out = {
            "metric": "two_stage_qps_3000doc_bf16",
            "value": round(qps, 1),
            "unit": "queries/s",
            "vs_baseline": round(qps / BASELINE_QPS, 2),
            "oracle_ok": _state["oracle_ok"],
            "sustained": round(_quantile(sus, 0.5), 1) if sus else None,
            "drift": _drift_summary(samples),
            "qps_100k": _state["qps_100k"],
            "qps_100k_single_full": _state["qps_100k_single_full"],
            "oracle_100k_ok": _state["oracle_100k_ok"],
        }
        print(json.dumps(out), flush=True)


def _record(qps):
    with _lock:
        _state["best_qps"] = max(_state["best_qps"], qps)


def _have_measurement():
    with _lock:
        return _state["best_qps"] > 0.0


def _die(signum, _frame):
    # External kill (driver timeout): emit whatever we have, exit cleanly so
    # the line is flushed before the process dies.
    _emit()
    os._exit(0)


def _watchdog():
    # Soft budget while measuring; adaptive extension while the first
    # execution / terminal claim is still pending. While NO measurement
    # exists, giving up is strictly worse than waiting: emitting 0.0 wastes
    # the run AND exits mid-device-execution, which poisons the terminal
    # claim for the NEXT process (observed cascade 2026-08-19: a 640 s-capped
    # run died in its claim, and the following run stalled past 630 s too).
    # So the no-measurement cap is CLAIM_CAP_S (default 30 min); a driver
    # that loses patience SIGTERMs us and _die emits the same best-so-far.
    last_note = 0.0
    while True:
        time.sleep(5.0)
        el = _elapsed()
        if el - last_note >= 30.0:  # breadcrumbs for stall postmortems
            last_note = el
            note = "" if _have_measurement() else " (claim pending)"
            print(f"# t={el:.0f}s stage={_state.get('stage')} "
                  f"best={_state['best_qps']:.0f}{note}",
                  file=sys.stderr, flush=True)
        if _have_measurement():
            if el >= _state["deadline"]:
                break
        elif el >= CLAIM_CAP_S:
            break
    _emit()
    os._exit(0)


def _stage(name):
    with _lock:
        _state["stage"] = name
    print(f"# t={_elapsed():.0f}s -> {name}", file=sys.stderr, flush=True)


def _retry_fresh_process():
    """Backend init failed (axon UNAVAILABLE, observed transiently): retry in
    a FRESH process — jax caches a failed backend for the process lifetime.
    T0/attempt ride through the environment so the budget never resets."""
    attempt = int(os.environ.get("BENCH_ATTEMPT", "0"))
    if _elapsed() > CLAIM_CAP_S - 90 or attempt >= 6:
        _emit()  # out of budget: report what we have (0.0 if never measured)
        os._exit(0)
    os.environ["BENCH_ATTEMPT"] = str(attempt + 1)
    print(f"# backend unavailable (attempt {attempt}); retrying in 20 s",
          file=sys.stderr, flush=True)
    time.sleep(20)
    os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])


def _make_mem_probe():
    """Warm host-to-host memcpy bandwidth (MB/s): distinguishes 'the host
    memory itself slowed' (co-tenant bandwidth contention) from 'the axon
    client spun on tunnel backpressure' when pack_ms balloons — both read
    as self-CPU in /proc, but only the former moves this probe."""
    src = np.ones((4 * 1024 * 1024,), np.float32)  # 16 MB, touched
    dst = np.ones_like(src)

    def probe():
        t0 = time.time()
        np.copyto(dst, src)
        dt = time.time() - t0
        return 16.0 / max(dt, 1e-9)

    probe()  # warm
    return probe


def _make_rtt_probe():
    """Tiny device round-trip (8x128 add + scalar fetch): an independent
    measure of dispatch+tunnel latency, warm-compiled once."""
    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    float(np.asarray(fn(x))[0, 0])  # compile + claim

    def probe():
        t0 = time.time()
        float(np.asarray(fn(x))[0, 0])
        return (time.time() - t0) * 1000.0

    return probe


def _measured_sample(engine, rung, n_rep, kwr, rtt_probe, pack_probe,
                     bs_rung, sink, mem_probe=None):
    """One instrumented drift sample: pipelined batches (depth 2, identical
    mechanics to engine.search_embedded_batches) with dispatch/finish split
    timing, bracketed by CPU snapshots; independent RTT + wire-pack probes
    run OUTSIDE the timed region."""
    from collections import deque

    rtt_ms = rtt_probe()
    pack_ms = pack_probe()
    mem_mbps = mem_probe() if mem_probe is not None else 0.0
    c0 = _cpu_snapshot()
    t0 = time.time()
    disp = fin = 0.0
    n_batches = 0
    pend = deque()
    for qb in rung * n_rep:
        td = time.time()
        pend.append(engine._dispatch_batch(qb, **kwr))
        disp += time.time() - td
        n_batches += 1
        if len(pend) > 2:
            tf = time.time()
            engine._finish_batch(pend.popleft())
            fin += time.time() - tf
    while pend:
        tf = time.time()
        engine._finish_batch(pend.popleft())
        fin += time.time() - tf
    wall = time.time() - t0
    c1 = _cpu_snapshot()
    qps = n_rep * bs_rung * len(rung) / wall
    from visual_rag_tpu.utils.hostbuf import HOST_POOL

    rec = {
        "t": round(_elapsed(), 1), "bs": bs_rung, "qps": round(qps, 1),
        "batch_ms": round(wall * 1000 / n_batches, 1),
        "disp_ms": round(disp * 1000 / n_batches, 1),
        "fin_ms": round(fin * 1000 / n_batches, 1),
        "rtt_ms": round(rtt_ms, 1), "pack_ms": round(pack_ms, 1),
        "self_cpu_frac": round((c1[0] - c0[0]) / max(wall, 1e-6), 3),
        "other_cpu_frac": round(
            max(0.0, (c1[1] - c0[1]) - (c1[0] - c0[0])) / max(wall, 1e-6), 3),
        "load1": c1[3],
        # r5: hostbuf LRU thrash showed up as pack_ms 94->816 ms; the pool
        # counters make eviction-driven slumps attributable in the artifact
        "pool_evictions": HOST_POOL.evictions,
        "pool_mb": round(HOST_POOL._bytes / 1e6, 1),
        "mem_mbps": round(mem_mbps, 0),
    }
    with _lock:
        _state["samples"].append(rec)
    if sink is not None:
        sink.write(json.dumps(rec) + "\n")
        sink.flush()
    return qps


def _scale_phase(all_queries, kwr):
    """100k-doc driver-captured numbers (VERDICT r4 #2): built in HBM next
    to the 3k corpus (~5.6 GB + 0.5 GB of 16 GB), measured with the same
    pipelined protocol, plus a strict 100k oracle. Budget-guarded by the
    caller; any failure leaves the keys null rather than killing the run."""
    from visual_rag_tpu.index.synth import synthetic_index
    from visual_rag_tpu.retrieval import RetrievalEngine

    _stage("synth_100k")
    idx = synthetic_index(SCALE_DOCS, min_tokens=128, max_tokens=256,
                          pooled_rows=12, storage_dtype="bfloat16", seed=2)
    eng = RetrievalEngine(idx)

    # two_stage @100k, bs=1024 (the r4-measured sweet spot: 3170-3739 QPS)
    bs = min(1024, len(all_queries))
    rung = [all_queries[:bs]]
    _stage("warm_100k_two_stage")
    for _ in eng.search_embedded_batches(rung * 2, **kwr):
        pass
    _stage("measure_100k_two_stage")
    best = 0.0
    for i in range(3):
        if i and _elapsed() > _state["deadline"] - 70:
            break  # always take >= 1 rep; a rep is ~5 s warm
        t0 = time.time()
        for _ in eng.search_embedded_batches(rung * 4, **kwr):
            pass
        best = max(best, 4 * bs / (time.time() - t0))
    with _lock:
        _state["qps_100k"] = round(best, 1)

    # single_full @100k, bs=256 (streaming scan kernel; r4: 1351-1360 QPS)
    bs_sf = min(256, len(all_queries))
    rung_sf = [all_queries[:bs_sf]]
    kw_sf = dict(mode="single_full", top_k=10, with_payload=False,
                 return_arrays=True)
    _stage("warm_100k_single_full")
    for _ in eng.search_embedded_batches(rung_sf * 2, **kw_sf):
        pass
    _stage("measure_100k_single_full")
    best_sf = 0.0
    for i in range(2):
        if i and _elapsed() > _state["deadline"] - 45:
            break  # always take >= 1 rep
        t0 = time.time()
        for _ in eng.search_embedded_batches(rung_sf * 4, **kw_sf):
            pass
        best_sf = max(best_sf, 4 * bs_sf / (time.time() - t0))
    with _lock:
        _state["qps_100k_single_full"] = round(best_sf, 1)

    # strict oracle at 100k (same scan-path bit-equality contract as @3k)
    if _elapsed() < _state["deadline"] - 40:
        _stage("oracle_100k")
        try:
            ok = run_strict_oracle(eng, all_queries[:256], idx.num_docs,
                                   score_tol=0.0)
        except Exception:
            ok = False
        with _lock:
            _state["oracle_100k_ok"] = bool(ok)


def main():
    signal.signal(signal.SIGTERM, _die)
    signal.signal(signal.SIGINT, _die)
    threading.Thread(target=_watchdog, daemon=True).start()

    from visual_rag_tpu.index.synth import synthetic_index
    from visual_rag_tpu.retrieval import RetrievalEngine
    from visual_rag_tpu.retrieval import batch as B

    # 3000 ColSmol-shaped pages (5-13 tiles x 64 = 320-832 tokens), bf16,
    # generated in HBM — matches the round-1 corpus distribution without the
    # host-seal transfer. The first execution here also pays the axon
    # terminal claim (the variable part — see module docstring).
    _stage("synth_index")
    try:
        index = synthetic_index(
            N_DOCS, min_tokens=320, max_tokens=832, pooled_rows=10,
            storage_dtype="bfloat16", seed=0)
    except RuntimeError as e:
        if "nable to initialize backend" in str(e) or "UNAVAILABLE" in str(e):
            _retry_fresh_process()
        raise
    engine = RetrievalEngine(index)

    rng = np.random.default_rng(1)
    all_queries = [
        rng.standard_normal((int(rng.integers(8, 25)), 128)).astype(np.float32)
        for _ in range(N_QUERIES)
    ]
    queries = all_queries[: min(512, N_QUERIES)]
    bs = 256  # round-1-proven bucket: compile cache hot, ~100 ms/batch warm
    batches = [queries[s: s + bs] for s in range(0, len(queries), bs)]
    kw = dict(mode="two_stage", top_k=10, prefetch_k=200, with_payload=False)
    # r4: the timed passes use the dense-array result path (return_arrays —
    # vectorized manifest-id mapping, no per-hit dict assembly) and depth-2
    # pipelining; the oracle below still exercises the classic dict path.
    kwr = dict(kw, return_arrays=True)

    # Micro-rung FIRST (r4: the r3 run emitted 0.0 because full 256-batch
    # warm-up ran past the hard cap): one 32-query batch compiles the
    # smallest plan and records a real (if modest) QPS floor right after the
    # terminal claim, so the watchdog can never report zero once ANY
    # execution has succeeded.
    _stage("micro_warm")
    if os.environ.get("BENCH_FAKE_STALL"):  # test hook: simulate a terminal
        time.sleep(10 ** 6)                 # claim that never resolves
    micro = [queries[:32]]
    for _ in engine.search_embedded_batches(micro * 2, **kw):
        pass
    _stage("micro_measure")
    tq = time.time()
    for _ in engine.search_embedded_batches(micro * 4, **kwr):
        pass
    _record(4 * 32 / (time.time() - tq))

    # warm (compile exactly the bench shapes) — don't record: compile/claim
    # time isn't QPS
    _stage("warm_256")
    for _ in engine.search_embedded_batches(batches, **kw):
        pass
    # quick pass: a REAL warm measurement exists within ~1 s of the claim,
    # whatever happens to the longer rounds below
    _stage("quick_256")
    tq = time.time()
    for _ in engine.search_embedded_batches(batches, **kwr):
        pass
    _record(len(queries) / (time.time() - tq))

    # Stage gates are relative to a DEADLINE set once warm-up is done: when
    # cold plan compiles eat 100+ s of the soft budget (fresh compile cache),
    # the later rungs still get their time — the watchdog honors the same
    # deadline, and HARD_CAP_S still bounds the whole run (r4 postmortem:
    # fraction-of-BUDGET gates all expired during a 156 s cold warm-up and
    # the bench emitted the floor measurement only).
    tail_s = float(os.environ.get("BENCH_TAIL_S", "240"))
    deadline = min(HARD_CAP_S - 40.0, max(BUDGET_S, _elapsed() + tail_s))
    with _lock:
        _state["deadline"] = deadline

    # Big rungs FIRST (r5 postmortem: a slow terminal claim + the strict
    # oracle pushed elapsed past the old lead gates and the 1024/2048 rungs
    # — where the 4-5k QPS headline lives (r2/r3 sweeps: 256->2706,
    # 512->3692, 1024->5254) — never ran; the drift loop then fell back to
    # bs=256). The 256 quick pass above is the guaranteed floor; everything
    # after it runs in headline-value order: rungs, oracle, 100k, drift.
    # Gates are sized to WARM reality (r5 validation: warm_256 ran in 1 s on
    # a hot compile cache; a rung is ~15-25 s warm+timed), reserving ~55 s
    # for oracle + the 100k phase — the old 170/150 s leads assumed cold
    # compiles and skipped the rungs exactly on the runs that needed them.
    warm_rungs = []
    for lead_stop, bs_rung in ((95, 1024), (75, 2048)):
        if _elapsed() > deadline - lead_stop:  # leave oracle + 100k their slot
            continue
        _stage(f"rung_{bs_rung}")
        qs = all_queries[:bs_rung]
        if len(qs) < bs_rung:  # cycle to fill the rung
            qs = (qs * (bs_rung // len(qs) + 1))[:bs_rung]
        rung = [qs]
        n_rep = max(2, 8192 // bs_rung)
        for _ in engine.search_embedded_batches(rung * 2, **kwr):  # warm
            pass
        warm_rungs.append((bs_rung, rung, n_rep))
        for _ in range(2):
            if _elapsed() > deadline - (lead_stop - 25):
                break
            t0 = time.time()
            for _res in engine.search_embedded_batches(rung * n_rep, **kwr):
                pass
            _record(n_rep * bs_rung / (time.time() - t0))

    # Correctness oracle (after the first measurements so it can never block
    # getting a number): STRICT — two_stage with prefetch covering the whole
    # corpus rides the scan rerank (B*K >= 4*D) and is score-bit-equal to
    # single_full on TPU, so id lists must match exactly modulo equal-score
    # tie swaps (strict_rank_equal). Gate on the HARD cap only.
    if _elapsed() < HARD_CAP_S - 45:
        _stage("oracle")
        try:
            tol = 0.0 if not os.environ.get("VISUALRAG_PLATFORM") else 1e-4
            ok = run_strict_oracle(
                engine, queries[: min(256, len(queries))], index.num_docs,
                score_tol=tol)
            with _lock:
                _state["oracle_ok"] = bool(ok)
        except Exception:
            with _lock:
                _state["oracle_ok"] = False

    # 100k phase (VERDICT r4 #2): runs BEFORE the drift tail so it always
    # gets budget on a warm-cache run; any failure leaves its keys null.
    # ~45 s warm (r5 validation: synth 2 s + warms 11 s + reps + oracle).
    if (SCALE_DOCS and _elapsed() < deadline - 55
            and not os.environ.get("BENCH_SKIP_SCALE")):
        try:
            _scale_phase(all_queries, kwr)
        except Exception as e:  # never let the scale phase kill the headline
            print(f"# scale phase failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    # Drift capture (VERDICT r4 #1): this box's throughput wanders +-2-3x
    # over process life. Keep re-measuring the already-compiled large rungs
    # until the deadline — every sample now records a dispatch/finish split,
    # RTT + pack probes, and CPU/load snapshots; the final JSON carries
    # best-of AND the median ("sustained") plus a quartile decomposition.
    _stage("drift_loop")
    sink = None
    try:
        outdir = Path(__file__).resolve().parent / "results"
        outdir.mkdir(exist_ok=True)
        sink = open(outdir / "bench_drift_samples.jsonl", "w")
    except Exception:
        pass
    try:
        rtt_probe = _make_rtt_probe()
    except Exception:
        def rtt_probe():
            return 0.0
    dim = 128

    drift_rungs = [r for r in warm_rungs if r[0] >= 1024] or warm_rungs
    if not drift_rungs:
        drift_rungs = [(bs, [queries[:bs]], max(2, 8192 // bs))]

    # probe the same wire dtype the engine resolves for this rung (r5: auto
    # = f16 on TPU at bs >= 1024 — the A/B measured +40% sustained at 2048)
    probe_wire = (np.float16 if (not os.environ.get("VISUALRAG_PLATFORM")
                                 and drift_rungs[-1][0] >= 1024)
                  else np.float32)

    def pack_probe(_qs=drift_rungs[-1][1][0]):
        t0 = time.time()
        B.pack_queries_grouped(_qs, dim, wire_dtype=probe_wire)
        return (time.time() - t0) * 1000.0

    try:
        mem_probe = _make_mem_probe()
    except Exception:
        mem_probe = None

    while _elapsed() < deadline - 12 and drift_rungs:
        for bs_rung, rung, n_rep in reversed(drift_rungs):
            if _elapsed() > deadline - 12:
                break
            qps = _measured_sample(engine, rung, n_rep, kwr, rtt_probe,
                                   pack_probe, bs_rung, sink,
                                   mem_probe=mem_probe)
            _record(qps)
            print(f"# t={_elapsed():.0f}s drift bs={bs_rung} qps={qps:.0f}",
                  file=sys.stderr, flush=True)
    if sink is not None:
        sink.close()
    _stage("done")
    _emit()


if __name__ == "__main__":
    main()
