"""Driver benchmark: one JSON line per kernel family on one TPU chip.

Line 1 (headline): unit-cost global Myers. Lines 2-3: banded-Myers filter
and packed BitPAl. Line 4: 960 bp multi-word Myers (W=30 words), so
cross-word-carry regressions show in the round-over-round record.

All lines report the reference's "cal GCUPS" (kernel time only,
original/BGSA_SSE/cal_sse.c:485): cells = ref_len * ref_count * read_len *
subject_count — the banded reference bills the FULL matrix in its GCUPS too
(banded/BGSA_SSE/cal_sse.c:487), so the banded line is comparable on the
reference's own terms.

vs_baseline divides each line by ITS OWN family's measured reference
denominator (BASELINE_FAMILIES.json, reproduced by
scripts/measure_baseline.py): the published chart is unit-cost Myers only
(~500 GCUPS per AVX-512 socket), so each family's compiled reference
binary was measured per-core on this box at the same geometry and scaled
to that socket anchor via the generator's own Myers AVX-512 instance —
Myers 500 (the chart, by construction), packed BitPAl (2,-3,-5) 74.5,
banded k=8 1223.5. Dividing every family by the Myers-only 500 (rounds
1-3) overstated banded/BitPAl comparability.

Supervision (round 5): the round-4 driver run hung forever inside the
first device_put through the axon tunnel (rc=124 — CLAUDE.md's documented
down-windows pass the init probe and then stall mid-transfer), losing the
round's record. All on-device work therefore runs in a CHILD process
(`--child`) in its own session; the parent (which never imports jax, so it
can never block in PJRT) forwards the child's output live, kills the
child's process group on a total deadline or an output stall, and re-runs
any missing metric lines on a labeled CPU fallback child so the driver
always gets its JSON lines within a bounded wall time.

Measurement methodology (docs/PERF.md): each timed sample runs N kernel
invocations chained INSIDE one jit program — each iteration's query input
carries a value-preserving data dependency on the previous output
(|score| >> 30 is always 0 but unprovable at compile time), so the device
executes them serially and one 4-byte fetch ends the sample. Host-side
chaining is NOT enough on this box: every host-dispatched program pays the
remote tunnel's ~25-30 ms dispatch floor (a trivial kernel's fetch
roundtrip measures ~65 ms), which swamped the banded kernel 9x (28.3
ms/call host-chained vs 2.5 ms true device time). block_until_ready is
unreliable through the tunnel and a full-result np.asarray would bill D2H
to the kernel, hence the scalar fetch. Medians over reps; the Myers
headline re-measures once after a pause if it lands in one of the
service's documented bad windows.
"""

import glob
import json
import os
import re
import signal
import statistics
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))

# Per-family reference denominators (GCUPS per AVX-512 socket). Measured by
# scripts/measure_baseline.py from the compiled reference binaries; the
# committed record is BASELINE_FAMILIES.json (fallback constants below are
# that file's 2026-08-19 values).
_FALLBACK_DENOMS = {"myers": 500.0, "bitpal": 74.5, "banded": 1223.5}

# The four metric lines, in emission order (ids travel in the JSON records
# so the supervisor can tell which lines a killed child still owes).
LINE_IDS = ("myers", "banded", "bitpal", "myers960")

# Wall-time budgets (seconds; env-tunable). The driver wraps bench.py in
# its own timeout, so worst-case probe + TPU child + CPU fallback must stay
# comfortably under ~an hour: 600 + 1800 + 600 = 3000 s.
PROBE_SECS = float(os.environ.get("BGSA_BENCH_PROBE_SECS", "600"))
TPU_DEADLINE = float(os.environ.get("BGSA_BENCH_TPU_DEADLINE", "1800"))
STALL_SECS = float(os.environ.get("BGSA_BENCH_STALL_SECS", "540"))
CPU_DEADLINE = float(os.environ.get("BGSA_BENCH_CPU_DEADLINE", "600"))


def family_denominators():
    try:
        with open(os.path.join(REPO, "BASELINE_FAMILIES.json")) as f:
            return json.load(f)["family_denominators_gcups"]
    except (OSError, KeyError, ValueError):
        return dict(_FALLBACK_DENOMS)


BASELINES = family_denominators()


def previous_round_gcups(metric_word="unit-cost Myers"):
    """The headline value from the latest committed BENCH_r*.json, used to
    gate the bad-window retry on deviation from the round-over-round record
    (a fixed threshold would stop retrying exactly when a real regression
    crosses it)."""
    best = None  # (round_number, value) — keep the HIGHEST round, not the
    # last path in lexicographic order (which misorders at r10 vs r9)
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                raw = f.read()
        except OSError:
            continue
        # The driver-committed artifact is one JSON object whose "tail"
        # carries our stdout (the JSON metric lines embedded as text);
        # accept plain JSONL too.
        try:
            doc = json.loads(raw)
            if isinstance(doc, dict) and "metric" in doc:
                lines = [raw]  # a single bare metric record
            elif isinstance(doc, dict):
                lines = doc.get("tail", "").splitlines()
            else:
                lines = []
        except ValueError:
            lines = raw.splitlines()
        for line in lines:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if metric_word in rec.get("metric", "") and not rec.get("degraded"):
                if best is None or rnd > best[0]:
                    best = (rnd, rec["value"])
    return best[1] if best else None


DEGRADED = False  # set in the CPU fallback child; marks every JSON line
DEGRADED_REASON = "TPU service down"  # the supervisor's actual outcome


def note(msg):
    """Progress marker on stderr (stdout carries only the JSON lines) so a
    remote-service stall is attributable to a phase, not a silent hang —
    and so the supervisor's stall watchdog sees activity."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def emit(line_id, metric, gcups, family="myers"):
    rec = {
        "metric": metric,
        "value": round(gcups, 1),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINES[family], 3),
        "baseline_family": f"{family} {BASELINES[family]:g} GCUPS/socket",
        "line": line_id,
    }
    if DEGRADED:
        # The round-over-round record must never ingest CPU smoke numbers
        # as chip numbers: rewrite the label and add a machine-readable
        # flag. The label carries the supervisor's actual outcome (service
        # down / child stall / deadline / exit code / line failure) so a
        # code or compile failure is never misattributed to an outage.
        rec["metric"] = f"[DEGRADED: {DEGRADED_REASON}; CPU smoke shapes] {metric}"
        rec["degraded"] = True
    print(json.dumps(rec), flush=True)


def run_lines(only=None):
    """Measure and emit the requested metric lines in the CURRENT process
    (child mode). A line that raises is reported on stderr and skipped so
    the supervisor can fallback-fill it; returns the set of ids emitted."""
    import numpy as np

    import jax

    from bgsa_tpu import oracle, pack
    from bgsa_tpu.benchutil import chain_of, filter_mix_dataset
    from bgsa_tpu.ops import banded, bitpal_packed, myers_semiglobal, myers_xla

    only = set(LINE_IDS if only is None else only)
    done = set()

    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False

    if on_tpu:
        Q, m, S, n, reps = 40, 500, 32768, 500, 6
    else:  # CPU smoke shapes so the script always emits its lines
        Q, m, S, n, reps = 2, 100, 512, 100, 3

    rng = np.random.default_rng(0)
    queries = rng.integers(0, 4, size=(Q, m)).astype(np.int32)
    subjects = rng.integers(0, 4, size=(S, n))
    qd = jax.device_put(queries)

    def build_sample(run_q, queries_dev, n_chain):
        if not on_tpu:
            n_chain = min(n_chain, 2)
        sample = chain_of(run_q, queries_dev, n_chain)
        note(f"compiling + loading a {n_chain}-deep kernel chain (first "
             "remote call can take minutes)")
        sample()  # warm (forces the remote program load on first use)
        note("warm; timing")
        return sample, n_chain

    def timed_reps(sample, n_chain, reps=reps):
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            sample()
            dt = time.perf_counter() - t0
            times.append(dt / n_chain)
            note(f"rep {i + 1}/{reps}: {dt * 1e3 / n_chain:.1f} ms/kernel")
        note(f"timed {reps} reps, median {statistics.median(times)*1e3:.1f} ms/kernel")
        return statistics.median(times)

    def measure(run_q, queries_dev, n_chain, reps=reps):
        sample, nc = build_sample(run_q, queries_dev, n_chain)
        return timed_reps(sample, nc, reps)

    cells = Q * m * S * n

    # --- 1. unit-cost global Myers (headline) ---
    if "myers" in only:
        try:
            if on_tpu:
                # the pipeline's TPU path: full-word block kernel, global mode
                eq = jax.device_put(pack.pack_eq(subjects, 32))
                run = lambda q: myers_semiglobal.myers_semiglobal(
                    eq, q, read_len=n, factor=-1, is_global=True
                )
            else:
                eq = jax.device_put(pack.pack_eq(subjects, 31))
                run = lambda q: myers_xla.myers_global(eq, q, read_len=n, factor=-1)

            # correctness gate (full result, untimed)
            note(f"Myers: uploading Eq planes + correctness gate "
                 f"(backend={jax.default_backend()})")
            out = np.asarray(run(qd))
            want = -oracle.edit_distances(queries[0], subjects[:4])
            assert (out[0, :4] == want).all(), (out[0, :4], want)

            sample, nc = build_sample(run, qd, 10)
            t_reps = time.perf_counter()
            gcups = cells / timed_reps(sample, nc) / 1e9
            reps_wall = time.perf_counter() - t_reps
            # Bad-window retry threshold: a documented ~10x service stall
            # reads as a large deviation from the last committed round's
            # value, while a real kernel regression is typically modest —
            # gate on the round-over-round record (55% of the previous
            # reading), NOT a fixed GCUPS number that a legitimate
            # regression could cross (round-3 VERDICT Weak #4).
            prev = previous_round_gcups()
            retry_below = 0.55 * prev if prev else 4500.0
            if on_tpu and gcups < retry_below and reps_wall < 240:
                # Documented ~10x bad windows unrelated to the kernel
                # (CLAUDE.md); re-measure once after a pause, REUSING the
                # warmed sampler (a fresh chain_of would re-trace and pay
                # the multi-minute remote program load again), and report
                # the better window's median. The gate is on the timed
                # reps' wall clock only — a slow one-time compile episode
                # must not veto the retry. Skipped when the reps themselves
                # crawled (a retry would risk the caller's timeout instead).
                note(f"bad window ({gcups:.0f} GCUPS < 0.55 x prev round "
                     f"{prev or 'n/a'}); re-measuring after 90 s")
                time.sleep(90)
                gcups = max(gcups, cells / timed_reps(sample, nc) / 1e9)
            emit("myers", "unit-cost Myers cal GCUPS (1 chip, 500bp x 500bp)",
                 gcups)
            done.add("myers")
        except Exception as e:  # report + continue; supervisor fallback-fills
            note(f"LINE FAILED myers: {type(e).__name__}: {e}")

    # --- 2. banded-Myers filter (k=8, 150bp reads) ---
    if "banded" in only:
        try:
            note("banded: packing streams")
            k, nb = 8, 150
            from bgsa_tpu.ops import banded_packed

            n_sub = banded_packed.packed_subbands(nb, nb, k)  # 3 at k=8
            Sb, Qb = ((65536 // (n_sub * 128)) * n_sub * 128, 8) if on_tpu \
                else (1024, 2)
            qb, sb = filter_mix_dataset(rng, Qb, Sb, nb)
            qbd = jax.device_put(qb)
            bkw = dict(q_len=nb, s_len=nb, k=k)
            if on_tpu:
                # the engine's TPU route: subject-interleaved packed bands
                # (n_sub subjects per 64-bit register pair; bit-identical,
                # +26% over the stream kernel — docs/PERF.md)
                streams = jax.device_put(np.asarray(jax.jit(
                    banded_packed.pack_packed_streams_jax,
                    static_argnums=(1, 2, 3))(sb, k, nb, n_sub)))
                run_b = lambda q: banded_packed.banded_stream_packed(
                    streams, q, **bkw)
            else:
                il, ih, inj = map(jax.device_put, pack.pack_banded(sb, k, nb))
                run_b = lambda q: banded.banded_xla(il, ih, inj, q, **bkw)
            emit(
                "banded",
                "banded Myers k=8 cal GCUPS (150bp filter; full-matrix cells "
                "as the reference bills it)",
                Qb * nb * Sb * nb / measure(run_b, qbd, 24) / 1e9,
                family="banded",
            )
            done.add("banded")
        except Exception as e:
            note(f"LINE FAILED banded: {type(e).__name__}: {e}")

    # --- 3. packed BitPAl (2,-3,-5) ---
    if "bitpal" in only:
        try:
            note("BitPAl: packing Eq planes")
            bp = dict(match=2, mismatch=-3, gap=-5, read_len=n, factor=1)
            eq31 = jax.device_put(pack.pack_eq(subjects, 31))
            if on_tpu:
                run_p = lambda q: bitpal_packed.bitpal_packed(eq31, q, **bp)
            else:
                run_p = lambda q: bitpal_packed.bitpal_packed_xla(eq31, q, **bp)
            emit("bitpal", "packed BitPAl (2,-3,-5) cal GCUPS (500bp)",
                 cells / measure(run_p, qd, 4) / 1e9, family="bitpal")
            done.add("bitpal")
        except Exception as e:
            note(f"LINE FAILED bitpal: {type(e).__name__}: {e}")

    # --- 4. multi-word Myers (960 bp subjects, W = 30 words) ---
    # Catches cross-word HP/HN carry-chain regressions the 500 bp line
    # cannot see get slower (both are multi-word, but 960 bp doubles the
    # words per column and shifts the block budget).
    if "myers960" in only:
        try:
            note("multi-word Myers: packing 960bp Eq planes")
            n4 = 960
            Q4, S4 = (16, 16384) if on_tpu else (2, 256)
            queries4 = rng.integers(0, 4, size=(Q4, n4)).astype(np.int32)
            subjects4 = rng.integers(0, 4, size=(S4, n4))
            q4d = jax.device_put(queries4)
            if on_tpu:
                eq4 = jax.device_put(pack.pack_eq(subjects4, 32))
                run4 = lambda q: myers_semiglobal.myers_semiglobal(
                    eq4, q, read_len=n4, factor=-1, is_global=True
                )
            else:
                eq4 = jax.device_put(pack.pack_eq(subjects4, 31))
                run4 = lambda q: myers_xla.myers_global(eq4, q, read_len=n4, factor=-1)
            out4 = np.asarray(run4(q4d))
            want4 = -oracle.edit_distances(queries4[0], subjects4[:4])
            assert (out4[0, :4] == want4).all(), (out4[0, :4], want4)
            emit("myers960", "multi-word Myers cal GCUPS (960bp x 960bp, W=30)",
                 Q4 * n4 * S4 * n4 / measure(run4, q4d, 8) / 1e9)
            done.add("myers960")
        except Exception as e:
            note(f"LINE FAILED myers960: {type(e).__name__}: {e}")

    return done


def _child_main(argv):
    global DEGRADED, DEGRADED_REASON
    DEGRADED = os.environ.get("BGSA_BENCH_DEGRADED", "") == "1"
    DEGRADED_REASON = os.environ.get("BGSA_BENCH_DEGRADED_REASON",
                                     DEGRADED_REASON)
    if os.environ.get("BGSA_BENCH_TEST_HANG") and not DEGRADED:
        # test hook: simulate the round-4 mid-transfer tunnel stall (the
        # fallback child is DEGRADED and must not hang, hence the guard)
        note("test hook: hanging like a dead tunnel")
        while True:
            time.sleep(60)
    only = None
    if "--only" in argv:
        only = argv[argv.index("--only") + 1].split(",")
    done = run_lines(only)
    want = set(LINE_IDS if only is None else only)
    sys.exit(0 if done >= want else 3)


def _supervise_child(cmd, env, deadline, stall_secs, emitted):
    """Run one measurement child in its own session, forwarding output live.
    Kills the child's whole process group when total wall exceeds
    ``deadline`` or no output (stdout or stderr) arrives for ``stall_secs``.
    Records emitted line ids into ``emitted``. Returns an outcome string."""
    note_sup = lambda m: print(f"[bench-supervisor {time.strftime('%H:%M:%S')}] {m}",
                               file=sys.stderr, flush=True)
    proc = subprocess.Popen(
        cmd, cwd=REPO, env=env, start_new_session=True,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, bufsize=1,
    )
    last = {"t": time.monotonic()}

    def pump(pipe, is_stdout):
        for line in iter(pipe.readline, ""):
            last["t"] = time.monotonic()
            if is_stdout:
                s = line.strip()
                if s.startswith("{"):
                    try:
                        rec = json.loads(s)
                        if "metric" in rec:
                            emitted.add(rec.get("line", rec["metric"]))
                    except ValueError:
                        pass
                print(line, end="", flush=True)
            else:
                print(line, end="", file=sys.stderr, flush=True)
        pipe.close()

    threads = [
        threading.Thread(target=pump, args=(proc.stdout, True), daemon=True),
        threading.Thread(target=pump, args=(proc.stderr, False), daemon=True),
    ]
    for t in threads:
        t.start()

    t0 = time.monotonic()
    outcome = "ok"
    while proc.poll() is None:
        now = time.monotonic()
        if now - t0 > deadline:
            outcome = f"deadline ({deadline:.0f} s total)"
        elif now - last["t"] > stall_secs:
            outcome = f"stall ({stall_secs:.0f} s without output)"
        else:
            time.sleep(1.0)
            continue
        note_sup(f"killing measurement child: {outcome}")
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        break
    proc.wait()
    for t in threads:
        t.join(timeout=10)
    if outcome == "ok" and proc.returncode != 0:
        outcome = f"exit code {proc.returncode}"
    return outcome


def main():
    # The parent NEVER imports jax: a down tunnel can block PJRT calls for
    # hours (CLAUDE.md 2026-08-17/19), and only a jax-free parent is
    # guaranteed able to enforce its deadlines and still print JSON lines.
    from bgsa_tpu.benchutil import backend_alive

    note("probing TPU service liveness (subprocess, "
         f"{PROBE_SECS:.0f} s deadline)")
    alive = backend_alive(PROBE_SECS)
    emitted = set()

    if alive:
        outcome = _supervise_child(
            [sys.executable, os.path.abspath(__file__), "--child"],
            dict(os.environ), TPU_DEADLINE, STALL_SECS, emitted,
        )
        note(f"measurement child finished: {outcome}; "
             f"lines emitted: {sorted(emitted) or 'none'}")
        reason = ("TPU line failed in a live child (kernel/compile error, "
                  "see stderr)" if outcome == "ok"
                  else f"TPU measurement child {outcome}")
    else:
        note(f"backend init unresponsive after {PROBE_SECS:.0f} s; TPU "
             "service is down for this run")
        reason = "TPU service down"

    missing = [l for l in LINE_IDS if l not in emitted]
    if not missing:
        return

    # Fallback: fill the missing lines from a CPU child, clearly labeled —
    # the round record must show WHICH numbers are not chip numbers.
    note(f"filling missing lines {missing} from the labeled CPU fallback")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["BGSA_BENCH_DEGRADED"] = "1"
    env["BGSA_BENCH_DEGRADED_REASON"] = reason
    # the axon PJRT plugin site must not shadow the CPU backend
    env["PYTHONPATH"] = ""
    # the CPU backend cannot tunnel-hang; silent compiles are normal there,
    # so only the total deadline applies (stall watchdog disabled)
    outcome = _supervise_child(
        [sys.executable, os.path.abspath(__file__), "--child",
         "--only", ",".join(missing)],
        env, CPU_DEADLINE, CPU_DEADLINE, emitted,
    )
    note(f"CPU fallback finished: {outcome}")
    still = [l for l in LINE_IDS if l not in emitted]
    if still:
        note(f"FAILED to produce lines: {still}")
        sys.exit(4)


if __name__ == "__main__":
    if "--child" in sys.argv:
        _child_main(sys.argv)
    else:
        main()
