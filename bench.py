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

Methodology (docs/PERF.md): each timed sample runs N kernel invocations
chained INSIDE one jit program — each iteration's query input carries a
value-preserving data dependency on the previous output (|score| >> 30 is
always 0 but unprovable at compile time), so the device executes them
serially and one 4-byte fetch ends the sample. Host-side chaining is NOT
enough on this box: every host-dispatched program pays the remote tunnel's
~25-30 ms dispatch floor (a trivial kernel's fetch roundtrip measures
~65 ms), which swamped the banded kernel 9x (28.3 ms/call host-chained vs
2.5 ms true device time). block_until_ready is unreliable through the
tunnel and a full-result np.asarray would bill D2H to the kernel, hence
the scalar fetch. Medians over reps; the Myers headline re-measures once
after a pause if it lands in one of the service's documented bad windows.
"""

import glob
import json
import os
import re
import statistics
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

# Per-family reference denominators (GCUPS per AVX-512 socket). Measured by
# scripts/measure_baseline.py from the compiled reference binaries; the
# committed record is BASELINE_FAMILIES.json (fallback constants below are
# that file's 2026-08-19 values).
_FALLBACK_DENOMS = {"myers": 500.0, "bitpal": 74.5, "banded": 1223.5}


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

# See bgsa_tpu.benchutil.backend_alive: probe the remote service in a
# subprocess (init blocks for hours when the tunnel is down) and fall back
# to a *labeled* CPU smoke run rather than hanging the driver.
INIT_PROBE_SECS = float(os.environ.get("BGSA_BENCH_PROBE_SECS", "900"))

DEGRADED = False  # set when the TPU service is down; marks every JSON line


def note(msg):
    """Progress marker on stderr (stdout carries only the JSON lines) so a
    remote-service stall is attributable to a phase, not a silent hang."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def emit(metric, gcups, family="myers"):
    rec = {
        "metric": metric,
        "value": round(gcups, 1),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINES[family], 3),
        "baseline_family": f"{family} {BASELINES[family]:g} GCUPS/socket",
    }
    if DEGRADED:
        # The round-over-round record must never ingest CPU smoke numbers
        # as chip numbers: rewrite the label and add a machine-readable flag.
        rec["metric"] = f"[DEGRADED: TPU service down, CPU smoke shapes] {metric}"
        rec["degraded"] = True
    print(json.dumps(rec), flush=True)


def main():
    global DEGRADED

    from bgsa_tpu.benchutil import backend_alive, chain_of, filter_mix_dataset

    dead = not backend_alive(INIT_PROBE_SECS)
    if dead:
        DEGRADED = True
        note(f"backend init unresponsive after {INIT_PROBE_SECS:.0f} s; "
             "falling back to the CPU smoke path (values are NOT chip "
             "numbers — the TPU service was down for this run)")

    import jax

    if dead:
        jax.config.update("jax_platforms", "cpu")

    from bgsa_tpu import oracle, pack
    from bgsa_tpu.ops import banded, bitpal_packed, myers_semiglobal, myers_xla

    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False

    if on_tpu:
        Q, m, S, n, reps = 40, 500, 32768, 500, 6
    else:  # CPU smoke fallback so the script always emits its lines
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
        for _ in range(reps):
            t0 = time.perf_counter()
            sample()
            times.append((time.perf_counter() - t0) / n_chain)
        note(f"timed {reps} reps, median {statistics.median(times)*1e3:.1f} ms/kernel")
        return statistics.median(times)

    def measure(run_q, queries_dev, n_chain, reps=reps):
        sample, nc = build_sample(run_q, queries_dev, n_chain)
        return timed_reps(sample, nc, reps)

    # --- 1. unit-cost global Myers (headline) ---
    if on_tpu:
        # the pipeline's TPU path: full-word block kernel in global mode
        eq = jax.device_put(pack.pack_eq(subjects, 32))
        run = lambda q: myers_semiglobal.myers_semiglobal(
            eq, q, read_len=n, factor=-1, is_global=True
        )
    else:
        eq = jax.device_put(pack.pack_eq(subjects, 31))
        run = lambda q: myers_xla.myers_global(eq, q, read_len=n, factor=-1)

    # correctness gate (full result, untimed)
    note(f"Myers: uploading Eq planes + correctness gate (backend={jax.default_backend()})")
    out = np.asarray(run(qd))
    want = -oracle.edit_distances(queries[0], subjects[:4])
    assert (out[0, :4] == want).all(), (out[0, :4], want)

    cells = Q * m * S * n
    sample, nc = build_sample(run, qd, 10)
    t_reps = time.perf_counter()
    gcups = cells / timed_reps(sample, nc) / 1e9
    reps_wall = time.perf_counter() - t_reps
    # Bad-window retry threshold: a documented ~10x service stall reads as a
    # large deviation from the last committed round's value, while a real
    # kernel regression is typically modest — gate on the round-over-round
    # record (55% of the previous reading), NOT a fixed GCUPS number that a
    # legitimate regression could cross (round-3 VERDICT Weak #4).
    prev = previous_round_gcups()
    retry_below = 0.55 * prev if prev else 4500.0
    if on_tpu and gcups < retry_below and reps_wall < 240:
        # The remote service has documented ~10x bad windows unrelated to
        # the kernel (CLAUDE.md); re-measure once after a pause, REUSING the
        # warmed sampler (a fresh chain_of would re-trace and pay the
        # multi-minute remote program load again), and report the better
        # window's median. The gate is on the timed reps' wall clock only —
        # a slow one-time compile episode must not veto the retry. Skipped
        # when the reps themselves crawled (a retry would risk the caller's
        # timeout instead).
        note(f"bad window ({gcups:.0f} GCUPS < 0.55 x prev round "
             f"{prev or 'n/a'}); re-measuring after 90 s")
        time.sleep(90)
        gcups = max(gcups, cells / timed_reps(sample, nc) / 1e9)
    emit("unit-cost Myers cal GCUPS (1 chip, 500bp x 500bp)", gcups)

    # --- 2. banded-Myers filter (k=8, 150bp reads) ---
    note("banded: packing streams")
    k, nb = 8, 150
    Sb, Qb = (65536, 8) if on_tpu else (1024, 2)
    qb, sb = filter_mix_dataset(rng, Qb, Sb, nb)
    qbd = jax.device_put(qb)
    bkw = dict(q_len=nb, s_len=nb, k=k)
    if on_tpu:
        stream = jax.device_put(np.asarray(
            jax.jit(pack.pack_banded_stream_jax, static_argnums=(1, 2))(sb, k, nb)
        ))
        run_b = lambda q: banded.banded_stream(stream, q, **bkw)
    else:
        il, ih, inj = map(jax.device_put, pack.pack_banded(sb, k, nb))
        run_b = lambda q: banded.banded_xla(il, ih, inj, q, **bkw)
    emit(
        "banded Myers k=8 cal GCUPS (150bp filter; full-matrix cells as the "
        "reference bills it)",
        Qb * nb * Sb * nb / measure(run_b, qbd, 24) / 1e9,
        family="banded",
    )

    # --- 3. packed BitPAl (2,-3,-5) ---
    note("BitPAl: packing Eq planes")
    bp = dict(match=2, mismatch=-3, gap=-5, read_len=n, factor=1)
    eq31 = jax.device_put(pack.pack_eq(subjects, 31))
    if on_tpu:
        run_p = lambda q: bitpal_packed.bitpal_packed(eq31, q, **bp)
    else:
        run_p = lambda q: bitpal_packed.bitpal_packed_xla(eq31, q, **bp)
    emit("packed BitPAl (2,-3,-5) cal GCUPS (500bp)",
         cells / measure(run_p, qd, 4) / 1e9, family="bitpal")

    # --- 4. multi-word Myers (960 bp subjects, W = 30 words) ---
    # Catches cross-word HP/HN carry-chain regressions the 500 bp line
    # cannot see get slower (both are multi-word, but 960 bp doubles the
    # words per column and shifts the block budget).
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
    emit("multi-word Myers cal GCUPS (960bp x 960bp, W=30)",
         Q4 * n4 * S4 * n4 / measure(run4, q4d, 8) / 1e9)


if __name__ == "__main__":
    main()
