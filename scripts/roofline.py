"""Roofline for the Pallas kernels: per-column vector-op counts from the
kernels' own jaxprs, a measured VPU practical-peak microbenchmark, and
%-of-peak for each family (round-3 VERDICT Next #2; table lands in
docs/PERF.md).

Method
------
* **ops/column** — trace each kernel's module-level column function with
  bench shapes and count elementwise vector primitives (ALU ops on
  tile-sized operands) in the jaxpr. Excluded: broadcasts of scalars
  (hoisted splats), data movement (slice/dynamic_slice/stack/reshape), and
  per-kernel epilogues (score extraction walks, amortized over the column
  loop). This counts the ops the SOURCE emits; Mosaic may fuse some (e.g.
  ~(a|b) patterns), so %-of-peak computed from it is a lower bound on how
  close the kernel runs to the machine.
* **VPU practical peak** — a Pallas kernel running a dependent chain of the
  same op mix (add/xor/or/and/not/shifts) on a VMEM-resident (256, 128)
  uint32 tile, unrolled 20x inside a fori_loop: steps*unroll*10 ops of
  1024-lane... (256*128 elements) each. Timed with the same in-jit chain
  harness as every kernel number (benchutil.chain_of; docs/PERF.md "The
  dispatch floor"). Linearity is sanity-checked by doubling the unroll.
* **measured cells/s** — each kernel re-measured in this run (same service
  window as the peak). Banded runs block_exit=False on an all-pass
  workload so every column executes (deterministic op count; the shipping
  early-exit config is FASTER on real filter mixes — see PERF.md #8).

element-ops/cell = ops_per_word_column / useful_bits_per_word  (full
kernels), or ops_per_column / billed_cells_per_column (banded, which
computes a 2k+1 band but is billed the full matrix as the reference bills
itself).

Usage: python scripts/roofline.py [--reps 5] [--out roofline.json]
(runs on whatever backend JAX resolves; the committed PERF.md table is from
the real v5e chip)
"""

import argparse
import functools
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

TILE = (8, 128)
TILE_ELEMS = TILE[0] * TILE[1]

# Elementwise VPU ALU primitives (jaxpr names).
ALU = {
    "add", "sub", "mul", "and", "or", "xor", "not", "neg",
    "shift_left", "shift_right_logical", "shift_right_arithmetic",
    "select_n", "eq", "ne", "lt", "le", "gt", "ge", "min", "max",
    "convert_element_type",
}
SKIPPED = set()


def count_alu(jaxpr) -> int:
    """Count elementwise ALU eqns on tile-sized operands, recursively."""
    n = 0
    for eqn in jaxpr.eqns:
        for sub in ("jaxpr", "call_jaxpr", "body_jaxpr", "cond_jaxpr"):
            inner = eqn.params.get(sub)
            if inner is not None:
                n += count_alu(inner.jaxpr if hasattr(inner, "jaxpr") else inner)
        name = eqn.primitive.name
        out_big = any(
            hasattr(v, "aval") and np.prod(v.aval.shape, dtype=int) >= TILE_ELEMS
            for v in eqn.outvars
        )
        if not out_big:
            continue
        if name in ALU:
            n += 1
        else:
            SKIPPED.add(name)
    return n


def ops_myers_fullword(W=16, m=500):
    import jax
    import jax.numpy as jnp
    from bgsa_tpu.ops import myers_semiglobal

    def col(eq_c, pv, mv, score):
        npv, nmv, score, _ = myers_semiglobal._column(
            eq_c, pv, mv, score, None, read_len=m, is_global=True)
        return jnp.stack(npv), jnp.stack(nmv), score

    eq = jnp.zeros((W,) + TILE, jnp.uint32)
    sc = jnp.zeros(TILE, jnp.int32)
    return count_alu(jax.make_jaxpr(col)(eq, eq, eq, sc).jaxpr)


def ops_myers_31bit(W=17, m=500):
    import jax
    import jax.numpy as jnp
    from bgsa_tpu.ops import myers_pallas

    f = functools.partial(
        myers_pallas._column_words, word_bits=31,
        maskh=jnp.uint32(1 << ((m - 1) % 31)), carry_mask=jnp.uint32(0x7FFFFFFF))
    eq = jnp.zeros((W,) + TILE, jnp.uint32)
    sc = jnp.zeros(TILE, jnp.int32)
    return count_alu(jax.make_jaxpr(f)(eq, eq, eq, sc).jaxpr)


def ops_bitpal_packed(W=17):
    import jax
    import jax.numpy as jnp
    from bgsa_tpu.ops import bitpal_packed

    p = bitpal_packed.BitpalParams(2, -3, -5)
    nbits = bitpal_packed._bits_num(p)

    def col(flat):
        # flat: (W, nbits, tile) state + (W, tile) matches
        state_w = [[flat[w, b] for b in range(nbits)] for w in range(W)]
        matches_w = [flat[w, nbits] for w in range(W)]
        out = bitpal_packed._packed_column(state_w, matches_w, p, nbits)
        return jnp.stack([jnp.stack(w) for w in out])

    flat = jnp.zeros((W, nbits + 1) + TILE, jnp.uint32)
    return count_alu(jax.make_jaxpr(col)(flat).jaxpr), nbits


def ops_banded_stream(q_len=150, s_len=150, k=8):
    import jax
    import jax.numpy as jnp
    from bgsa_tpu.ops import banded

    h, band_down, max_err = banded._geometry(q_len, s_len, k)
    Wst = (s_len + 2 * k + 31) // 32 + 2

    def col(stream, t, c, chk, *state):
        load = lambda cc, w: stream[cc, w]  # noqa: E731
        return banded._stream_column(
            t, state, c, load, k=k, m=q_len, band_down=band_down,
            max_err=max_err, chk=chk)

    stream = jnp.zeros((5, Wst) + TILE, jnp.uint32)
    z = jnp.zeros(TILE, jnp.uint32)
    zi = jnp.zeros(TILE, jnp.int32)
    jx = jax.make_jaxpr(col)(
        stream, jnp.int32(40), jnp.int32(1), jnp.int32(1), z, z, z, z, zi, zi)
    return count_alu(jx.jaxpr)


def ops_banded_packed(q_len=150, s_len=150, k=8):
    """Column ops of the subject-interleaved packed kernel; one column
    serves n_sub subjects per lane element."""
    import jax
    import jax.numpy as jnp
    from bgsa_tpu.ops import banded_packed as bp

    (h, band_down, max_err, pitch, n_sub, band64, xsm64, ones64,
     tops64) = bp._consts(q_len, s_len, k)
    consts = (*bp._split64(band64), *bp._split64(xsm64), *bp._split64(ones64))
    bandmask32 = jnp.uint32((1 << (band_down + 1)) - 1)
    Wst = (s_len + 2 * k + 31) // 32 + 2

    def col(stream, t, c, *state):
        # the kernel's own window builder (banded_packed.fold_window_fields)
        # so the counted network IS the shipping one
        w = t // 32
        b = (t % 32).astype(jnp.uint32)
        wins = [bp.funnel_window(stream[j, c, w], stream[j, c, w + 1],
                                 b, bandmask32) for j in range(n_sub)]
        lo, hi = bp.fold_window_fields(wins, pitch, band_down,
                                       jnp.zeros(TILE, jnp.uint32))
        return bp._packed_update(state, lo, hi, consts, scored=True)

    stream = jnp.zeros((n_sub, 5, Wst) + TILE, jnp.uint32)
    z = jnp.zeros(TILE, jnp.uint32)
    jx = jax.make_jaxpr(col)(stream, jnp.int32(40), jnp.int32(1), *([z] * 8))
    return count_alu(jx.jaxpr), n_sub


# ---------------------------------------------------------------- peak bench

PEAK_OPS_PER_CHAIN_ITER = 7  # add, xor, shr, or, and, shl, not


def _peak_kernel(x_ref, o_ref, *, steps, unroll, chains):
    """``chains`` independent 7-op dependency chains per iteration: each
    chain is serial (like a Myers word's recurrence) but the chains overlap
    (like the W words of a column), so the measured rate is the VPU's
    practical ISSUE throughput for this op mix, not a single chain's
    latency. A first single-chain version measured 0.43-0.80 Te-ops/s with
    2x non-linearity in unroll — pure latency, 6-8x below what the real
    kernels sustain."""
    import jax.numpy as jnp
    from jax import lax

    vs = tuple(x_ref[i] for i in range(chains))
    b = x_ref[chains]

    def it(i, carry):
        vs = list(carry)
        for _ in range(unroll):
            for j in range(chains):
                a = vs[j]
                a = a + b            # 1
                a = a ^ (a >> 1)     # 2, 3
                a = a | b            # 4
                a = a & (a << 1)     # 5, 6
                a = ~a               # 7
                vs[j] = a
        return tuple(vs)

    vs = lax.fori_loop(0, steps, it, vs)
    acc = vs[0]
    for v in vs[1:]:
        acc = acc ^ v
    o_ref[...] = acc


def measure_peak(reps, steps=16384, rows=8, unroll=16, chains=8, chain=64):
    # sample duration ~0.2-0.3 s device time — same order as the kernel
    # samples, so the tunnel's per-program dispatch floor inflates both
    # sides of the %-of-peak ratio comparably.
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from bgsa_tpu.benchutil import chain_of

    interpret = jax.default_backend() != "tpu"
    if interpret:  # CPU smoke: shrink so the interpreter finishes at all
        steps, chain = 4, 2

    def run(x):
        return pl.pallas_call(
            functools.partial(_peak_kernel, steps=steps, unroll=unroll,
                              chains=chains),
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.uint32),
            interpret=interpret,
        )(x)

    x = jax.device_put(np.arange((chains + 1) * rows * 128, dtype=np.uint32)
                       .reshape(chains + 1, rows, 128) | 1)
    sample = chain_of(run, x, chain)
    sample()
    times = [timed(sample) for _ in range(reps)]
    eops = (steps * unroll * chains * PEAK_OPS_PER_CHAIN_ITER
            * rows * 128 * chain)
    return eops / statistics.median(times)


def timed(sample):
    t0 = time.perf_counter()
    sample()
    return time.perf_counter() - t0


def measure_kernels(reps, on_tpu):
    """Measured cells/s for each family (bench.py geometries; banded runs
    all-pass with block_exit=False so the executed op count is exact)."""
    import jax
    from bgsa_tpu import pack
    from bgsa_tpu.benchutil import chain_of
    from bgsa_tpu.ops import banded, bitpal_packed, myers_pallas, myers_semiglobal

    rng = np.random.default_rng(0)
    Q, m, S, n = (40, 500, 32768, 500) if on_tpu else (2, 100, 512, 100)
    queries = rng.integers(0, 4, size=(Q, m)).astype(np.int32)
    subjects = rng.integers(0, 4, size=(S, n))
    qd = jax.device_put(queries)
    cells = Q * m * S * n
    out = {}
    kw = dict(interpret=not on_tpu)
    eq32 = jax.device_put(pack.pack_eq(subjects, 32))

    def meas(run, qdev, chain, total):
        sample = chain_of(run, qdev, chain)
        sample()
        t = statistics.median([timed(sample) for _ in range(reps)])
        return total / (t / chain)

    out["myers_fullword"] = meas(
        lambda q: myers_semiglobal.myers_semiglobal(
            eq32, q, read_len=n, factor=-1, is_global=True, **kw),
        qd, 8, cells)
    eq31 = jax.device_put(pack.pack_eq(subjects, 31))
    out["myers_31bit"] = meas(
        lambda q: myers_pallas.myers_global(eq31, q, read_len=n, factor=-1, **kw),
        qd, 8, cells)
    out["bitpal_packed"] = meas(
        lambda q: bitpal_packed.bitpal_packed(
            eq31, q, match=2, mismatch=-3, gap=-5, read_len=n, factor=1, **kw),
        qd, 4, cells)

    # banded all-pass: every subject equals a query (err stays ~0, no lane
    # dies, no block exits even without the A/B control) at k=8/150bp
    nb, k = (150, 8)
    Qb, Sb = (8, 65536) if on_tpu else (2, 512)
    qb = rng.integers(0, 4, size=(Qb, nb)).astype(np.int32)
    sb = np.repeat(qb[:1], Sb, axis=0)
    stream = jax.device_put(np.asarray(jax.jit(
        pack.pack_banded_stream_jax, static_argnums=(1, 2))(sb, k, nb)))
    out["banded_stream"] = meas(
        lambda q: banded.banded_stream(
            stream, q, q_len=nb, s_len=nb, k=k, block_exit=False, **kw),
        jax.device_put(qb), 24, Qb * nb * Sb * nb)

    # packed-field banded, same all-pass/no-exit protocol
    from bgsa_tpu.ops import banded_packed as bp_mod

    n_sub = bp_mod.packed_subbands(nb, nb, k)
    Sp = (Sb // (n_sub * 128)) * n_sub * 128
    sp = np.repeat(qb[:1], Sp, axis=0)
    streams_p = jax.device_put(np.asarray(jax.jit(
        bp_mod.pack_packed_streams_jax, static_argnums=(1, 2, 3))(
            np.asarray(sp, np.int32), k, nb, n_sub)))
    out["banded_packed"] = meas(
        lambda q: bp_mod.banded_stream_packed(
            streams_p, q, q_len=nb, s_len=nb, k=k, block_exit=False, **kw),
        jax.device_put(qb), 24, Qb * nb * Sp * nb)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    W32, W31 = 16, 17  # 500 bp
    c_fw = ops_myers_fullword(W32)
    c_31 = ops_myers_31bit(W31)
    c_bp, nbits = ops_bitpal_packed(W31)
    c_bd = ops_banded_stream()
    c_bdp, n_sub = ops_banded_packed()
    counts = {
        # (ops/column, BILLED cells per column) — billed = the real subject
        # positions (500), the same unit the measured GCUPS uses, so the
        # word-padding waste (W*bits - n: 12 bits at 32-bit words, 27 at
        # 31-bit) counts AGAINST the kernel rather than inflating its
        # theoretical ceiling. Banded bills the full matrix (n cells/col)
        # as the reference does.
        "myers_fullword": (c_fw, 500),
        "myers_31bit": (c_31, 500),
        "bitpal_packed": (c_bp, 500),
        "banded_stream": (c_bd, 150),
        # one packed column serves n_sub subjects -> n_sub * s_len billed
        "banded_packed": (c_bdp, n_sub * 150),
    }
    print(f"jaxpr ALU counts: fullword/col={c_fw} ({c_fw/W32:.1f}/word), "
          f"31bit/col={c_31} ({c_31/W31:.1f}/word), "
          f"bitpal/col={c_bp} ({c_bp/W31:.1f}/word, {nbits} planes), "
          f"banded/col={c_bd}, banded_packed/col={c_bdp} "
          f"({c_bdp/n_sub:.1f}/subject, n_sub={n_sub})", file=sys.stderr)
    print(f"skipped (non-ALU) primitives seen: {sorted(SKIPPED)}", file=sys.stderr)

    print("measuring VPU practical peak ...", file=sys.stderr)
    peaks = {c: measure_peak(args.reps, chains=c) for c in (8, 16, 32)}
    print("peak by ILP (independent chains): " + ", ".join(
        f"c{c}={v/1e12:.2f}T" for c, v in peaks.items()), file=sys.stderr)
    peak_best = max(peaks.values())
    # saturation: the top two chain counts should agree when issue-bound
    top2 = sorted(peaks.values())[-2:]
    lin = top2[1] / top2[0]

    print("measuring kernels ...", file=sys.stderr)
    meas = measure_kernels(args.reps, on_tpu)

    rows = []
    for fam, (ops_col, cells_col) in counts.items():
        ops_per_cell = ops_col / cells_col
        theo = peak_best / ops_per_cell
        got = meas[fam]
        rows.append({
            "family": fam, "alu_ops_per_column": ops_col,
            "billed_cells_per_column": cells_col,
            "ops_per_cell": round(ops_per_cell, 4),
            "theoretical_cups": theo, "measured_cups": got,
            "pct_of_peak": round(100 * got / theo, 1),
        })

    print("\n| kernel | ALU ops/col (jaxpr) | cells/col | ops/cell | "
          "roofline cells/s | measured | % of peak |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['family']} | {r['alu_ops_per_column']} | "
              f"{r['billed_cells_per_column']} | {r['ops_per_cell']:.3f} | "
              f"{r['theoretical_cups']/1e12:.2f} T | "
              f"{r['measured_cups']/1e12:.3f} T | {r['pct_of_peak']} |")
    print(f"\nVPU practical peak: {peak_best/1e12:.2f} T uint32-element ops/s "
          f"(independent-chain mix; top-2 ILP saturation ratio {lin:.3f}); "
          f"implied clock at 8x128 lanes x 4 ALUs = "
          f"{peak_best/4096/4/1e9:.2f} GHz")

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"peak_eops": peak_best, "saturation": lin,
                       "peaks_by_chains": {str(k): v for k, v in peaks.items()},
                       "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
