#!/bin/sh
# Build the extra compiled-reference differential targets into /tmp/ref-build
# (run after the base recipe in .claude/skills/verify/SKILL.md):
#
#   semi_cpu — the reference pipeline with the generator's semi-global Myers
#              kernel instance (tests/ref_kernels/align_core_semi.c; the
#              reference repo only commits the global kernel)
#   pos_cpu  — the committed global kernel with factor = +1, i.e. the
#              (0, 1, 1) positive-score scheme the generator normalizes to
#              (main/Main.java:253-257)
#   balancer — the verbatim adjust_device_ratio3 (the -D load balancer,
#              original/BGSA_KNC/global.c:120-168) extracted at build time
#              and wrapped in the driver-semantics trace harness
#              (balancer_harness.c); regen_balancer_trace.py drives it to
#              rewrite tests/golden/balancer_trace.json
#
# Baseline-measurement targets (scripts/measure_baseline.py; per-family
# reference denominators for bench.py / BASELINE.md):
#
#   myers_avx512 — the AVX512 pipeline with the generator's unit-cost Myers
#                  KNL instance (align_core_myers_avx512.c; the reference
#                  commits only the BitPAl kernel in its AVX2/AVX512 ports)
#   myers_sse    — straight build of original/BGSA_SSE (committed Myers)
#   banded_avx512 — straight build of banded/BGSA_AVX512 (committed banded,
#                  16x32 lanes; the plain [non-KNL] Makefile path so no
#                  AVX512ER is enabled)
#
# Second argument limits the build to one target (e.g. `build.sh '' balancer`).
set -e
HERE=$(dirname "$0")
BUILD=${1:-/tmp/ref-build}
ONLY=${2:-all}
SRC=/root/reference/original/BGSA_CPU

build_balancer() {
    rm -rf "$BUILD/balancer"
    mkdir -p "$BUILD/balancer"
    python3 - /root/reference/original/BGSA_KNC/global.c "$BUILD/balancer/ref_adjust3.inc" <<'PYEOF'
import sys
src, dst = sys.argv[1], sys.argv[2]
s = open(src).read()
start = s.index("void adjust_device_ratio3")
depth = 0
for j in range(s.index("{", start), len(s)):
    if s[j] == "{":
        depth += 1
    elif s[j] == "}":
        depth -= 1
        if depth == 0:
            break
open(dst, "w").write(s[start : j + 1] + "\n")
PYEOF
    cp "$HERE/balancer_harness.c" "$BUILD/balancer/"
    (cd "$BUILD/balancer" && gcc -O2 -o balancer_harness balancer_harness.c)
}

build_baseline_targets() {
    # -fno-strict-aliasing on the two Myers ports: their kernels dump vector
    # scores through `int * vec_dump = ((int *) & score)` (original/BGSA_SSE/
    # align_core.c:143) — type-punning UB that gcc -O3 exploits (the dump
    # reads a stale pre-`mullo` spill, flipping every score's sign; verified
    # against orig_cpu on this box).  icc, the reference's intended compiler,
    # does no type-based aliasing analysis by default, so this flag is the
    # faithful build.  banded_avx512 keeps the Makefile's default flags: its
    # plain build is byte-correct vs banded_cpu AND 1.8x faster (260 vs 146
    # GCUPS/core) — the baseline gets the faster correct build per port.
    AVX512FLAGS="-mfma -mavx512f -mavx512cd -w -fno-strict-aliasing"
    SSEFLAGS="-march=native -w -fno-strict-aliasing"
    rm -rf "$BUILD/myers_avx512" "$BUILD/myers_sse" "$BUILD/banded_avx512"
    cp -r /root/reference/original/BGSA_AVX512 "$BUILD/myers_avx512"
    cp "$HERE/align_core_myers_avx512.c" "$BUILD/myers_avx512/align_core.c"
    (cd "$BUILD/myers_avx512" && make cc=gcc CFLAGS="$AVX512FLAGS" >/dev/null)
    cp -r /root/reference/original/BGSA_SSE "$BUILD/myers_sse"
    (cd "$BUILD/myers_sse" && make cc=gcc CFLAGS="$SSEFLAGS" >/dev/null)
    cp -r /root/reference/banded/BGSA_AVX512 "$BUILD/banded_avx512"
    (cd "$BUILD/banded_avx512" && make cc=gcc >/dev/null)
}

if [ "$ONLY" = "balancer" ]; then
    build_balancer
    echo "built: $BUILD/balancer"
    exit 0
fi
if [ "$ONLY" = "baseline" ]; then
    build_baseline_targets
    echo "built: $BUILD/myers_avx512 $BUILD/myers_sse $BUILD/banded_avx512"
    exit 0
fi

rm -rf "$BUILD/semi_cpu" "$BUILD/pos_cpu"
cp -r "$SRC" "$BUILD/semi_cpu"
cp "$HERE/align_core_semi.c" "$BUILD/semi_cpu/align_core.c"
(cd "$BUILD/semi_cpu" && make cc=gcc >/dev/null)

cp -r "$SRC" "$BUILD/pos_cpu"
sed -i 's/factor = -1;/factor = 1;/; s/int mismatch_score = -1;/int mismatch_score = 1;/; s/int gap_score = -1;/int gap_score = 1;/' \
    "$BUILD/pos_cpu/align_core.c"
(cd "$BUILD/pos_cpu" && make cc=gcc >/dev/null)

# semib_avx2 — the committed AVX2 BitPAl (2,-3,-5) kernel with the
# generator's isSemiGlobal differences applied (BitPAlGenerator.java:
# writeBitInitStr state init = stored(minv) pattern 11011; dh_zero boundary;
# per-row running max in genPackedScore:112-136)
SRC2=/root/reference/original/BGSA_AVX2
rm -rf "$BUILD/semib_avx2"
cp -r "$SRC2" "$BUILD/semib_avx2"
python3 - "$BUILD/semib_avx2/align_core.c" <<'PYEOF'
import sys
p = sys.argv[1]
s = open(p).read()
subs = [
    ("dvdh_bit1[i] = dvdh_bit2[i] = dvdh_bit4[i] = dvdh_bit8[i] = dvdh_bit16[i] = _mm256_set1_epi32(0);",
     "dvdh_bit1[i] = dvdh_bit2[i] = dvdh_bit8[i] = dvdh_bit16[i] = all_ones;\n            dvdh_bit4[i] = _mm256_set1_epi32(0);"),
    ("dh_neg5 = all_ones;", "dh_zero = all_ones;"),
    ("avx_data_t score = _mm256_set1_epi32(-5 * ref_len);",
     "avx_data_t score = _mm256_set1_epi32(-5 * ref_len);\n        avx_data_t max_score = score;"),
    ("dvdh_bit16[j] = _mm256_srli_epi32(dvdh_bit16[j], 1);",
     "dvdh_bit16[j] = _mm256_srli_epi32(dvdh_bit16[j], 1);\n                max_score = _mm256_max_epi32(score, max_score);"),
    ("int * vec_dump = ((int *) & score);", "int * vec_dump = ((int *) & max_score);"),
]
for old, new in subs:
    assert s.count(old) == 1, old
    s = s.replace(old, new)
open(p, "w").write(s)
PYEOF
(cd "$BUILD/semib_avx2" && make cc=gcc >/dev/null)

build_balancer
build_baseline_targets
echo "built: $BUILD/semi_cpu $BUILD/pos_cpu $BUILD/semib_avx2 $BUILD/balancer $BUILD/myers_avx512 $BUILD/myers_sse $BUILD/banded_avx512"
