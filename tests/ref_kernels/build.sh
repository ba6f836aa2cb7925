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
set -e
HERE=$(dirname "$0")
BUILD=${1:-/tmp/ref-build}
SRC=/root/reference/original/BGSA_CPU

rm -rf "$BUILD/semi_cpu" "$BUILD/pos_cpu"
cp -r "$SRC" "$BUILD/semi_cpu"
cp "$HERE/align_core_semi.c" "$BUILD/semi_cpu/align_core.c"
(cd "$BUILD/semi_cpu" && make cc=gcc >/dev/null)

cp -r "$SRC" "$BUILD/pos_cpu"
sed -i 's/factor = -1;/factor = 1;/; s/int mismatch_score = -1;/int mismatch_score = 1;/; s/int gap_score = -1;/int gap_score = 1;/' \
    "$BUILD/pos_cpu/align_core.c"
(cd "$BUILD/pos_cpu" && make cc=gcc >/dev/null)
echo "built: $BUILD/semi_cpu $BUILD/pos_cpu"
