#!/usr/bin/env python3
"""Regenerate tests/golden/balancer_trace.json from the compiled reference.

Builds the balancer differential target (build.sh section "balancer":
balancer_harness.c + the verbatim adjust_device_ratio3 extracted from
/root/reference/original/BGSA_KNC/global.c), replays each case's recorded
per-bucket times through it, and rewrites the fixture's ratio schedules
with the C function's full-precision output. Times are kept from the
existing fixture when present (so regen is idempotent); with --fresh, new
times are drawn from a fixed seed.

Usage:  python tests/ref_kernels/regen_balancer_trace.py [--fresh]
        (builds into /tmp/ref-build/balancer by default; set BUILD_DIR)
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(HERE, "..", "golden", "balancer_trace.json")
BUILD = os.environ.get("BUILD_DIR", "/tmp/ref-build")
HARNESS = os.path.join(BUILD, "balancer", "balancer_harness")


def build_harness():
    subprocess.run(["sh", os.path.join(HERE, "build.sh"), BUILD, "balancer"],
                   check=True)
    assert os.path.exists(HARNESS), HARNESS


def replay(n_devices, times):
    lines = [f"{n_devices} {len(times)}"]
    lines += [" ".join(f"{t:.17g}" for t in row) for row in times]
    out = subprocess.run([HARNESS], input="\n".join(lines) + "\n",
                         capture_output=True, text=True, check=True)
    return [[float(tok) for tok in line.split()]
            for line in out.stdout.splitlines()]


def main():
    fresh = "--fresh" in sys.argv
    build_harness()
    cases = []
    if not fresh and os.path.exists(FIXTURE):
        with open(FIXTURE) as f:
            cases = json.load(f)
    if not cases:
        import numpy as np

        rng = np.random.default_rng(7)
        cases = [
            {"n_devices": n, "times": np.round(
                rng.uniform(1.0, 8.0, size=(6, n)), 6).tolist()}
            for n in (2, 3, 4)
        ]
    for case in cases:
        case["ratios"] = replay(case["n_devices"], case["times"])
    with open(FIXTURE, "w") as f:
        json.dump(cases, f, indent=1)
        f.write("\n")
    print(f"wrote {FIXTURE}: {len(cases)} cases")


if __name__ == "__main__":
    main()
