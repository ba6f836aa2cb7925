"""Round-5 fixes: the bench supervisor must survive a dead axon tunnel.

The round-4 driver bench run hung forever inside the first device_put
(rc=124 from the driver's timeout — the tunnel's down-windows pass the
liveness probe and then stall mid-transfer), losing the round's record.
bench.py now runs all on-device work in a killable child process group
under a total deadline plus a no-output stall watchdog, and fills missing
metric lines from a labeled CPU fallback child.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

sys.path.insert(0, REPO)
import bench  # noqa: E402


@pytest.mark.slow
def test_bench_supervisor_recovers_from_hung_measurement_child():
    """A measurement child that goes silent (the round-4 failure mode) must
    be killed by the stall watchdog, and every metric line must still be
    produced — labeled degraded — by the CPU fallback child."""
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PYTHONPATH="",
        BGSA_BENCH_TEST_HANG="1",   # first child hangs like a dead tunnel
        BGSA_BENCH_STALL_SECS="3",  # watchdog fires fast for the test
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, (r.returncode, r.stderr[-2000:])
    recs = [json.loads(l) for l in r.stdout.splitlines()
            if l.strip().startswith("{")]
    assert sorted(rec["line"] for rec in recs) == sorted(bench.LINE_IDS)
    # every value came from the fallback: all labeled, none fake chip numbers
    assert all(rec.get("degraded") for rec in recs)
    assert all(rec["metric"].startswith("[DEGRADED") for rec in recs)
    assert all(set(rec) >= {"metric", "value", "unit", "vs_baseline"}
               for rec in recs)
    assert "killing measurement child: stall" in r.stderr


def test_bench_line_ids_cover_every_emitted_family():
    """LINE_IDS is the supervisor's completeness contract; the denominator
    table must cover every family bench emits against."""
    assert bench.LINE_IDS == ("myers", "banded", "bitpal", "myers960")
    denoms = bench.family_denominators()
    assert set(denoms) >= {"myers", "bitpal", "banded"}
    assert all(v > 0 for v in denoms.values())
