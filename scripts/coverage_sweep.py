"""Line-coverage sweep of the test suite over bgsa_tpu/ (sys.monitoring).

Runs pytest in-process with a PEP 669 LINE monitor restricted to this
package, then prints every executable-but-unhit line with one line of
context — the worklist for adversarial review passes (uncovered branches
are where silent bugs live; the round-3 review pass that found the
mid-run-read hang and the resume-dtype corruption started from exactly
this listing).

Usage:
    python scripts/coverage_sweep.py [pytest args...]
    # e.g.: python scripts/coverage_sweep.py -m "not slow" -q

Caveats: lines hit only in subprocesses (spawned role tests) and inside
jit-traced functions that were cache-hit (never retraced) show as unhit;
filter the listing with that in mind rather than chasing 100%.
"""

import dis
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bgsa_tpu")

hit: set = set()
TOOL = 3  # arbitrary free PEP 669 tool id


def _on_line(code, line):
    if code.co_filename.startswith(PKG):
        hit.add((code.co_filename, line))
    else:
        return sys.monitoring.DISABLE
    return None


def main():
    import pytest

    mon = sys.monitoring
    mon.use_tool_id(TOOL, "bgsa-cov")
    mon.register_callback(TOOL, mon.events.LINE, _on_line)
    mon.set_events(TOOL, mon.events.LINE)
    rc = pytest.main(sys.argv[1:] or ["-q", "tests/"])
    mon.set_events(TOOL, 0)
    mon.free_tool_id(TOOL)

    # Executable lines = lines holding bytecode in any code object of each
    # imported bgsa_tpu module (compile the source; dis walks nested code).
    missing: dict[str, list[int]] = {}
    total = hit_count = 0
    for root, _dirs, files in os.walk(PKG):
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            with open(path) as f:
                src = f.read()
            lines: set[int] = set()

            def walk(code):
                for _off, line in dis.findlinestarts(code):
                    if line:
                        lines.add(line)
                for const in code.co_consts:
                    if hasattr(const, "co_code"):
                        walk(const)

            walk(compile(src, path, "exec"))
            src_lines = src.splitlines()
            # drop def/class/decorator/docstring-adjacent structural lines:
            # a def line "executes" at import, not when the function runs
            lines = {
                ln for ln in lines
                if ln <= len(src_lines)
                and not src_lines[ln - 1].lstrip().startswith(
                    ("def ", "class ", "@", '"""', "'''")
                )
            }
            total += len(lines)
            got = {ln for (f2, ln) in hit if f2 == path}
            hit_count += len(lines & got)
            miss = sorted(lines - got)
            if miss:
                missing[path] = miss

    print(f"\n=== bgsa_tpu line coverage: {hit_count}/{total} "
          f"({100.0 * hit_count / max(total, 1):.1f}%) ===")
    for path, miss in sorted(missing.items()):
        rel = os.path.relpath(path, os.path.dirname(PKG))
        print(f"\n{rel}: {len(miss)} unhit")
        with open(path) as f:
            src_lines = f.read().splitlines()
        for ln in miss:
            print(f"  {ln:5d}: {src_lines[ln - 1].rstrip()[:100]}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
