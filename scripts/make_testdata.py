"""Generate the benchmark datasets used by the perf runs (reproducible).

Usage:
  python scripts/make_testdata.py /tmp            # 20x150bp queries + 1M subjects
  python scripts/make_testdata.py /tmp --subjects 10000000
  python scripts/make_testdata.py /tmp --length 500 --queries 40
"""

import argparse
import os

import numpy as np


def write_lines(path: str, count: int, length: int, rng, chunk=1_000_000):
    lut = np.frombuffer(b"ACGT", np.uint8)
    with open(path, "wb") as f:
        done = 0
        while done < count:
            n = min(chunk, count - done)
            codes = rng.integers(0, 4, size=(n, length), dtype=np.int8)
            buf = np.empty((n, length + 1), np.uint8)
            buf[:, :length] = lut[codes]
            buf[:, length] = ord("\n")
            f.write(buf.tobytes())
            done += n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--subjects", type=int, default=1_000_000)
    ap.add_argument("--length", type=int, default=150)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.outdir, exist_ok=True)
    qp = os.path.join(args.outdir, f"query{args.queries}_{args.length}bp.txt")
    sp = os.path.join(args.outdir, f"subj{args.subjects}_{args.length}bp.txt")
    write_lines(qp, args.queries, args.length, rng)
    write_lines(sp, args.subjects, args.length, rng)
    print(qp)
    print(sp)


if __name__ == "__main__":
    main()
