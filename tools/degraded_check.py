#!/usr/bin/env python3
"""Degraded-fixture ORACLE-PARITY lane (VERDICT r18 #1).

NullInputSpec proves every key still EXECUTES on a corpus with ~10%
null payloads; this lane proves Spark and DuckDB still AGREE on the
RESULTS — the class of silent engine/oracle divergence that kept
resurfacing in audits (null-lang ntile partitions, greatest(NULL)
chunk rows, NULLS FIRST/LAST sort flips, concat vs || null rules,
hash-of-NULL sampler keys).

Pipeline (all local, ~4 min):
  1. graft.DegradedCorpus <sf> <tmp>   — deterministic 10% null clone
  2. graft.Verify <tmp> <out>          — every registered key
  3. tools/check.py <out> <tmp>        — DuckDB parity, same gate as
                                         the driver

Usage: python3 tools/degraded_check.py [sf_dir]   (default sf0.001)
Exit 0 only when every oracled key passes on the DEGRADED corpus.
"""
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    return subprocess.run(cmd, cwd=REPO, **kw)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="graft_degraded_")
    corpus, out = os.path.join(work, "corpus"), os.path.join(work, "vout")
    r = run(["sbt", "-batch",
             f"runMain graft.DegradedCorpus {sf} {corpus}",
             f"runMain graft.Verify {corpus} {out}"])
    if r.returncode != 0:
        print("sbt lane failed", file=sys.stderr)
        return 1
    return run([sys.executable, os.path.join(HERE, "check.py"),
                out, corpus]).returncode


if __name__ == "__main__":
    sys.exit(main())
