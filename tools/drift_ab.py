#!/usr/bin/env python3
"""Mechanized cross-session drift adjudication (r11 VERDICT #4).

Three rounds running, apparent 1.5-2x moves on UNTOUCHED queries have
been re-adjudicated as host drift by hand. This runner mechanizes the
A/B: it times the given queries under graft.DriftTwin in BOTH the
working tree (HEAD) and a detached read-only worktree of a previous
certified commit, strictly ALTERNATING blocks in one box session
(prev, head, prev, head), and writes a per-query ratio artifact. Taking
each side's MINIMUM across its two non-adjacent blocks cancels slow
host drift; a ratio that survives the interleave is a real code/data
effect, one that collapses to ~1.0 was session noise.

Absolute DriftTwin numbers do NOT match graft.Bench numbers (different
session shape) — only the same-harness HEAD/prev ratios are meaningful.

Usage:
  python3 tools/drift_ab.py <prev-commit> <out.json> <q1,q2,...> [iters] [sfdir]
  python3 tools/drift_ab.py <prev-commit> <out.json> top20@tools/bench_rN_idle_full.json

The second form (r12 VERDICT #5: fold drift into certification) picks
the top-N queries by per-query seconds from a committed idle bench
artifact, so each round's adjudication is one mechanical command over
the PREVIOUS round's certified artifact instead of a hand-picked list.
"""
import json
import os
import re
import subprocess
import sys
import time

WORKTREE = "/tmp/graft_drift_prev"


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def run_twin(repo, queries, iters, sfdir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sfdir)
    out = subprocess.run(
        ["sbt", "-batch", f"Test/runMain graft.DriftTwin {queries} {iters}"],
        cwd=repo, capture_output=True, text=True, env=env).stdout
    res = {}
    for line in out.splitlines():
        m = re.search(
            r"\[twin\] (\S+)\s+load=(\S+) .*min=\s*(\S+) median=\s*(\S+)", line)
        if m:
            res[m.group(1)] = {"min": float(m.group(3)),
                               "median": float(m.group(4))}
    if not res:
        sys.stderr.write(out[-4000:] + "\n")
        raise SystemExit(f"no [twin] lines from DriftTwin in {repo}")
    return res


def main():
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    prev_commit, out_path, queries = sys.argv[1], sys.argv[2], sys.argv[3]
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    sfdir = sys.argv[5] if len(sys.argv) > 5 else "/root/testdata/sf0.1"
    m = re.match(r"^top(\d+)@(.+)$", queries)
    if m:
        n, bench_path = int(m.group(1)), m.group(2)
        bench = json.load(open(bench_path))["queries"]
        top = sorted(bench.items(), key=lambda kv: -kv[1])[:n]
        queries = ",".join(q for q, _ in top)
        print(f"[drift-ab] top{n} by {bench_path}: {queries}")
    head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                          text=True).stdout.strip()

    subprocess.run(["git", "worktree", "remove", "--force", WORKTREE],
                   capture_output=True)
    subprocess.run(["git", "worktree", "add", "--detach", WORKTREE,
                    prev_commit], check=True)
    try:
        blocks = []  # (side, loadavg_before, results)
        for side in ["prev", "head", "prev", "head"]:
            repo = WORKTREE if side == "prev" else os.getcwd()
            la = loadavg()
            t0 = time.time()
            res = run_twin(repo, queries, iters, sfdir)
            print(f"[drift-ab] block {side} load={la:.2f} "
                  f"wall={time.time() - t0:.0f}s")
            blocks.append((side, la, res))

        per_query = {}
        for q in queries.split(","):
            # a query missing from SOME block (mangled output line, name
            # absent in the prev commit) must not throw away the whole
            # session's timings — skip it with a note instead
            prevs = [b[2][q]["min"] for b in blocks
                     if b[0] == "prev" and q in b[2]]
            heads = [b[2][q]["min"] for b in blocks
                     if b[0] == "head" and q in b[2]]
            if not prevs or not heads:
                print(f"[drift-ab] WARNING: {q} missing from "
                      f"{'prev' if not prevs else 'head'} blocks — skipped")
                continue
            prev_min, head_min = min(prevs), min(heads)
            per_query[q] = {
                "prev_min_s": round(prev_min, 3),
                "head_min_s": round(head_min, 3),
                "ratio": round(head_min / prev_min, 3) if prev_min else None,
                "blocks": [{b[0]: round(b[2][q]["min"], 3)}
                           for b in blocks if q in b[2]],
            }
        artifact = {
            "prev_commit": prev_commit,
            "head_commit": head,
            "sf_dir": sfdir,
            "iters_per_block": iters,
            "block_order": [b[0] for b in blocks],
            "loadavg_before_blocks": [round(b[1], 2) for b in blocks],
            "queries": per_query,
        }
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=2, sort_keys=True)
            f.write("\n")
        print(f"[drift-ab] wrote {out_path}")
        for q, r in sorted(per_query.items(),
                           key=lambda kv: -(kv[1]["ratio"] or 0)):
            ratio = "  n/a" if r["ratio"] is None else f"{r['ratio']:5.2f}"
            print(f"[drift-ab] {q:28s} prev={r['prev_min_s']:7.2f} "
                  f"head={r['head_min_s']:7.2f} ratio={ratio}")
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", WORKTREE],
                       capture_output=True)


if __name__ == "__main__":
    main()
