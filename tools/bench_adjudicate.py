#!/usr/bin/env python3
"""Bench-noise adjudication in one command (VERDICT r16 #6).

The project's established protocol for judging a per-query "regression"
on this shared box: re-run the query family SERIALLY and FILTERED
(SPARK_GRAFT_REPEATS=5, `runMain graft.Bench <substring>`), then compare
the fresh medians against the last two committed full-catalog records —
a delta inside the +/-1.5 s noise band is environment, not plan.

Usage:
    python3 tools/bench_adjudicate.py q70            # one family
    python3 tools/bench_adjudicate.py q51,q70        # several
    python3 tools/bench_adjudicate.py q62 --repeats 7
    python3 tools/bench_adjudicate.py q70 --no-run   # reuse BENCH_FILTERED.json

Reference values come from the last two git-committed versions of
BENCH_FULL.json (full-fidelity long keys — the BENCH_r*.json driver
captures are tail-truncated). Exits 1 only when a query's fresh median
sits more than the noise band ABOVE BOTH reference records.
"""

import argparse
import json
import os
import subprocess
import sys

NOISE_BAND_SEC = 1.5  # established shared-box swing on heavy queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def git_bench_records(n=2):
    """(label, queries-dict) for the last n committed BENCH_FULL.json."""
    revs = subprocess.run(
        ["git", "rev-list", "-n", str(n), "HEAD", "--", "BENCH_FULL.json"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    out = []
    for rev in revs:
        show = subprocess.run(
            ["git", "show", f"{rev}:BENCH_FULL.json"],
            cwd=REPO, capture_output=True, text=True,
        )
        if show.returncode != 0:
            continue
        try:
            rec = json.loads(show.stdout)
        except json.JSONDecodeError:
            continue
        out.append((rev[:8], rec.get("queries", {})))
    return out


def run_filtered(prefixes, repeats):
    env = dict(os.environ, SPARK_GRAFT_REPEATS=str(repeats))
    cmd = ["sbt", "-batch", f"runMain graft.Bench {prefixes}"]
    print(f"[adjudicate] running: SPARK_GRAFT_REPEATS={repeats} "
          f"{' '.join(cmd)}", flush=True)
    rc = subprocess.run(cmd, cwd=REPO, env=env,
                        stdout=subprocess.DEVNULL).returncode
    if rc != 0:
        sys.exit(f"[adjudicate] bench run failed (rc={rc})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prefixes", help="comma-separated query substrings")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--no-run", action="store_true",
                    help="reuse the existing BENCH_FILTERED.json")
    ap.add_argument("--band", type=float, default=NOISE_BAND_SEC)
    args = ap.parse_args()

    if not args.no_run:
        run_filtered(args.prefixes, args.repeats)

    filtered_path = os.path.join(REPO, "BENCH_FILTERED.json")
    with open(filtered_path) as f:
        fresh = json.load(f).get("queries", {})
    wanted = [p.strip() for p in args.prefixes.split(",") if p.strip()]
    fresh = {k: v for k, v in fresh.items()
             if any(p in k for p in wanted)}
    if not fresh:
        sys.exit(f"[adjudicate] no queries matching {wanted} in "
                 f"{filtered_path}")

    records = git_bench_records(2)
    if not records:
        sys.exit("[adjudicate] no committed BENCH_FULL.json found")

    regressions = []
    for name in sorted(fresh):
        now = fresh[name]
        refs = [(lbl, qs[name]) for lbl, qs in records if name in qs]
        if not refs:
            print(f"{name}: fresh {now:.3f}s — no committed reference "
                  "(new query)")
            continue
        ref_str = ", ".join(f"{lbl}={v:.3f}s" for lbl, v in refs)
        best_ref = min(v for _, v in refs)
        delta = now - best_ref
        if delta > args.band:
            verdict = "REGRESSION"
            regressions.append(name)
        elif delta < -args.band:
            verdict = "improved"
        else:
            verdict = "within band"
        print(f"{name}: fresh {now:.3f}s vs [{ref_str}] "
              f"delta {delta:+.3f}s ({verdict}, band +/-{args.band})")

    if regressions:
        print(f"[adjudicate] REGRESSION beyond the {args.band}s band: "
              f"{', '.join(regressions)}")
        sys.exit(1)
    print("[adjudicate] all within band")


if __name__ == "__main__":
    main()
