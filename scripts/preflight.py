"""Round preflight: refuse to certify a snapshot whose suite is red or whose
bench gates fail (VERDICT r4 item 7 — r4 shipped with two golden gates
failing because nothing forced a green suite before snapshot).

Runs, in order:
  1. the full test suite (pytest tests/ -q) on the CPU backend;
  2. the bench gate logic against the most recent bench JSON on disk
     (BENCH_LOCAL.json, written by ``python bench.py | tee``-style runs, or
     the driver's BENCH_r*.json) — re-evaluates evaluate_gates() on the
     parsed result rather than trusting the recorded exit code.

Prints a PASS/FAIL certification transcript (quote it in the round notes)
and exits nonzero on any failure.

Usage: python scripts/preflight.py [--skip-tests] [--bench-json PATH]
"""

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_suite():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-m", "pytest", "tests/", "-q"],
                          cwd=REPO, env=env, capture_output=True, text=True)
    wall = time.time() - t0
    tail = "\n".join((proc.stdout or "").strip().splitlines()[-3:])
    ok = proc.returncode == 0
    print("[preflight] pytest tests/ -q: %s in %.0fs\n%s"
          % ("PASS" if ok else "FAIL (rc=%d)" % proc.returncode, wall, tail),
          flush=True)
    return ok


def latest_bench_json(explicit=None):
    if explicit:
        return explicit
    cands = [p for p in glob.glob(os.path.join(REPO, "BENCH_*.json"))]
    if not cands:
        return None
    # most recent wins: a fresh local capture (BENCH_LOCAL.json) outranks a
    # stale driver round file and vice versa
    return max(cands, key=os.path.getmtime)


def check_bench(path):
    sys.path.insert(0, REPO)
    import bench
    with open(path) as f:
        data = json.load(f)
    result = data.get("parsed", data)
    if not isinstance(result, dict) or "trace_ok" not in result:
        print("[preflight] bench json %s: no parsed result (value null or "
              "driver run failed)" % os.path.basename(path), flush=True)
        return False
    failures = bench.evaluate_gates(result)
    if failures:
        print("[preflight] bench gates on %s: FAIL\n  %s"
              % (os.path.basename(path), "\n  ".join(failures)), flush=True)
        return False
    print("[preflight] bench gates on %s: PASS (value=%s %s, vs_baseline=%s)"
          % (os.path.basename(path), result.get("value"), result.get("unit"),
             result.get("vs_baseline")), flush=True)
    return True


def main():
    args = sys.argv[1:]
    ok = True
    if "--skip-tests" not in args:
        ok = run_suite() and ok
    explicit = None
    if "--bench-json" in args:
        explicit = args[args.index("--bench-json") + 1]
    path = latest_bench_json(explicit)
    if path is None:
        print("[preflight] no BENCH_*.json found — bench gates UNCHECKED",
              flush=True)
        ok = False
    else:
        ok = check_bench(path) and ok
    print("[preflight] certification: %s" % ("PASS" if ok else "FAIL"),
          flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
