"""Cold/warm cost envelope (VERDICT r4 item 5 — r3 items 1/2/6).

Measures, in order, on an otherwise-idle host:
  1. COLD `python bench.py`   — after deleting .bench_cache and the
     persistent compile cache (the fresh-clone experience; target <= 15 min)
  2. WARM `python bench.py`   — immediate rerun (PT + compile caches hot)
  3. COLD `pytest tests/`     — after deleting tests/golden/.ptcache
     (fresh-clone suite; target <= 10 min)
  4. WARM `pytest tests/`     — immediate rerun

Writes ENVELOPE.json at the repo root and prints a summary table.  The
bench JSONs of both runs are parsed so the warm/cold compile_and_first_run
phase split is recorded (r3 item 2: the < 60 s warm-compile question).

Run:  python scripts/envelope.py            (~30-45 min total)
      python scripts/envelope.py --skip-suite   (bench only)
"""

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _compile_cache_dir():
    # config._init_compilation_cache keys the persistent XLA compile cache
    # under ~/.cache/pyaceqd_tpu/jaxcache/<host-key>; clear the whole tree
    env = os.environ.get("PYACEQD_TPU_COMPILE_CACHE", "").strip()
    if env and env != "0":
        return env
    return os.path.join(os.path.expanduser("~"), ".cache", "pyaceqd_tpu",
                        "jaxcache")


def run(cmd, label, timeout=3600):
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=timeout)
    wall = time.time() - t0
    lines = (proc.stdout or "").strip().splitlines()
    parsed = None
    for ln in reversed(lines):
        if ln.startswith("{"):
            try:
                parsed = json.loads(ln)
            except ValueError:
                pass
            break
    print(f"[envelope] {label}: {wall:.0f}s rc={proc.returncode}", flush=True)
    return {"label": label, "wall_s": round(wall, 1), "rc": proc.returncode,
            "tail": "\n".join(lines[-2:]),
            "phases_s": (parsed or {}).get("phases_s"),
            "value": (parsed or {}).get("value"),
            "vs_baseline": (parsed or {}).get("vs_baseline")}


def main():
    results = {"host_cores": os.cpu_count()}
    # ---- bench cold ----
    shutil.rmtree(os.path.join(REPO, ".bench_cache"), ignore_errors=True)
    cc = _compile_cache_dir()
    if cc and os.path.isdir(cc):
        shutil.rmtree(cc, ignore_errors=True)
        results["compile_cache_cleared"] = cc
    results["bench_cold"] = run([sys.executable, "bench.py"], "bench COLD")
    results["bench_warm"] = run([sys.executable, "bench.py"], "bench WARM")
    if "--skip-suite" not in sys.argv:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        shutil.rmtree(os.path.join(REPO, "tests", "golden", ".ptcache"),
                      ignore_errors=True)
        for label in ("pytest COLD", "pytest WARM"):
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, "-m", "pytest", "tests/", "-q"],
                cwd=REPO, env=env, capture_output=True, text=True,
                timeout=3600)
            wall = time.time() - t0
            tail = (proc.stdout or "").strip().splitlines()[-1:]
            print(f"[envelope] {label}: {wall:.0f}s rc={proc.returncode} "
                  f"{tail}", flush=True)
            results[label.replace("pytest ", "suite_").lower()] = {
                "wall_s": round(wall, 1), "rc": proc.returncode,
                "tail": tail[0] if tail else ""}
    with open(os.path.join(REPO, "ENVELOPE.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items()
                      if isinstance(v, dict) and "wall_s" in v}, indent=2))


if __name__ == "__main__":
    main()
