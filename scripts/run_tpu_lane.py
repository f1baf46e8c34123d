"""Run the on-silicon hardware test lane and record the artifact.

Executes ``PDN_TPU_TESTS=1 pytest -m tpu tests/ -q`` (ONE process on the
real chip — every fused-kernel variant, the streamed quant gemv kernels,
flash attention, the serve lanes) and writes ``TPULANE_r{N}.json`` with
per-test outcomes, matching the r04 artifact schema.

    python scripts/run_tpu_lane.py 5          # writes TPULANE_r05.json
"""
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.join(os.path.dirname(__file__), "..")


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    env = dict(os.environ, PDN_TPU_TESTS="1")
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-m", "tpu", "tests/", "-q",
         "-rA", "--tb=line", "--durations=0", "-p", "no:cacheprovider"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=3600)
    dur = time.time() - t0
    tests, totals = [], {"tests": 0, "failures": 0, "errors": 0,
                         "skipped": 0}
    times = {}
    for line in r.stdout.splitlines():
        # --durations=0 rows: "34.11s call tests/test_x.py::test_name"
        md = re.match(r"\s*([\d.]+)s call\s+\S*::(\w+)", line)
        if md:
            times[md.group(2)] = float(md.group(1))
    for line in r.stdout.splitlines():
        m = re.match(r"(PASSED|FAILED|ERROR|SKIPPED)\s+\S*::(\w+)", line)
        if m:
            status, name = m.group(1).lower(), m.group(2)
            tests.append({"name": name,
                          "time_s": times.get(name),
                          "status": status})
            totals["tests"] += 1
            if status == "failed":
                totals["failures"] += 1
            elif status == "error":
                totals["errors"] += 1
            elif status == "skipped":
                totals["skipped"] += 1
    out = {"lane": "PDN_TPU_TESTS=1 pytest -m tpu tests/ -q",
           "round": rnd, "totals": totals, "duration_s": round(dur, 1),
           "exit_code": r.returncode, "tests": tests}
    if r.returncode or not tests:  # keep diagnostics bounded but present
        out["tail"] = r.stdout[-2000:]
    path = os.path.join(ROOT, f"TPULANE_r{rnd:02d}.json")
    line = json.dumps(out)
    print(line)
    with open(path, "w") as f:
        f.write(line + "\n")
    sys.exit(1 if r.returncode else 0)


if __name__ == "__main__":
    main()
