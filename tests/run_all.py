"""Suite aggregator with a JSON report.

Parity: /root/reference/tests/run_all.cjs:12-433 (spawns each suite, collects
pass/fail, optional JSON report).  Here suites are pytest files plus the
native sanitizer check; results aggregate into one JSON document.

Usage: python tests/run_all.py [--report report.json]
"""
import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_suite(name, cmd, timeout=600):
    t0 = time.time()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout, cwd=REPO)
        passed = p.returncode == 0
        tail = (p.stdout + p.stderr).strip().splitlines()[-3:]
    except subprocess.TimeoutExpired:
        passed = False
        tail = ["TIMEOUT"]
    return {
        "suite": name,
        "passed": passed,
        "seconds": round(time.time() - t0, 1),
        "tail": tail,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--report")
    args = ap.parse_args()

    results = []
    for test_file in sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py"))):
        name = os.path.basename(test_file)
        results.append(run_suite(name, [sys.executable, "-m", "pytest", test_file, "-q"]))
        print(f"{'PASS' if results[-1]['passed'] else 'FAIL'}  {name:40s} {results[-1]['seconds']:6.1f}s")

    san = os.path.join(REPO, "sublinear_tpu", "native", "check_sanitizers.sh")
    results.append(run_suite("native-sanitizers", ["bash", san], timeout=300))
    print(f"{'PASS' if results[-1]['passed'] else 'FAIL'}  {'native-sanitizers':40s} {results[-1]['seconds']:6.1f}s")

    summary = {
        "total": len(results),
        "passed": sum(r["passed"] for r in results),
        "failed": sum(not r["passed"] for r in results),
        "suites": results,
        "timestamp": time.time(),
    }
    print(f"\n{summary['passed']}/{summary['total']} suites passed")
    if args.report:
        with open(args.report, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"report written to {args.report}")
    return 0 if summary["failed"] == 0 else 1


if __name__ == "__main__":
    main()
