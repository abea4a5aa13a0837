"""bench.py contract smoke test: the driver parses bench's stdout as ONE
JSON line — round 1's bench gate failed precisely because no parseable
line appeared, so this pins the contract (shape, keys, subset mode)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_json_line_with_timings():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "q1_star_revenue_by_nation", "p1_projection"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["metric"] == "probe_suite_wall"
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert set(payload["queries"]) == {"q1_star_revenue_by_nation", "p1_projection"}
    assert all(t >= 0 for t in payload["queries"].values())
