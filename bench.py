"""Benchmark runner: executes every registered probe query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE COMPACT (<1 KB) JSON line:

    {"metric": "probe_suite_wall", "value": N, "unit": "sec",
     "sf": 0.1, "n_queries": N, "n_failed": N,
     "stream_msgs_per_sec": N, "queries": {...headline subset...}}

The driver captures only a stdout tail, so the final line must stay
small — rounds 1 and 2 both lost the bench gate to a fat line. Full
per-query timings go to BENCH_DETAIL.json next to this script; the
stdout line carries only the headline probes.

Each probe is timed to a full materialization (count of the result) —
the same work the driver's harness does, minus the pandas conversion.
Failures are recorded as -1 for that query and never abort the suite.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from realtime_financial_transactions_data_pipeline_spark.registry import all_probes
from realtime_financial_transactions_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    only = set(sys.argv[1:])

    spark = get_spark("bench")
    timings: dict[str, float] = {}
    stream_window_s: float | None = None
    t_suite = time.time()
    # JVM/codegen warm-up so the alphabetically-first probe doesn't
    # absorb session startup; counted in the suite total, not per-query.
    spark.range(0, 1_000_000).selectExpr("sum(id)").collect()
    # Host-speed calibration anchor: a fixed pure-JVM workload, timed.
    # The sandbox is a Firecracker microVM (no steal-time reporting), so
    # host oversubscription silently inflates wall clocks 1.5-3x between
    # boots; calib_sec lets round-over-round suite comparisons normalize
    # out the host factor (same-host q1 noise measured +-10%, while
    # cross-boot suite walls have differed ~2x at identical code).
    t_cal = time.time()
    spark.range(0, 50_000_000).selectExpr(
        "sum(id * 2654435761 % 1000003)"
    ).collect()
    calib_sec = round(time.time() - t_cal, 3)
    for name, p in sorted(all_probes().items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            p.fn(spark, sf_dir).count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
        if name == "t1_t6_streaming_pipeline" and timings[name] > 0:
            # Snapshot the flagship probe's streaming window now — other
            # probes (j3) also call run_pipeline and would overwrite it.
            from realtime_financial_transactions_data_pipeline_spark.streaming import pipeline as _pl

            stream_window_s = _pl.LAST_STREAM_SECONDS
    total = round(time.time() - t_suite, 3)

    # Full per-query timings go to a sidecar file; the stdout line keeps
    # only a headline subset so it stays under the driver's tail capture.
    # Subset runs (explicit probe args, e.g. the contract smoke test)
    # write a .partial file so they never clobber the committed
    # full-suite round record.
    detail_name = "BENCH_DETAIL.partial.json" if only else "BENCH_DETAIL.json"
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               detail_name)
    with open(detail_path, "w") as fh:
        json.dump({"metric": "probe_suite_wall", "value": total,
                   "unit": "sec", "sf": sf, "calib_sec": calib_sec,
                   "queries": timings}, fh,
                  indent=1, sort_keys=True)

    headline = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    headline.setdefault(
        "q1_star_revenue_by_nation",
        timings.get("q1_star_revenue_by_nation", -1.0),
    )
    out = {
        "metric": "probe_suite_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_failed": sum(1 for t in timings.values() if t < 0),
        "calib_sec": calib_sec,
        "queries": headline,
        "detail": detail_name,
    }
    # Streaming throughput vs BASELINE.md's ≤10k msg/s offered producer
    # rate: the flagship probe streams one wire message per customer row
    # through parse→validate→tokenize→dual-sink, so input_rows/wall is
    # end-to-end pipeline throughput (single node, cold start included).
    # The wire-copies factor is recorded alongside the rate so
    # round-over-round throughput comparisons stay apples-to-apples:
    # rounds 1-2 measured at copies=1, round 3+ at copies=4 (amortizes
    # the ~1 s stream-startup cost inside the same measurement window).
    t_stream = timings.get("t1_t6_streaming_pipeline", -1.0)
    if t_stream > 0:
        from realtime_financial_transactions_data_pipeline_spark.streaming.pipeline import WIRE_COPIES

        # Two rates, two explicit keys (round-5 ADVICE: round 5 silently
        # redefined stream_msgs_per_sec from probe-wall to query-window):
        #   stream_msgs_per_sec        — over the PROBE WALL, the
        #     definition rounds 1-4 reported, so round-over-round BENCH
        #     comparisons stay apples-to-apples;
        #   stream_msgs_per_sec_window — over the streaming query's own
        #     window (source read → parse → validate → tokenize → dual
        #     sink), excluding harness bookkeeping (input synthesis,
        #     sink re-reads).
        window = stream_window_s if stream_window_s else t_stream
        n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
        n_msgs = n_cust * WIRE_COPIES
        out["stream_msgs_per_sec"] = round(n_msgs / t_stream, 1)
        out["stream_msgs_per_sec_window"] = round(n_msgs / window, 1)
        out["stream_wire_copies"] = WIRE_COPIES
        out["stream_window_sec"] = round(window, 3)
        out["stream_msgs_per_sec_1x"] = round(n_cust / window, 1)
    line = json.dumps(out)
    assert len(line) < 1024, f"bench stdout line too long: {len(line)}B"
    print(line)


if __name__ == "__main__":
    main()
