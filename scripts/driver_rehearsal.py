"""Driver-protocol rehearsal (VERDICT r05 #7): catch probe-result
instability BEFORE the driver's correctness harness does.

For every probe in the driver's 50-entry window, under a PRISTINE
default-conf SparkSession (200 shuffle partitions, default AQE — NOT
our tuned session.get_spark), invoke the builder TWICE back-to-back
(the driver does a schema pass then a value pass) and compare:

  * invocation 1 vs invocation 2 — any drift is exactly the class of
    bug that made t8 red for three rounds (scratch-dir races,
    eviction-timing nondeterminism);
  * invocation hash vs the DuckDB oracle with the TYPE-STRICT
    canonicalizer (strings never collapse with numbers — the other t8
    failure mode).

Run before every round close:

    python scripts/driver_rehearsal.py            # all 50 window probes
    python scripts/driver_rehearsal.py t8_stream_outer_attribution ...

Exit 0 = every probe stable and oracle-consistent; 1 otherwise.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

from realtime_financial_transactions_data_pipeline_spark.registry import (
    _DRIVER_ORDER,
    all_probes,
)
from realtime_financial_transactions_data_pipeline_spark.tables import TABLE_NAMES
from scripts.check_oracle import canon_rows, numeric_kind_mismatches

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    only = set(sys.argv[1:])
    spark = (
        SparkSession.builder.appName("driver_rehearsal")
        .master("local[32]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    probes = all_probes()
    # default: the driver's 50-probe window; `--all` rehearses EVERY
    # registered probe (catches scratch races / nondeterminism in
    # side-effecting probes outside the window); names select a subset.
    names = list(_DRIVER_ORDER)
    if "--all" in only:
        only.discard("--all")
        names = list(probes)
    n_bad = n_ok = 0
    for name in names:
        if only and name not in only:
            continue
        p = probes.get(name)
        if p is None:
            print(f"BAD   {name}: not registered")
            n_bad += 1
            continue
        t0 = time.time()
        try:
            first = canon_rows(p.fn(spark, SF_DIR).toPandas())
            df2 = p.fn(spark, SF_DIR)
            second = canon_rows(df2.toPandas())
        except Exception as exc:  # noqa: BLE001
            print(f"BAD   {name}: raised {type(exc).__name__}: {exc}")
            n_bad += 1
            continue
        problems = []
        if first != second:
            diffs = [(a, b) for a, b in zip(first, second) if a != b][:2]
            problems.append(
                f"UNSTABLE across invocations "
                f"({len(first)} vs {len(second)} rows; first diffs {diffs})"
            )
        if p.oracle is not None:
            # Declared-type strictness: the driver's hasher is numeric-
            # type-tagged (round-15 a23 — identical values, HUGEINT
            # oracle column, driver red while cell-canon said green).
            problems.extend(numeric_kind_mismatches(df2, con, p.oracle))
            oracle = canon_rows(con.execute(p.oracle).fetchdf())
            if second != oracle:
                diffs = [(a, b) for a, b in zip(second, oracle) if a != b][:2]
                problems.append(
                    f"ORACLE mismatch ({len(second)} vs {len(oracle)} rows; "
                    f"first diffs {diffs})"
                )
        if problems:
            print(f"BAD   {name}: {'; '.join(problems)}")
            n_bad += 1
        else:
            tag = "ok   " if p.oracle is not None else "rows "
            print(f"{tag} {name} ({len(second)} rows) [{time.time()-t0:.1f}s]")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
