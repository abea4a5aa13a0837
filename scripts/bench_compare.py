"""Round-over-round bench adjudication, operationalized.

Rounds 6-12 each re-derived the same analysis by hand: a probe that
looks N x slower in BENCH_r{K}.json is almost always (a) host speed —
normalize CPU-bound probes by ``calib_sec``; (b) scheduler latency —
normalize streaming/iterative probes by ``sched_calib`` (a CPU anchor
CANNOT see it: round 8's t8/x2i whipsawed 2.5x while calib said the
host got faster); or (c) single-sample noise — compare the min-of-2
``queries_min`` when present, never a lone pass-1 wall. This script IS
that doctrine:

    python scripts/bench_compare.py BENCH_r11.json BENCH_DETAIL.json
    python scripts/bench_compare.py BENCH_r10.json BENCH_r11.json --threshold 1.5

It prints per-probe normalized ratios for everything past --threshold
(default 1.3x) in either direction, plus the suite/stream headlines.
Exit code 0 always — it adjudicates, the reader decides.

Caveat: the driver's BENCH_r{N}.json archives bench's STDOUT line,
whose ``queries`` map is only the headline subset — full per-probe
timings live in that round's BENCH_DETAIL.json, which each bench run
overwrites. For a full-coverage diff, snapshot BENCH_DETAIL.json
(e.g. ``cp BENCH_DETAIL.json BENCH_DETAIL_r12.json``) before the next
run; the round-12 close does this.
"""

from __future__ import annotations

import argparse
import json
import sys

#: Probes whose cost is per-micro-batch driver/scheduler overhead or
#: iterative round scheduling — normalized by sched_calib, not calib.
#: (Everything touching foreachBatch/availableNow triggers or a
#: localCheckpoint iteration loop; data volume is NOT their cost —
#: measured round 9: x2n identical with full vs half corpus.)
_SCHED_PREFIXES = (
    "t1_", "t2", "t4", "t5", "t7", "t8", "t9", "t10", "t11",
    "k3_", "k8", "j3_", "x1e", "x2i", "x2n", "mv2",
)


def _family_anchor(name: str) -> str:
    return "sched" if name.startswith(_SCHED_PREFIXES) else "cpu"


def _load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    # BENCH_r{N}.json wraps the bench line under "parsed"; BENCH_DETAIL
    # and raw bench stdout are flat.
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    out = {
        "calib": d.get("calib_sec") or 1.0,
        "sched": d.get("sched_calib") or 1.0,
        "value": d.get("value"),
        "stream_1x": d.get("stream_msgs_per_sec_1x"),
        # v1 (rounds 1-11): window included plan construction; v2
        # (round 12+): start → termination only. The field first appears
        # in round 13, so an absent field is ambiguous: v1 through r11,
        # v2 in r12's (unlabeled) archives.
        "stream_def": d.get("stream_window_def", "unlabeled(pre-r13: v1 thru r11, v2 in r12)"),
        "queries": d.get("queries_min") or d.get("queries") or {},
        "min_of_2": "queries_min" in d,
        # per-probe pass-1 shuffle-write MB (r15+ BENCH_DETAIL records);
        # absent or -1 entries mean unknown.
        "shuffle": d.get("queries_shuffle_mb") or {},
        # r15.2+: "noop" (full evaluation to the noop sink); absent =
        # the count() method rounds 1-15.1 used, which let Catalyst
        # skip cardinality-preserving work (projections; in the x25
        # class, the whole plan).
        "eval": d.get("eval", "count"),
    }
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("base")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3)
    args = ap.parse_args()
    b, n = _load(args.base), _load(args.new)

    anchors = {
        "cpu": (b["calib"], n["calib"]),
        "sched": (b["sched"], n["sched"]),
    }
    print(
        f"anchors: calib {b['calib']:.3f} -> {n['calib']:.3f} "
        f"({n['calib'] / b['calib']:.2f}x host), "
        f"sched {b['sched']:.3f} -> {n['sched']:.3f} "
        f"({n['sched'] / b['sched']:.2f}x scheduler)"
    )
    if b["eval"] != n["eval"]:
        print(
            f"note: EVAL METHOD differs ({b['eval']} vs {n['eval']}) — "
            "wall ratios below include the method delta (noop fully "
            "evaluates what count() let Catalyst skip); shuffle deltas "
            "for probes whose count-plan was elided (x25 class) will "
            "show the REAL plan appearing, not a regression"
        )
    for side, rec in (("base", b), ("new", n)):
        if not rec["min_of_2"]:
            print(
                f"note: {side} record has no queries_min — comparing its "
                "single-sample pass-1 walls (expect noise on sub-second probes)"
            )

    flagged = []
    for name, t0 in sorted(b["queries"].items()):
        t1 = n["queries"].get(name)
        if t1 is None or t0 <= 0 or t1 <= 0:
            continue
        fam = _family_anchor(name)
        ab, an = anchors[fam]
        norm = (t1 / an) / (t0 / ab)
        if norm >= args.threshold or norm <= 1 / args.threshold:
            flagged.append((norm, name, fam, t0, t1))
    for norm, name, fam, t0, t1 in sorted(flagged, reverse=True):
        tag = "SLOWER" if norm > 1 else "faster"
        print(
            f"{tag:>6} {norm:5.2f}x ({fam}-normalized) {name}: "
            f"{t0:.2f}s -> {t1:.2f}s"
        )
    if not flagged:
        print(f"no probe moved past {args.threshold}x after normalization")

    # Shuffle-delta adjudication (VERDICT r14 stretch #8): wall noise
    # normalizes away, but shuffle bytes are deterministic per plan —
    # >2x growth at the same sf means the PLAN changed, not the host.
    sh_flagged = []
    for name, s0 in sorted(b["shuffle"].items()):
        s1 = n["shuffle"].get(name)
        if s1 is None or s0 < 0 or s1 < 0:
            continue
        base = max(s0, 0.05)  # ignore sub-50 kB jitter denominators
        if s1 / base >= 2.0 and s1 - s0 >= 1.0:
            sh_flagged.append((s1 / base, name, s0, s1))
    for ratio, name, s0, s1 in sorted(sh_flagged, reverse=True):
        print(
            f"SHUFFLE {ratio:5.1f}x {name}: {s0:.1f} -> {s1:.1f} MB "
            "shuffle-write (plan change, not host noise)"
        )

    gone = sorted(set(b["queries"]) - set(n["queries"]))
    new_probes = sorted(set(n["queries"]) - set(b["queries"]))
    if gone:
        print(f"dropped probes: {gone}")
    if new_probes:
        print(f"new probes ({len(new_probes)}): {', '.join(new_probes[:10])}"
              + (" ..." if len(new_probes) > 10 else ""))
    if b["value"] and n["value"]:
        print(
            f"suite pass-1 wall: {b['value']:.1f}s -> {n['value']:.1f}s "
            f"({(n['value'] / n['calib']) / (b['value'] / b['calib']):.2f}x "
            "cpu-normalized; note probe-count changes above)"
        )
    if b["stream_1x"] and n["stream_1x"]:
        note = ""
        if b["stream_def"] != n["stream_def"]:
            note = (f"  [WARNING: window definitions differ — "
                    f"{b['stream_def']} vs {n['stream_def']}; ~0.2s of "
                    "plan construction moved out of the window in v2]")
        print(f"stream 1x: {b['stream_1x']} -> {n['stream_1x']} msg/s{note}")


if __name__ == "__main__":
    main()
