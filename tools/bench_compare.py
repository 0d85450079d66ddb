#!/usr/bin/env python3
"""Compare two bench artifacts and attribute per-query drift.

Usage: python3 tools/bench_compare.py <old_bench.json> <new_bench.json> [ratio]

Flags queries whose min-of-passes moved by more than `ratio` (default 1.5x)
in either direction. If both artifacts carry a `data` fingerprint block
(per-table row count + xxhash64 checksum, emitted by graft.Bench since r08),
the report states whether the underlying testdata changed — a drift on
changed data is attributed to data, not code, and needs a standalone rerun
(graft.Scratch) to confirm before anyone chases a code regression.
"""
import sys, json


def main(old_path: str, new_path: str, ratio: float = 1.5) -> int:
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    od, nd = old.get("data"), new.get("data")
    if od is None or nd is None:
        print("data fingerprints: MISSING in",
              "both" if od is None and nd is None else
              (old_path if od is None else new_path),
              "- drift below cannot be attributed (pre-r08 artifact?)")
        data_same = None
    else:
        diffs = sorted(set(list(od) + list(nd)))
        changed = [t for t in diffs if od.get(t) != nd.get(t)]
        data_same = not changed
        if data_same:
            print(f"data fingerprints: IDENTICAL ({len(od)} tables) "
                  "- any drift below is code or environment")
        else:
            for t in changed:
                print(f"data CHANGED: {t}: {od.get(t)} -> {nd.get(t)}")
            print("- drift on queries reading these tables is likely DATA;"
                  " rerun standalone (graft.Scratch) before blaming code")
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    print(f"shared queries: {len(shared)}  "
          f"(only-old: {len(set(oq) - set(nq))}, only-new: {len(set(nq) - set(oq))})")
    tot_o = sum(oq[q] for q in shared)
    tot_n = sum(nq[q] for q in shared)
    raw = tot_n / tot_o if tot_o else float('nan')
    print(f"shared total: {tot_o:.1f}s -> {tot_n:.1f}s ({raw:.2f}x)")
    # machine-state controls (r15 item 6): pinned queries timed warm in
    # the same JVM before each suite — dividing the raw ratio by the
    # controls' ratio removes ambient box-speed drift, the repeated
    # confounder of round-over-round comparisons (r14: 1.2x, r15: 1.47x
    # of pure machine state).
    oc, nc = old.get("controls", {}), new.get("controls", {})
    cshared = sorted(set(oc) & set(nc))
    if cshared:
        co = sum(oc[q] for q in cshared)
        cn = sum(nc[q] for q in cshared)
        cr = cn / co if co else float('nan')
        print(f"controls ({len(cshared)}): {co:.2f}s -> {cn:.2f}s "
              f"({cr:.2f}x ambient)")
        if cr > 0:
            print(f"control-NORMALIZED shared ratio: {raw / cr:.2f}x "
                  "(machine-state drift divided out)")
    else:
        print("controls: absent in one artifact "
              "- the shared ratio above is raw (ambient included)")
    flagged = 0
    for q in shared:
        a, b = oq[q], nq[q]
        if a <= 0 or b <= 0:
            continue
        r = b / a
        if r >= ratio or r <= 1 / ratio:
            word = "REGRESSED" if r >= ratio else "improved"
            print(f"{word:>9}  {q:<28} {a:6.2f}s -> {b:6.2f}s ({r:.2f}x)")
            flagged += 1
    if not flagged:
        print(f"no per-query drift beyond {ratio}x")
    return 0


if __name__ == "__main__":
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], r))
