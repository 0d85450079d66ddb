#!/usr/bin/env python3
"""Compare two bench artifacts and attribute per-query drift.

Usage: python3 tools/bench_compare.py <old_bench.json> <new_bench.json> [ratio]
       python3 tools/bench_compare.py --notes <old_bench.json> <new_bench.json>

Flags queries whose min-of-passes moved by more than `ratio` (default 1.5x)
in either direction. If both artifacts carry a `data` fingerprint block
(per-table row count + xxhash64 checksum, emitted by graft.Bench since r08),
the report states whether the underlying testdata changed — a drift on
changed data is attributed to data, not code, and needs a standalone rerun
(graft.Scratch) to confirm before anyone chases a code regression.

`--notes` emits the BENCH_NOTES comparison block verbatim (markdown,
naming BOTH artifact files, raw AND control-normalized ratios) — paste it
into BENCH_NOTES_r{N}.md unedited so the notes always byte-match the
artifacts they cite (r16 verdict item 6: hand-written notes cited a
different run than the committed artifact).
"""
import sys, json


def load(path):
    """Accept both the bare graft.Bench line (bench_result.json) and the
    driver's wrapper artifact (BENCH_r{N}.json nests it under `parsed`)."""
    d = json.load(open(path))
    if isinstance(d, dict) and "parsed" in d:
        if d["parsed"] is None:
            sys.exit(f"{path}: driver artifact carries parsed=null (its "
                     "tail was truncated) — compare the round's committed "
                     "bench_result.json instead")
        return d["parsed"]
    return d


def notes_block(old_path: str, new_path: str) -> int:
    old = load(old_path)
    new = load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    tot_o = sum(oq[q] for q in shared)
    tot_n = sum(nq[q] for q in shared)
    raw = tot_n / tot_o if tot_o else float('nan')
    oc, nc = old.get("controls", {}), new.get("controls", {})
    cshared = sorted(set(oc) & set(nc))
    print(f"## Round-over-round comparison (emitted by tools/bench_compare.py --notes)")
    print()
    print(f"- baseline artifact: `{old_path}` "
          f"(total {old.get('value', float('nan')):.1f} s, "
          f"{len(oq)} queries, sf={old.get('sf')})")
    print(f"- this artifact:     `{new_path}` "
          f"(total {new.get('value', float('nan')):.1f} s, "
          f"{len(nq)} queries, sf={new.get('sf')})")
    print(f"- shared-{len(shared)} subtotal: {tot_o:.1f} s -> {tot_n:.1f} s "
          f"= **{raw:.2f}x raw**")
    if cshared:
        co = sum(oc[q] for q in cshared)
        cn = sum(nc[q] for q in cshared)
        cr = cn / co if co else float('nan')
        print(f"- controls ({', '.join(cshared)}): {co:.3f} s -> {cn:.3f} s "
              f"= {cr:.2f}x ambient box drift")
        ratios = {q: (nc[q] / oc[q]) for q in cshared if oc[q] > 0}
        per = ", ".join(f"{q} {r:.2f}x" for q, r in sorted(ratios.items()))
        print(f"- per-control: {per}")
        if cr > 0:
            print(f"- **control-normalized shared ratio: {raw / cr:.2f}x** "
                  "(cite this one; raw includes machine state)")
        if ratios and max(ratios.values()) / max(min(ratios.values()), 1e-9) > 1.5:
            print("- WARNING: control drift is DIMENSION-SPLIT (compute vs "
                  "file-metadata moved differently) — the blended "
                  "normalization is approximate; adjudicate the top "
                  "regressions with warm `graft.Scratch` A/B (checkout the "
                  "old sources) before attributing them to code")
    else:
        print("- controls: absent in one artifact — raw ratio only")
    regs = []
    for q in shared:
        a, b = oq[q], nq[q]
        if a > 0 and b > 0 and b / a >= 2.0:
            regs.append((b / a, q, a, b))
    if regs:
        print(f"- shared queries regressed >= 2x: {len(regs)}")
        for r, q, a, b in sorted(regs, reverse=True):
            print(f"  - {q}: {a:.2f} s -> {b:.2f} s ({r:.2f}x)")
    else:
        print("- zero shared queries regressed >= 2x")
    return 0


def main(old_path: str, new_path: str, ratio: float = 1.5) -> int:
    old = load(old_path)
    new = load(new_path)
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
    if sys.argv[1] == "--notes":
        sys.exit(notes_block(sys.argv[2], sys.argv[3]))
    r = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], r))
