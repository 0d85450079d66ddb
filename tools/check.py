#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each <name>.parquet dumped by graft.Verify, runs the matching SQL from
oracle_sql.json in DuckDB over the same testdata parquet tables, sorts
columns by name and rows by value, and compares cell-by-cell (exact for
non-floats, tiny epsilon report for floats so we can see near-misses
before the driver's hash compare flags them).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    # Row sort key: floats rounded to 6 decimals so low-order-bit diffs
    # between the two sides can't reorder rows (which would turn a float
    # near-miss into misleading per-cell mismatches on other columns).
    keyed = df.copy()
    for c in keyed.columns:
        if np.issubdtype(keyed[c].dtype, np.floating):
            keyed[c] = keyed[c].round(6)
    key = keyed.astype(str).apply(lambda r: "\x00".join(r.values), axis=1)
    return df.iloc[key.argsort(kind="stable")].reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*"))
                   if os.path.isdir(d))
    n_pass = n_fail = n_skip = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracles:
            print(f"SKIP  {name}: no oracle ({len(got)} rows)")
            n_skip += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        bad = None
        for c in g.columns:
            # Driver-hash faithfulness: the driver stringifies values, so an
            # int column on one side vs float on the other ("5" vs "5.0")
            # hash-mismatches even when numerically equal. DuckDB returns
            # HUGEINT (-> pandas float64) for any uncast sum()-derived
            # integer expression — every oracle output column derived from
            # sum() MUST be CAST(... AS BIGINT). This caught r07's only
            # five hash failures (q137/q142/q154/q155/q158).
            if (np.issubdtype(g[c].dtype, np.floating) !=
                    np.issubdtype(e[c].dtype, np.floating)):
                bad = (c, "dtype-divergence",
                       f"spark={g[c].dtype} oracle={e[c].dtype} "
                       "(uncast HUGEINT? wrap oracle col in CAST(.. AS BIGINT))")
                break
            gv, ev = g[c].values, e[c].values
            if np.issubdtype(np.asarray(gv).dtype, np.floating) or \
               np.issubdtype(np.asarray(ev).dtype, np.floating):
                gv = np.asarray(gv, dtype=np.float64)
                ev = np.asarray(ev, dtype=np.float64)
                exact = np.array_equal(gv, ev, equal_nan=True)
                if not exact:
                    close = np.allclose(gv, ev, rtol=1e-12, atol=1e-12, equal_nan=True)
                    bad = (c, "float-near-miss" if close else "float-mismatch",
                           _first_diff(gv, ev))
                    break
            else:
                if not (pd.Series(gv).astype(str).values ==
                        pd.Series(ev).astype(str).values).all():
                    bad = (c, "mismatch", _first_diff(gv, ev))
                    break
        if bad:
            print(f"FAIL  {name}: col {bad[0]} {bad[1]}: {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(g)} rows, {len(g.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


def _first_diff(gv, ev):
    for i, (a, b) in enumerate(zip(gv, ev)):
        if str(a) != str(b) and not (isinstance(a, float) and isinstance(b, float)
                                     and (a == b or (np.isnan(a) and np.isnan(b)))):
            return f"row {i}: got={a!r} exp={b!r}"
    return "?"


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
