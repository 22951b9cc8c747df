#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the corresponding oracle SQL from
oracle_sql.json in DuckDB over the same sf tables, sort columns by name,
sort rows, and compare values. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, glob, json, math
import duckdb


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def frame_rows(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(norm_cell(v) for v in r) for r in df.itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_glob = glob.glob(f"{outdir}/{name}/*.parquet")
        if not res_glob:
            print(f"FAIL {name}: no spark result parquet")
            n_bad += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read result: {e}")
            n_bad += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}")
            n_bad += 1
            continue
        # The driver's comparer sorts with pandas sort_values, which
        # raises on ndarray/list cells — flag array-typed outputs loudly
        # even though our normalizer can handle them.
        arr_cols = [c for c in got.columns
                    if got[c].map(lambda v: isinstance(v, (list, tuple))
                                  or type(v).__name__ == "ndarray").any()]
        if arr_cols:
            print(f"WARN {name}: array-typed output columns {arr_cols} "
                  "would break the driver's pandas sort — stringify them")
        gc, gr = frame_rows(got)
        ec, er = frame_rows(exp)
        if gc != ec:
            print(f"FAIL {name}: columns spark={gc} oracle={ec}")
            n_bad += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows spark={len(gr)} oracle={len(er)}")
            n_bad += 1
            continue
        diffs = [(a, b) for a, b in zip(gr, er) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)}/{len(gr)} rows differ; first: spark={diffs[0][0]} oracle={diffs[0][1]}")
            n_bad += 1
            continue
        print(f"OK   {name} ({len(gr)} rows)")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
