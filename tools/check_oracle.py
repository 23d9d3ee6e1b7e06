#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify's dump
against DuckDB executing oracle_sql.json over the same parquet tables, and
compare row-by-row after sorting columns by name and rows by value.

STRICT mode (round 2+): the round-1 version coerced both sides through
float() which masked exactly the divergences the driver's hash trips on
(DuckDB HUGEINT vs Spark int64; DECIMAL renderings). Now we compare
 (a) Arrow schema types exactly (sorted by column name), and
 (b) canonical per-value string reprs with NO cross-type coercion
     (floats via repr() = shortest round-trip, so 1.0 != 1).
We also warn on driver-fragile output types (decimal/hugeint/float128)
even when they match, since pandas-style readers can re-render them.

Usage: python3 tools/check_oracle.py <sfdir> <verify_out_dir>
"""
import sys, os, json, math, decimal
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

FRAGILE = ("decimal", "halffloat")


def canon(v):
    """Canonical string repr with no cross-type coercion."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return "f:" + repr(v)
    if isinstance(v, bool):
        return "b:" + str(v)
    if isinstance(v, int):
        return "i:" + str(v)
    if isinstance(v, decimal.Decimal):
        return "d:" + str(v)
    if isinstance(v, bytes):
        return "y:" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return "s:" + str(v)


def table_rows(tbl: pa.Table):
    """Sorted-column, sorted-row list of canonical row tuples."""
    cols = sorted(tbl.column_names)
    pylists = [tbl.column(c).to_pylist() for c in cols]
    rows = [tuple(canon(pylists[j][i]) for j in range(len(cols)))
            for i in range(tbl.num_rows)]
    rows.sort()
    return cols, rows


def type_sig(tbl: pa.Table):
    return {c: str(tbl.schema.field(c).type) for c in sorted(tbl.column_names)}


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"[MISS] {name}: no spark output"); failures += 1; continue
        try:
            got = pq.read_table(spark_dir)
        except Exception as e:
            print(f"[ERR ] {name}: read spark output: {e}"); failures += 1; continue
        try:
            exp = con.execute(sql).arrow()
        except Exception as e:
            print(f"[ERR ] {name}: duckdb: {str(e)[:200]}"); failures += 1; continue

        gt, et = type_sig(got), type_sig(exp)
        warn = [f"{c}:{t}" for c, t in gt.items() if any(f in t for f in FRAGILE)]
        if warn:
            print(f"[WARN] {name}: driver-fragile output types {warn}")
        if sorted(got.column_names) != sorted(exp.column_names):
            print(f"[FAIL] {name}: columns {sorted(got.column_names)} vs {sorted(exp.column_names)}")
            failures += 1; continue
        if gt != et:
            diffs = {c: (gt[c], et[c]) for c in gt if gt[c] != et[c]}
            print(f"[FAIL] {name}: dtype mismatch {diffs}")
            failures += 1; continue
        gc, grows = table_rows(got)
        _, erows = table_rows(exp)
        if len(grows) != len(erows):
            print(f"[FAIL] {name}: rows {len(grows)} vs {len(erows)}"); failures += 1; continue
        bad = None
        for i, (gr, er) in enumerate(zip(grows, erows)):
            if gr != er:
                for j, c in enumerate(gc):
                    if gr[j] != er[j]:
                        bad = (i, c, gr[j], er[j]); break
                break
        if bad:
            print(f"[FAIL] {name}: sorted-row {bad[0]} col {bad[1]}: spark={bad[2]!r} duckdb={bad[3]!r}")
            failures += 1
        else:
            print(f"[ OK ] {name}: {len(grows)} rows")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
