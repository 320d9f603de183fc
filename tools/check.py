#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query result parquet in <verifyOutDir>/<name>/, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
parquet tables, sorts columns by name, and compares row-by-row hashes
(mirroring the driver: columns sorted by name before hashing values).
"""
import sys, json, glob, os, math
import duckdb
import pyarrow.parquet as pq

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Full round-trip precision: the driver hashes exact values, so a
        # lenient local formatter (the old %.6g) can pass what the driver
        # fails. Queries must produce bit-identical doubles in both
        # engines (decimal-cast sums, exact integer arithmetic).
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return [tuple(norm(r[i]) for i in order) for r in rows]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    # Crashed queries leave a <name>._FAILED marker (graft.Verify): count
    # each as a red row so a crash can never shrink the gate silently.
    for marker in sorted(glob.glob(os.path.join(out_dir, "*._FAILED"))):
        name = os.path.basename(marker)[: -len("._FAILED")]
        msg = open(marker).read().strip().splitlines()
        print(f"CRASHED  {name}: {msg[0] if msg else '(no message)'}")
        n_fail += 1
    # An INTENDED pre-flight refusal (graft.core.PreflightRefusal) is a
    # distinct marker and a pass-with-note, never a red row — but only
    # the refusal path writes it, so a genuine crash in the same query
    # still lands above as CRASHED.
    for marker in sorted(glob.glob(os.path.join(out_dir, "*._REFUSED"))):
        name = os.path.basename(marker)[: -len("._REFUSED")]
        msg = open(marker).read().strip().splitlines()
        print(f"REFUSED  {name}: {msg[0][:70] if msg else ''} (pre-flight; "
              f"pass-with-note)")
        n_pass += 1
    # An oracle entry with neither a dump dir nor a marker means Verify
    # itself died mid-run — also loud.
    for name in sorted(oracle):
        if not os.path.isdir(os.path.join(out_dir, name)) and \
                not os.path.exists(os.path.join(out_dir, f"{name}._FAILED")) and \
                not os.path.exists(os.path.join(out_dir, f"{name}._REFUSED")):
            print(f"NODUMP   {name}: oracle entry but no output at all")
            n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"MISSING  {name}: no parquet output")
            n_fail += 1
            continue
        tbl = pq.read_table(files[0])
        spark_cols = tbl.column_names
        spark_rows = [tuple(r.values()) for r in tbl.to_pylist()]
        # The driver sorts result rows with pandas before hashing; list/
        # array-typed cells make that sort throw ("unhashable type:
        # numpy.ndarray", r2 q_map_funcs). Reject them locally too.
        arrcols = [c for c, f in zip(tbl.column_names, tbl.schema.types)
                   if str(f).startswith(("list", "large_list", "map", "struct"))]
        if arrcols and name in oracle:
            print(f"ARRAYCOL {name}: driver-unsortable column(s) {arrcols}; "
                  f"emit them joined as strings")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"ROWSONLY {name}: {len(spark_rows)} rows (no oracle)")
            continue
        try:
            # Single execution: fetch as Arrow and derive BOTH the row
            # tuples (to_pylist: plain Python scalars, same as the Spark
            # side) and the pandas dtype kinds from that one result —
            # running the SQL twice wasted work and quietly assumed the
            # query was deterministic.
            # Dtype parity rationale (r3 q_corpus_report): DuckDB
            # HUGEINT / DECIMAL sums coerce to float64 in pandas while
            # the Spark parquet stays int64 — values then hash as
            # "27165.0" vs "27165"; requiring matching dtype kinds
            # catches that class. date_as_object=False mirrors the
            # Spark-side to_pandas call so date columns compare 'M'/'M'.
            duck_tbl = con.execute(oracle[name]).arrow()
            duck_cols = duck_tbl.column_names
            duck_rows = [tuple(r.values()) for r in duck_tbl.to_pylist()]
            duck_pd = duck_tbl.to_pandas(date_as_object=False)
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"SCHEMA   {name}: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        spark_pd = tbl.to_pandas(date_as_object=False)
        kind = lambda df, c: df.dtypes[c].kind
        dtbad = [(c, kind(spark_pd, c), kind(duck_pd, c))
                 for c in sorted(spark_cols)
                 if kind(spark_pd, c) != kind(duck_pd, c)]
        if dtbad:
            print(f"DTYPE    {name}: pandas dtype kinds diverge (spark vs duck): "
                  f"{dtbad} — cast the oracle column (e.g. CAST(... AS BIGINT))")
            n_fail += 1
            continue
        sh = table_hash(spark_rows, spark_cols)
        dh = table_hash(duck_rows, duck_cols)
        if len(sh) != len(dh):
            print(f"ROWCOUNT {name}: spark={len(sh)} duck={len(dh)}")
            n_fail += 1
            continue
        if sh != dh:
            bad = next(i for i, (a, b) in enumerate(zip(sh, dh)) if a != b)
            print(f"VALUES   {name}: first diff row {bad}:")
            print(f"  spark: {sh[bad]}")
            print(f"  duck : {dh[bad]}")
            n_fail += 1
            continue
        print(f"PASS     {name}: {len(sh)} rows")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
