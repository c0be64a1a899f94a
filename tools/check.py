#!/usr/bin/env python3
"""Local dev mirror of the driver's correctness gate.

Runs each oracle SQL from `oracle_sql.json` in DuckDB over the sf parquet
tables and compares against the Spark result parquet written by
`graft.Verify` — columns sorted by name, values compared exactly (floats
bit-exact, mirroring a hash compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [jsonOut]

With `jsonOut`, also writes the verdict in the DRIVER'S artifact shape —
per query {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err} — so each round can commit its own correctness
evidence (e.g. CORRECTNESS_local_r12.json) and the signal survives a
driver-side artifact failure (VERDICT r11 #1: the driver's
CORRECTNESS_r11.json arrived as an empty `{}`). A query present in
`queries` but absent from `oracle_sql.json` (the documented rows-only
exemptions) is recorded with hash_match=null and err="no_oracle".
"""
import sys, json, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    verdict = {}
    def record(name, rows_match=None, schema_match=None, hash_match=None,
               spark_rows=None, oracle_rows=None, err=None):
        verdict[name] = {"rows_match": rows_match, "schema_match": schema_match,
                         "hash_match": hash_match, "spark_rows": spark_rows,
                         "oracle_rows": oracle_rows, "err": err}
    # rows-only exemptions: a Verify result dir with no oracle entry
    for res in sorted(os.listdir(out_dir)):
        if res not in oracles and os.path.isdir(os.path.join(out_dir, res)):
            files = glob.glob(os.path.join(out_dir, res, "*.parquet"))
            n = (con.execute(f"SELECT count(*) FROM read_parquet({files!r})")
                 .fetchone()[0] if files else None)
            record(res, spark_rows=n, err="no_oracle")
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1
            record(name, err="no spark result parquet"); continue
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1
            record(name, err=f"oracle error: {e}"); continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        oracle = oracle[sorted(oracle.columns)]
        got = got[sorted(got.columns)]
        if list(oracle.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != oracle {list(oracle.columns)}")
            n_fail += 1
            record(name, rows_match=len(oracle) == len(got), schema_match=False,
                   hash_match=False, spark_rows=len(got), oracle_rows=len(oracle))
            continue
        if len(oracle) != len(got):
            print(f"FAIL {name}: rows {len(got)} != oracle {len(oracle)}")
            n_fail += 1
            record(name, rows_match=False, schema_match=True, hash_match=False,
                   spark_rows=len(got), oracle_rows=len(oracle))
            continue
        # dtype drift is a driver-hash failure even when Python == passes
        # (e.g. DuckDB window SUM(BIGINT) -> HUGEINT -> float64 vs Spark
        # int64: 700.0 == 700 is True but repr/hash differ). Mirror the
        # driver by requiring identical pandas dtypes per column.
        bad_dtypes = [(c, str(oracle[c].dtype), str(got[c].dtype))
                      for c in oracle.columns
                      if str(oracle[c].dtype) != str(got[c].dtype)]
        if bad_dtypes:
            for c, od, gd in bad_dtypes:
                print(f"FAIL {name}: col {c} dtype oracle={od} got={gd}")
            n_fail += 1
            record(name, rows_match=True, schema_match=True, hash_match=False,
                   spark_rows=len(got), oracle_rows=len(oracle),
                   err="dtype drift: " + ",".join(c for c, _, _ in bad_dtypes))
            continue
        def norm(v):
            if hasattr(v, "tolist"):  # numpy array/scalar cells (list columns)
                return norm(v.tolist())
            if isinstance(v, list):
                return [norm(x) for x in v]
            # NaN != NaN under ==; map to a sentinel so a legitimately-NaN
            # cell (e.g. 0/0 ratios) agrees when both engines emit NaN
            if isinstance(v, float) and v != v:
                return "__nan__"
            # type-tagged compare: Python == treats 700 == 700.0 as equal,
            # the driver's hash does not — tag scalars with their type so
            # int/float (or Decimal/float) drift inside object columns fails
            # here the way it fails there
            if v is not None and not isinstance(v, (list, dict)):
                return (type(v).__name__, v)
            return v
        ok = True
        for c in oracle.columns:
            a = [norm(x) for x in oracle[c].tolist()]
            b = [norm(x) for x in got[c].tolist()]
            if a != b:
                bad = next(i for i in range(len(a)) if a[i] != b[i])
                print(f"FAIL {name}: col {c} row {bad}: oracle={a[bad]!r} got={b[bad]!r}")
                ok = False; break
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
        record(name, rows_match=True, schema_match=True, hash_match=ok,
               spark_rows=len(got), oracle_rows=len(oracle))
    print(f"\n{n_pass} pass / {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(verdict, f, indent=1, sort_keys=True)
        print(f"verdict -> {json_out}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
