#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each Verify parquet
result, run the corresponding oracle SQL in DuckDB over the same sf dir,
sort columns by name + rows by all values, and compare."""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    # EXACT comparison (repr of every value, floats bit-for-bit): verified
    # achievable for the whole corpus — every aggregate double is rounded
    # identically on both sides, so no tolerance is needed or wanted.
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["\x00".join(repr(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Output TYPE lint, BOTH engines: (a) DuckDB SUM(INTEGER) yields HUGEINT
    # (int128), a type Spark cannot produce — the driver's hash is
    # type-sensitive, so an uncast integer sum fails hash_match even when
    # every value is equal (bit us on q124/q125 in round 6). (b) DECIMAL is
    # representable on both engines but ENCODED differently (Spark parquet
    # FIXED_LEN_BYTE_ARRAY vs DuckDB int128) and the driver hash is
    # representation-sensitive — bit us on q208/q215 in round 8 with
    # bit-identical values. Ban both types from every output schema, oracle
    # AND Spark parquet; render exact big integers as digit strings instead.
    BANNED = {"HUGEINT", "UHUGEINT", "DECIMAL"}
    for name in sorted(oracle):
        try:
            desc = con.sql(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            print(f"  X {name}: oracle DESCRIBE error: {e}")
            n_fail += 1
            continue
        bad = [(c, t) for c, t, *_ in desc
               if t.split("(")[0].upper() in BANNED]
        if bad:
            print(f"  X {name}: LINT oracle column(s) typed un-hashable "
                  f"{bad} — CAST to BIGINT (or VARCHAR if >int64)")
            n_fail += 1
    import os
    # Registered-but-ABSENT is a failure, not a gap: in round 7 36 queries
    # threw inside Verify, wrote no parquet, and silently vanished from the
    # gate. Verify now dumps its registry; any name with no result dir here
    # is counted as failed.
    reg_path = f"{out_dir}/registered_queries.json"
    if os.path.exists(reg_path):
        registered = set(json.load(open(reg_path)))
        present = {n for n in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{n}")}
        for name in sorted(registered - present):
            print(f"  X {name}: ABSENT — registered in SparkEntry.queries "
                  "but Verify wrote no result (it threw; see [verify] log)")
            n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue
        res = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        bad = [(c, t) for c, t, *_ in
               con.sql(f"DESCRIBE SELECT * FROM read_parquet("
                       f"'{out_dir}/{name}/*.parquet')").fetchall()
               if t.split("(")[0].upper() in BANNED]
        if bad:
            print(f"  X {name}: LINT spark output column(s) typed "
                  f"hash-unstable {bad} — cast to bigint/string in the query")
            n_fail += 1
            continue
        got_cols, got = canon(res.fetchall(), list(res.columns))
        if name not in oracle:
            print(f"  ~ {name}: rows-only ({len(got)} rows)"
                  + ("  !! EMPTY" if not got else ""))
            continue
        try:
            exp_res = con.sql(oracle[name])
            exp_cols, exp = canon(exp_res.fetchall(), list(exp_res.columns))
        except Exception as e:
            print(f"  X {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"  X {name}: columns differ: spark={got_cols} duck={exp_cols}")
            n_fail += 1
        elif len(got) != len(exp):
            print(f"  X {name}: row count {len(got)} vs {len(exp)}")
            n_fail += 1
        elif got != exp:
            bad = [(g, e) for g, e in zip(got, exp) if g != e]
            print(f"  X {name}: {len(bad)}/{len(got)} rows differ; first: ")
            print(f"      spark: {bad[0][0][:200]}")
            print(f"      duck : {bad[0][1][:200]}")
            n_fail += 1
        else:
            print(f"  ok {name} ({len(got)} rows)")
            n_pass += 1
    print(f"PASS {n_pass} FAIL {n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
                  sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"))
