#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

For each query output parquet under <verifyOutDir>/<name>, runs the
matching SQL from oracle_sql.json in DuckDB over the same sf tables,
sorts both results by all columns, and compares row counts, column
names, and values (exact for ints/strings, 1e-9 relative for floats).
"""
import json, math, sys, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            # fetch through pandas, as the driver does: DuckDB HUGEINT
            # (e.g. windowed sum of BIGINT) becomes float64 here, which
            # the raw fetchall() path would mask as a plain Python int
            gdf = con.execute(
                f"SELECT * FROM parquet_scan('{qdir}/*.parquet')").df()
            got = [tuple(r) for r in gdf.itertuples(index=False)]
            got_cols = list(gdf.columns)
            wdf = con.execute(sql).df()
            want = [tuple(r) for r in wdf.itertuples(index=False)]
            want_cols = list(wdf.columns)
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        # driver sorts columns by name before hashing
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        wi = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1; continue
        try:
            g = sorted(tuple(norm(r[i]) for i in gi) for r in got)
            w = sorted(tuple(norm(r[i]) for i in wi) for r in want)
        except (TypeError, ValueError) as e:
            # TypeError: None next to str in a sort key; ValueError:
            # numpy-array/list cells with ambiguous truth value during
            # tuple comparison — both are real compare-side divergences
            # (the driver's pandas sort dies the same way)
            print(f"FAIL {name}: unsortable mixed-type column ({e})")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}"); n_fail += 1; continue
        bad = None
        for a, b in zip(g, w):
            for x, y in zip(a, b):
                # the driver hashes pandas values, where int64 vs float64
                # (e.g. DuckDB HUGEINT sums) and list cells both diverge
                # even when values are equal — mirror that strictness
                if any(not isinstance(v, (str, bytes)) and hasattr(v, "__len__")
                       for v in (x, y)):
                    bad = (("list-typed cell breaks driver compare",), (a, b)); break
                if isinstance(x, float) != isinstance(y, float):
                    bad = (("int-vs-float dtype drift",), (a, b)); break
                if isinstance(x, float) and isinstance(y, float):
                    if not (math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)):
                        bad = (a, b); break
                elif x != y:
                    bad = (a, b); break
            if bad: break
        if bad:
            print(f"FAIL {name}: first diff {bad[0]} != {bad[1]}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
