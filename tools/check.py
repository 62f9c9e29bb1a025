#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped Scala library does not depend on this).

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet, executes the oracle SQL in DuckDB over the
same source tables and compares row count, column names, and a value hash
(columns sorted by name, rows sorted by all columns, values stringified).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_fingerprint(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(norm(r[i]) for i in order) for r in rows]
    data.sort()
    import hashlib
    h = hashlib.sha256()
    for row in data:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = fail = 0
    results = {}
    seen_dirs = set()
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        seen_dirs.add(name)
        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        tbl = pq.read_table(os.path.join(path, files[0]))
        got_cols = tbl.column_names
        got_rows = [tuple(r[c] for c in got_cols) for r in tbl.to_pylist()]
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got_rows)}"
            print(f"  {name}: rows-only, {len(got_rows)} rows")
            continue
        try:
            cur = con.execute(oracle[name])
            want_cols = [d[0] for d in cur.description]
            want_rows = cur.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_ERROR {e}"
            fail += 1
            print(f"✗ {name}: oracle error: {e}")
            continue
        problems = []
        if sorted(got_cols) != sorted(want_cols):
            problems.append(f"cols {sorted(got_cols)} != {sorted(want_cols)}")
        if len(got_rows) != len(want_rows):
            problems.append(f"rows {len(got_rows)} != {len(want_rows)}")
        if not problems:
            gh = table_fingerprint(got_rows, got_cols)
            wh = table_fingerprint(want_rows, want_cols)
            if gh != wh:
                problems.append("hash mismatch")
                order_g = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
                order_w = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
                gs = sorted(tuple(norm(r[i]) for i in order_g) for r in got_rows)
                ws = sorted(tuple(norm(r[i]) for i in order_w) for r in want_rows)
                for i, (g, w) in enumerate(zip(gs, ws)):
                    if g != w:
                        problems.append(f"first diff row {i}: got={g} want={w}")
                        break
        if problems:
            fail += 1
            results[name] = "FAIL " + "; ".join(problems)
            print(f"✗ {name}: {'; '.join(problems[:2])}")
        else:
            ok += 1
            results[name] = "OK"
            print(f"✓ {name} ({len(got_rows)} rows)")
    # a query that threw inside graft.Verify writes no result directory —
    # count every attempted query (oracle AND rows-only, from the run's
    # manifest) with no directory as a failure, not a skip
    manifest_path = os.path.join(out_dir, "manifest.json")
    attempted = set(json.load(open(manifest_path))) \
        if os.path.exists(manifest_path) else set(oracle)
    for name in sorted(attempted - seen_dirs):
        fail += 1
        results[name] = "MISSING result dir (query failed in Verify?)"
        print(f"✗ {name}: missing result dir (query failed in Verify?)")
    print(f"\n{ok} ok, {fail} fail, "
          f"{len([r for r in results.values() if r.startswith('ROWS_ONLY')])} rows-only")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
