#!/usr/bin/env python3
"""Local dev harness mirroring the driver's correctness gate:
runs DuckDB on each oracle_sql.json entry over the sf tables and compares
against the parquet the engine's Verify main dumped.

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [only]

`only` (optional, comma-separated entry names) restricts the compare to
those oracle entries — the selective gate for per-commit iteration on a
changed lineage (pair it with Verify's matching 3rd arg so the dump has
the same subset). The driver and the round-close ritual always run the
FULL set: selective passes never substitute for the full sf0.01 gate.
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Output-column types whose stringification diverges between the driver's
# hasher (pandas .df(): HUGEINT/DECIMAL -> float64 -> "3.0") and plain
# fetchall (python int -> "3"). An oracle emitting one of these can pass
# this local gate yet fail the driver's hash compare (round-10 p180:
# uncast `sum(...) OVER (...)` is HUGEINT). Always CAST to BIGINT/DOUBLE.
UNSAFE_TYPE_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT")


def lint_types(con, name, sql):
    """Return list of (col, type) output columns with driver-hash-unsafe types."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(c, t) for c, t, *_ in desc
            if any(t.upper().startswith(p) for p in UNSAFE_TYPE_PREFIXES)]


def canon(rows, cols):
    # driver compare: sort columns by name, then sort rows; stringify values
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6g}"
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        names = {n.strip() for n in only.split(",") if n.strip()}
        # a truthy-but-empty filter (",", " ") must NOT become a vacuous
        # 0/0 pass of the gate — fail loudly instead
        if not names:
            print("FAIL selective filter given but empty — refusing a 0-entry gate")
            return 1
        unknown = names - set(oracle)
        if unknown:
            print(f"FAIL unknown entry names in --only: {sorted(unknown)}")
            return 1
        oracle = {k: v for k, v in oracle.items() if k in names}
        print(f"[selective] {len(oracle)} of the full set — NOT the round gate")
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            bad_types = lint_types(con, name, sql)
            if bad_types:
                print(f"FAIL {name}: driver-hash-unsafe oracle output types {bad_types}"
                      " (CAST to BIGINT/DOUBLE)")
                failed.append(name)
                continue
            ocur = con.execute(sql)
            ocols = [d[0].lower() for d in ocur.description]
            orows = ocur.fetchall()
            gcur = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols = [d[0].lower() for d in gcur.description]
            grows = gcur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        if sorted(ocols) != sorted(gcols):
            print(f"FAIL {name}: cols oracle={sorted(ocols)} got={sorted(gcols)}")
            failed.append(name)
            continue
        oc, gc = canon(orows, ocols), canon(grows, gcols)
        if oc != gc:
            print(f"FAIL {name}: rows oracle={len(oc)} got={len(gc)}")
            o_only = [r for r in oc if r not in set(gc)][:3]
            g_only = [r for r in gc if r not in set(oc)][:3]
            print(f"  oracle-only: {o_only}")
            print(f"  engine-only: {g_only}")
            failed.append(name)
        else:
            print(f"PASS {name} ({len(gc)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
