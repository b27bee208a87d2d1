#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the parquet
tables in <sfDir>, and compares: row count, column names (sorted), and a hash
of the sorted rows with columns sorted by name.
"""
import json, sys, math, hashlib
from decimal import Decimal
from pathlib import Path

import duckdb


def canon(v):
    if v is None:
        return "NULL"
    # Integer-valued values render as integers no matter how they arrive
    # (int, Decimal, float) — DuckDB HUGEINT can surface as Decimal/float
    # depending on the fetch path, which burned round 1's driver compare.
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, Decimal):
        if v == v.to_integral_value():
            return str(int(v))
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v.is_integer() and abs(v) < 2**53:
            return str(int(v))
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in Path(sf_dir).glob("*.parquet"):
        con.execute(
            f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchall()
        gcols = [d[0] for d in con.description]
        try:
            rel = con.sql(oracle[name])
            ecols = list(rel.columns)
            etypes = [str(t) for t in rel.types]
            exp = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        # The driver's canonicalizer renders DuckDB HUGEINT differently from
        # Spark BIGINT (r1 postmortem: 15 hash fails). Reject it here so the
        # replica can never be greener than the driver.
        huge = [c for c, t in zip(ecols, etypes) if "HUGEINT" in t.upper()]
        if huge:
            print(f"FAIL {name}: oracle emits HUGEINT column(s) {huge} — "
                  f"CAST(... AS BIGINT) in the oracle SQL")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols {sorted(gcols)} != {sorted(ecols)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        hg, he = table_hash(got, gcols), table_hash(exp, ecols)
        if hg != he:
            print(f"FAIL {name}: hash mismatch ({len(got)} rows)")
            order = sorted(range(len(gcols)), key=lambda i: gcols[i])
            gs = sorted("\x01".join(canon(r[i]) for i in order) for r in got)
            es = sorted("\x01".join(canon(r[i]) for i in order) for r in exp)
            for a, b in zip(gs, es):
                if a != b:
                    print(f"  spark:  {a[:200]}")
                    print(f"  duckdb: {b[:200]}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
