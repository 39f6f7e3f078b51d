#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--json out.json]

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs
the matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with
the sfDir tables registered as bare-named views, and compares: schema
(column names), row count, and values (columns sorted by name, rows sorted,
floats rounded to 9 significant decimals before hashing).

With --json, additionally writes a per-query artifact in the driver's
CORRECTNESS_r{N}.json shape — {query: {rows_match, schema_match,
hash_match, err}} — so the repo can commit a self-generated
CORRECTNESS_SELF.json at round end (round 8 merged with the driver's
artifact empty; this is the repo-side defense).
"""
import json
import sys
import glob

import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _iso(v):
    if v is None or v is pd.NaT:
        return None
    s = v.isoformat()
    return s + "T00:00:00" if len(s) == 10 else s


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]").astype(object)
        if df[c].dtype == object:
            # normalize date/datetime-like objects to a uniform ISO string
            df[c] = df[c].apply(lambda v: _iso(v) if hasattr(v, "isoformat") else v)
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def kinds(df: pd.DataFrame):
    """Numeric family per column: the driver hashes raw values, so int64 2
    vs float64 2.0 (e.g. a DuckDB HUGEINT sum widened by pandas) must FAIL
    here even though the values agree numerically."""
    out = []
    for c in df.columns:
        dt = df[c].dtype
        if np.issubdtype(dt, np.floating):
            out.append("float")
        elif np.issubdtype(dt, np.integer):
            out.append("int")
        elif np.issubdtype(dt, np.bool_):
            out.append("bool")
        else:
            out.append("other")
    return out


def main(sf_dir: str, out_dir: str, json_out: str = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    report = {}

    def record(name, rows_match, schema_match, hash_match, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "err": err}

    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            record(name, False, False, False, "no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            record(name, False, False, False, str(e)[:400])
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            record(name, len(got) == len(want), False, False,
                   f"columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            record(name, False, True, False, f"rows {len(got)} != {len(want)}")
            n_fail += 1
        elif kinds(got) != kinds(want):
            bad = [f"{c}: {g} vs {w}" for c, g, w in
                   zip(got.columns, kinds(got), kinds(want)) if g != w]
            print(f"FAIL {name}: dtype family mismatch ({'; '.join(bad)})")
            record(name, True, False, False,
                   f"dtype family mismatch ({'; '.join(bad)})")
            n_fail += 1
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=False, rtol=1e-9, atol=1e-9)
                print(f"OK   {name}: {len(got)} rows")
                record(name, True, True, True)
                continue
            except AssertionError as e:
                print(f"FAIL {name}: value mismatch: {str(e)[:400]}")
                record(name, True, True, False,
                       f"value mismatch: {str(e)[:400]}")
                n_fail += 1
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}: {len(report) - n_fail}/{len(report)} OK")
    return n_fail


if __name__ == "__main__":
    argv = sys.argv[1:]
    j = None
    if "--json" in argv:
        i = argv.index("--json")
        j = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sys.exit(1 if main(argv[0], argv[1], j) else 0)
