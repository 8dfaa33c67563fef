#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--strict] [names...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
the sf parquet tables as DuckDB views, runs each oracle, reads the matching
Spark result parquet, and compares (columns sorted by name, rows sorted,
values normalized). Prints one line per query: OK / MISMATCH / ERROR.

--strict is the builder's gate: floats compare BYTE-EXACT (rtol=0, atol=0,
no round(6) normalization), matching the driver's hash compare. The default
tolerant mode exists only for triaging HOW far apart a mismatch is — round 4
shipped two driver-hash-red queries precisely because the tolerant mode was
used as the gate (1-ulp round() divergence passed rtol=1e-6, failed bytes).
Optional trailing names restrict the compare to those queries.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# DuckDB result types Spark output can never byte-hash-match: int128s,
# unsigned ints, and fixed-point decimals. An oracle emitting one of these
# passes a value compare (normalize() casts to int64) while failing the
# driver's byte hash — the exact hole the r4/r5 q62/q107/q126/q131/q135
# reds fell through (uncast sum(BIGINT) -> HUGEINT). Lint it out instead.
BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER",
                       "USMALLINT", "UTINYINT", "DECIMAL")


def lint_oracle_types(con, sql: str):
    """Return [(col, type)] pairs whose DuckDB result type Spark can't emit."""
    rel = con.sql(sql)
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if any(t.startswith(b) for b in BANNED_ORACLE_TYPES):
            bad.append((col, t))
    return bad


def class_of(dtype) -> str:
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "ts"
    return "other"


def normalize(df: pd.DataFrame, strict: bool) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None) if s.dt.tz is None else pd.to_datetime(s).dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.apply(lambda v: str(v) if v is not None and not (isinstance(v, float) and pd.isna(v)) else None)
        elif pd.api.types.is_float_dtype(s):
            if not strict:
                df[c] = s.round(6)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str, strict: bool = False, names=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name in sorted(oracles):
        if names and name not in names:
            continue
        sql = oracles[name]
        try:
            bad_types = lint_oracle_types(con, sql)
            if bad_types:
                print(f"MISMATCH {name}: oracle emits driver-unhashable types "
                      f"{bad_types} — wrap in CAST(... AS BIGINT/DOUBLE)")
                n_bad += 1
                continue
            expected = con.execute(sql).fetchdf()
            got_dir = Path(out_dir) / name
            got = con.execute(f"SELECT * FROM '{got_dir}/*.parquet'").fetchdf()
            # integer-vs-float class mismatch also breaks the driver's byte
            # hash even when values compare equal after normalization
            class_bad = [
                (c, class_of(expected[c].dtype), class_of(got[c].dtype))
                for c in sorted(set(expected.columns) & set(got.columns))
                if {class_of(expected[c].dtype), class_of(got[c].dtype)} == {"int", "float"}
            ]
            if class_bad:
                c, ce, cg = class_bad[0]
                print(f"MISMATCH {name}: col {c} dtype class oracle={ce} "
                      f"spark={cg} — driver hash cannot match")
                n_bad += 1
                continue
            e, g = normalize(expected, strict), normalize(got, strict)
            if list(e.columns) != list(g.columns):
                print(f"MISMATCH {name}: columns {list(g.columns)} != {list(e.columns)}")
                n_bad += 1
            elif len(e) != len(g):
                print(f"MISMATCH {name}: rows {len(g)} != {len(e)}")
                n_bad += 1
            else:
                try:
                    if strict:
                        pd.testing.assert_frame_equal(e, g, check_dtype=False, check_exact=True)
                    else:
                        pd.testing.assert_frame_equal(e, g, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-9)
                    print(f"OK       {name} ({len(g)} rows)")
                    n_ok += 1
                    continue
                except AssertionError as ex:
                    print(f"MISMATCH {name}: {str(ex).splitlines()[-1] if str(ex) else ex}")
                    # show first differing cells
                    for c in e.columns:
                        neq = ~((e[c] == g[c]) | (e[c].isna() & g[c].isna()))
                        if neq.any():
                            i = neq.idxmax()
                            print(f"    col {c} row {i}: oracle={e[c][i]!r} spark={g[c][i]!r}")
                    n_bad += 1
        except Exception as ex:
            print(f"ERROR    {name}: {ex}")
            n_bad += 1
    mode = "strict" if strict else "tolerant"
    print(f"\n{n_ok} ok, {n_bad} bad ({mode})")
    return 1 if n_bad else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:]]
    strict = "--strict" in argv
    argv = [a for a in argv if a != "--strict"]
    sys.exit(main(argv[0], argv[1], strict=strict, names=set(argv[2:]) or None))
