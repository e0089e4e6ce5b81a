"""Probe a subset of contract queries against the DuckDB oracle.

Usage: python tools/probe.py q1 q2 ... [--sf /root/testdata/sf0.01]
Same compare as tools/check_contract.py, but only the named queries.
"""
import hashlib
import os
import sys
import time

import duckdb
import pandas as pd
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"
names = []
args = sys.argv[1:]
i = 0
while i < len(args):
    if args[i] == "--sf":
        SF = args[i + 1]
        i += 2
    else:
        names.append(args[i])
        i += 1

os.environ["GRAFT_VERIFY_SF"] = SF
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
import __ray_entry__ as entry_mod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_df(res):
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return pd.DataFrame(res)


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    return hashlib.sha256(str(rows).encode()).hexdigest()[:16]


con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs = entry_mod.queries()
oracles = entry_mod.oracle_sql()
fails = []
for name in names:
    t0 = time.time()
    try:
        rdf = to_df(qs[name](SF))
    except Exception as e:
        import traceback

        traceback.print_exc()
        fails.append((name, f"RAY ERROR {e}"))
        continue
    dt = time.time() - t0
    if name in oracles:
        odf = con.execute(oracles[name]).df()
        rn, on = len(rdf), len(odf)
        rc, oc = sorted(rdf.columns), sorted(odf.columns)
        rh, oh = value_hash(rdf), value_hash(odf)
        ok = rn == on and rc == oc and rh == oh
        print(
            f"{name}: {'OK' if ok else 'MISMATCH'} rows={rn}/{on} "
            f"cols_eq={rc == oc} hash_eq={rh == oh} ({dt:.1f}s)"
        )
        if not ok:
            fails.append((name, "mismatch"))
            if rc == oc and rn == on:
                m = (
                    rdf[sorted(rdf.columns)]
                    .round(6)
                    .sort_values(sorted(rdf.columns))
                    .reset_index(drop=True)
                )
                o = (
                    odf[sorted(odf.columns)]
                    .round(6)
                    .sort_values(sorted(odf.columns))
                    .reset_index(drop=True)
                )
                diff = (m != o) & ~(m.isna() & o.isna())
                bad = diff.any(axis=1)
                print("ray:", m[bad].head(3).to_dict("records"))
                print("sql:", o[bad].head(3).to_dict("records"))
            elif rc != oc:
                print("ray cols:", rc)
                print("sql cols:", oc)
    else:
        print(f"{name}: rows-only {len(rdf)} rows ({dt:.1f}s)")

print("FAILS:", fails if fails else "none")
ray.shutdown()
sys.exit(1 if fails else 0)
