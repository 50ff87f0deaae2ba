"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 in Spark and the
matching oracle_sql() in DuckDB over the same parquet files; compares
row count, column names (sorted), and values (rows sorted by all
columns, exact string compare after normalization).

Usage: python scripts/check_oracle.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entry_mod
from dataquality_box_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda v: ",".join(map(str, v)) if isinstance(v, (list, np.ndarray)) else v
            )
        if str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
        if pdf[c].dtype == np.float32:
            pdf[c] = pdf[c].astype(np.float64)
        if str(pdf[c].dtype) in ("int32", "int8", "int16", "uint64", "Int64"):
            pdf[c] = pdf[c].astype("int64")
        if str(pdf[c].dtype) == "bool":
            pdf[c] = pdf[c].astype("int64")
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(exp):
        problems.append(f"row count {len(got)} vs oracle {len(exp)}")
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        problems.append(f"columns {gcols} vs {ecols}")
        return problems
    g, e = normalize(got), normalize(exp)
    if len(g) == len(e):
        for c in g.columns:
            gv, ev = g[c], e[c]
            if gv.dtype == np.float64 or ev.dtype == np.float64:
                gn = gv.astype(np.float64).fillna(np.nan).to_numpy()
                en = ev.astype(np.float64).fillna(np.nan).to_numpy()
                both_nan = np.isnan(gn) & np.isnan(en)
                exact = (gn == en) | both_nan
                if not exact.all():
                    close = np.isclose(gn, en, rtol=1e-9, atol=1e-9) | both_nan
                    bad = int((~exact).sum())
                    tag = "FLOAT-INEXACT(hash risk)" if close.all() else "VALUE MISMATCH"
                    idx = int(np.nonzero(~exact)[0][0])
                    problems.append(
                        f"{tag} col={c} n={bad} first@{idx}: {gn[idx]!r} vs {en[idx]!r}"
                    )
            else:
                ga = gv.fillna("\0").astype(str).to_numpy()
                ea = ev.fillna("\0").astype(str).to_numpy()
                neq = ga != ea
                if neq.any():
                    idx = int(np.nonzero(neq)[0][0])
                    problems.append(
                        f"VALUE MISMATCH col={c} n={int(neq.sum())} first@{idx}: "
                        f"{ga[idx]!r} vs {ea[idx]!r}"
                    )
    return problems


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark("check-oracle", parallelism=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(got)} (no oracle)")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {ex}")
            failures += 1
            continue
        problems = compare(name, got, exp)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name}: rows={len(got)}")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
