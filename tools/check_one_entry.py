"""Ad-hoc: run ONE queries() entry vs its oracle with the driver-strict
comparison from tests/test_driver_contract.py. Usage:
    python tools/check_one_entry.py agg_extras [/root/testdata/sf0.01]
"""
import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as m  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def eq(a, b):
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    from bitcoin_ledger_2es_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    got = m.queries()[name](spark, sf_dir).toPandas()
    exp = con.sql(m.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), (sorted(got.columns), sorted(exp.columns))
    assert len(got) == len(exp), (len(got), len(exp))
    for c in sorted(got.columns):
        kg, ke = got[c].dtype.kind, exp[c].dtype.kind
        assert kg == ke or {kg, ke} <= {"i", "u"}, (c, got[c].dtype, exp[c].dtype)
    g, e = canon(got), canon(exp)
    bad = 0
    for c in g.columns:
        for i, (x, y) in enumerate(zip(g[c].tolist(), e[c].tolist())):
            if not eq(x, y):
                print(f"MISMATCH col {c} row {i}: {x!r} != {y!r}")
                bad += 1
                if bad > 10:
                    sys.exit(1)
    if bad:
        sys.exit(1)
    print(f"OK {name} @ {sf_dir}: {len(got)} rows, {len(got.columns)} cols identical")


if __name__ == "__main__":
    main()
