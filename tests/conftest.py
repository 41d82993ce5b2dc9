import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SGS_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from sketches_go_spark.plans.session import get_spark

    s = get_spark(cores=4, shuffle_partitions=8, app_name="sgs-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()


def compare_spark_duckdb(spark_df, duck_con, sql: str):
    """Replicates the driver's comparison: column names (sorted), row count,
    and exact values after sorting rows by all columns."""
    import pandas as pd

    left = spark_df.toPandas()
    right = duck_con.execute(sql).fetchdf()
    assert sorted(left.columns) == sorted(right.columns), (
        f"schema mismatch: {sorted(left.columns)} vs {sorted(right.columns)}"
    )
    cols = sorted(left.columns)
    left = left[cols]
    right = right[cols]
    assert len(left) == len(right), f"row count {len(left)} != {len(right)}"
    lk = left.sort_values(cols, kind="mergesort").reset_index(drop=True)
    rk = right.sort_values(cols, kind="mergesort").reset_index(drop=True)
    for c in cols:
        lval, rval = lk[c], rk[c]
        if str(lval.dtype).startswith("datetime") or str(rval.dtype).startswith(
            "datetime"
        ):
            lval = pd.to_datetime(lval).astype("int64")
            rval = pd.to_datetime(rval).astype("int64")
        mism = ~(
            (lval == rval) | (lval.isna() & rval.isna())
        )
        assert not mism.any(), (
            f"value mismatch in column {c}:\n"
            f"{pd.concat([lk[mism], rk[mism]], axis=1).head(10)}"
        )
    return len(left)
