"""Driver-style correctness gate rehearsal: every queries() entry that has
an oracle_sql() runs side-by-side with DuckDB at sf0.01 and must match on
row count, schema (sorted column names) and exact sorted values."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]

pytestmark = pytest.mark.usefixtures("ray_session")


def _to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(name, con):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    ours = _canon(_to_pandas(q(SF)))
    theirs = _canon(con.sql(sql).df())
    assert list(ours.columns) == list(theirs.columns), (list(ours.columns), list(theirs.columns))
    assert len(ours) == len(theirs), f"{name}: {len(ours)} vs {len(theirs)} rows"
    for col in ours.columns:
        a, b = ours[col].to_numpy(), theirs[col].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            # equal_nan: skip-invalid queries (real-codec image decode)
            # legitimately emit null rows on undecodable payloads
            assert np.array_equal(
                a.astype(np.float64), b.astype(np.float64), equal_nan=True
            ), f"{name}.{col} float mismatch"
        else:
            assert np.array_equal(a, b), f"{name}.{col} mismatch"


def test_rows_only_queries_run():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name, fn in qs.items():
        if name in oracles:
            continue
        res = _to_pandas(fn("/root/testdata/sf0.001"))
        assert len(res) >= 0
        assert len(res.columns) >= 1


def test_entry_smoke():
    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert "url" in df.columns and "tile_id" in df.columns
