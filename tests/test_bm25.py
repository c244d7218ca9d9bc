"""BM25 retrieval (text/bm25.py): stats pass, vectorized scoring, mergeable
top-k, and rank parity with a DuckDB replica at sf0.001."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray

from incubator_sedona_ray.text.bm25 import _term_tf_matrix, _tokenize, bm25_topk, corpus_stats

SF_DIR = "/root/testdata/sf0.001"
TERMS = ["table", "sort", "hash"]


def test_tokenize_drops_empties():
    flat, parent = _tokenize(pa.array(["  a  b ", "", "c"]))
    assert flat.to_pylist() == ["a", "b", "c"]
    assert parent.tolist() == [0, 0, 2]


def test_tf_matrix():
    flat, parent = _tokenize(pa.array(["a b a", "b", "c c c"]))
    tf = _term_tf_matrix(flat, parent, 3, ["a", "c"])
    assert tf.tolist() == [[2, 0], [0, 0], [0, 3]]


def test_corpus_stats(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "text": ["a b", "a a a", "c"]})
    )
    st = corpus_stats(ds, ["a", "c"])
    assert st["n"] == 3 and st["dl_sum"] == 6
    assert st["df"] == {"a": 2, "c": 1}
    assert st["avgdl"] == 2.0


def test_bm25_rank_parity_with_duckdb(ray_session):
    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    out = (
        bm25_topk(ds, TERMS, 15)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    k1, b = 1.2, 0.75
    tf_cols = ", ".join(f"len(list_filter(ws, x -> x = '{t}')) AS tf{j}" for j, t in enumerate(TERMS))
    df_cols = ", ".join(f"count_if(tf{j} > 0) AS df{j}" for j in range(len(TERMS)))
    score = " + ".join(
        f"ln(1 + (n - df{j} + 0.5)/(df{j} + 0.5)) * (tf{j}*({k1}+1))/(tf{j} + {k1}*(1-{b}+{b}*dl/avgdl))"
        for j in range(len(TERMS))
    )
    sql = (
        "WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws FROM documents), "
        "d AS (SELECT doc_id, ws, len(ws) AS dl FROM w), "
        "stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl FROM d), "
        f"tf AS (SELECT doc_id, dl, {tf_cols} FROM d), "
        f"dfs AS (SELECT {df_cols} FROM tf), "
        f"sc AS (SELECT doc_id, {score} AS score FROM tf, stats, dfs) "
        "SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rank "
        "FROM sc WHERE score > 0 QUALIFY rank <= 15"
    )
    odf = con.execute(sql).df().sort_values("rank").reset_index(drop=True)
    assert len(out) == len(odf) > 0
    assert (out["doc_id"].to_numpy() == odf["doc_id"].to_numpy()).all()
    # scores agree to float64 noise (ln implementations differ in last ulp)
    np.testing.assert_allclose(out["score"].to_numpy(), odf["score"].to_numpy(), rtol=1e-12)


def test_bm25_k_larger_than_matches(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "text": ["table sort", "nothing here", "plain"]})
    )
    out = bm25_topk(ds, TERMS, 10).to_pandas()
    assert len(out) == 1 and out["doc_id"].iloc[0] == 1 and out["rank"].iloc[0] == 1


def test_bm25_precomputed_stats(ray_session):
    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    st = corpus_stats(ds, TERMS)
    a = bm25_topk(ds, TERMS, 5, stats=st).to_pandas().sort_values("rank")
    b = bm25_topk(ds, TERMS, 5).to_pandas().sort_values("rank")
    assert (a["doc_id"].to_numpy() == b["doc_id"].to_numpy()).all()
