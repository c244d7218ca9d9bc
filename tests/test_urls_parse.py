"""URL parsing + domain stats (text/urls.py parse_urls/domain_stats)."""

import numpy as np
import pyarrow as pa
import ray

from incubator_sedona_ray.text.urls import domain_stats, parse_urls, parse_urls_batch


def _parse(urls):
    return parse_urls_batch(pa.table({"url": urls})).to_pandas()


def test_basic_fields():
    df = _parse(["https://www.example.com/a/b?q=1"])
    r = df.iloc[0]
    assert r["scheme"] == "https"
    assert r["host"] == "www.example.com"
    assert r["domain"] == "example.com"
    assert r["path_depth"] == 2


def test_public_suffix_lite():
    df = _parse(
        [
            "https://www.example.co.uk/x",
            "https://a.b.shop.com.au/y",
            "https://plain.org/z",
            "https://deep.sub.example.net/w",
        ]
    )
    assert df["domain"].tolist() == ["example.co.uk", "shop.com.au", "plain.org", "example.net"]


def test_case_insensitive_host():
    df = _parse(["HTTPS://WWW.Example.COM/Path"])
    assert df.iloc[0]["host"] == "www.example.com"
    assert df.iloc[0]["scheme"] == "https"


def test_no_url_yields_null_host():
    df = _parse(["not a url at all"])
    assert df.iloc[0]["host"] is None and df.iloc[0]["domain"] is None


def test_single_label_host_falls_back_to_host():
    df = _parse(["https://localhost/x/y/z/"])
    assert df.iloc[0]["domain"] == "localhost"
    assert df.iloc[0]["path_depth"] == 3


def test_query_and_fragment_excluded_from_depth():
    df = _parse(["https://e.com/a?x=/1/2/3", "https://e.com/a#/b/c"])
    assert df["path_depth"].tolist() == [1, 1]


def test_domain_stats(ray_session):
    urls = (
        ["https://a.com/1"] * 3
        + ["https://www.a.com/2"] * 2  # same registrable domain
        + ["https://b.co.uk/x"]
    )
    t = pa.table({"url": urls, "n_chars": pa.array([10, 20, 30, 5, 5, 100], type=pa.int64())})
    out = domain_stats(ray.data.from_arrow(t)).to_pandas().set_index("domain")
    assert out.loc["a.com", "n_docs"] == 5
    assert out.loc["a.com", "sum_chars"] == 70
    assert out.loc["a.com", "mean_chars"] == 14.0
    assert out.loc["b.co.uk", "n_docs"] == 1


def test_parse_urls_dataset(ray_session):
    t = pa.table({"url": ["https://x.de/a", "https://y.net/b/c"]})
    out = parse_urls(ray.data.from_arrow(t)).to_pandas()
    assert out["domain"].tolist() == ["x.de", "y.net"]
    assert out["path_depth"].tolist() == [1, 2]
