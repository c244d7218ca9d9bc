"""Tests for the WARC source/sink (sources/warc.py): record grammar
round-trip, gzip sniffing, malformed-input errors, and the resumable
distributed write."""

import gzip
import os

import pyarrow as pa
import pytest
import ray

from incubator_sedona_ray.sources.warc import (
    encode_records,
    parse_records,
    read_warc,
    write_warc,
)

RECS = [
    ("https://a.com/1", "2024-01-01T00:00:00Z", b"<p>hello</p>"),
    ("https://b.org/2", "2024-01-02T12:30:00Z", "päge ☃".encode("utf-8")),
    ("https://c.net/3", "2024-01-03T23:59:59Z", b""),  # empty payload
]


def test_encode_parse_roundtrip():
    blob = encode_records(*zip(*RECS))
    out = list(parse_records(blob))
    assert [(r["url"], r["warc_date"], r["payload"]) for r in out] == RECS
    assert all(r["warc_type"] == "response" for r in out)
    assert all(r["content_type"] == "text/html" for r in out)


def test_encode_is_byte_stable():
    assert encode_records(*zip(*RECS)) == encode_records(*zip(*RECS))


def test_parse_rejects_malformed():
    with pytest.raises(ValueError, match="bad WARC magic"):
        list(parse_records(b"HTTP/1.1 200 OK\r\n\r\n"))
    one = encode_records(*zip(*RECS[:1]))
    with pytest.raises(ValueError, match="truncated payload"):
        list(parse_records(one[:-10]))  # cuts into the 12-byte payload
    with pytest.raises(ValueError, match="unterminated WARC header"):
        list(parse_records(one[:20]))
    no_len = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_records(no_len))


def test_payload_containing_record_separator():
    # a payload that CONTAINS \r\n\r\nWARC/1.0 must not split the stream
    evil = b"x\r\n\r\nWARC/1.0\r\nContent-Length: 9999\r\n\r\ny"
    blob = encode_records(["https://e.io"], ["2024-01-01T00:00:00Z"], [evil])
    out = list(parse_records(blob))
    assert len(out) == 1 and out[0]["payload"] == evil


def _write_read(tmp_path, compress, ray_count=2):
    t = pa.table(
        {
            "url": [r[0] for r in RECS],
            "warc_date": [r[1] for r in RECS],
            "payload": pa.array([r[2] for r in RECS], type=pa.binary()),
        }
    )
    path = str(tmp_path / ("gz" if compress else "plain"))
    n = write_warc(ray.data.from_arrow(t).repartition(ray_count), path, compress=compress)
    assert n == len(RECS)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.startswith(".") is False and f != "_SUCCESS"
    )
    out = read_warc(files).to_pandas().sort_values("url").reset_index(drop=True)
    return path, out


def test_write_read_distributed(ray_session, tmp_path):
    for compress in (False, True):
        path, out = _write_read(tmp_path, compress)
        assert out["url"].tolist() == [r[0] for r in RECS]
        assert out["payload"].tolist() == [r[2] for r in RECS]
        assert out["warc_date"].tolist() == [r[1] for r in RECS]
        # resume: a second write short-circuits and reports the RECORDED
        # count (distinguishable from an empty write)
        t = pa.table({"url": ["x"], "warc_date": ["d"], "payload": pa.array([b"y"], type=pa.binary())})
        assert write_warc(ray.data.from_arrow(t), path) == len(RECS)
        # overwrite discards the stale marker and writes the new data
        n2 = write_warc(ray.data.from_arrow(t), path, overwrite=True)
        assert n2 == 1


def test_gzip_file_bytes_are_gzip(ray_session, tmp_path):
    path, _ = _write_read(tmp_path / "g2", compress=True)
    f = [x for x in os.listdir(path) if x.endswith(".warc.gz")][0]
    with open(os.path.join(path, f), "rb") as fh:
        raw = fh.read()
    assert raw[:2] == b"\x1f\x8b"
    assert b"WARC/1.0" in gzip.decompress(raw)


def test_record_type_filter(ray_session, tmp_path):
    blob = encode_records(
        ["https://a.com"], ["2024-01-01T00:00:00Z"], [b"meta"], warc_type="warcinfo"
    ) + encode_records(["https://b.com"], ["2024-01-01T00:00:01Z"], [b"page"])
    p = tmp_path / "mixed.warc"
    p.write_bytes(blob)
    out = read_warc([str(p)]).to_pandas()
    assert out["url"].tolist() == ["https://b.com"]
    both = read_warc([str(p)], record_types=None).to_pandas()
    assert len(both) == 2
