"""WARC (Web ARChive, ISO 28500) source/sink — the container format every
web crawl actually ships in (Common Crawl's WARC/WET/WAT files). Pure
stdlib: records are length-delimited by their ``Content-Length`` header,
so parsing is a sequential header-scan + payload skip per record; ``.gz``
files are multi-member gzip streams handled by :mod:`gzip`.

Record grammar written and read here (WARC/1.0):

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Target-URI: <url>\\r\\n
    WARC-Date: <ISO-8601 Z>\\r\\n
    WARC-Record-ID: <urn:uuid:...>\\r\\n
    Content-Type: <payload type>\\r\\n
    Content-Length: <payload byte count>\\r\\n
    \\r\\n
    <payload>\\r\\n\\r\\n

Distributed shape: the READ is ``ray.data.read_binary_files`` (one block
per file, the natural WARC unit — crawls are shipped as ~1 GB files) into
a stateless ``map_batches`` record parser, so 100 TB of WARC streams
file-parallel with zero shuffles. The WRITE is one file per input block
(resumable: a ``_SUCCESS`` manifest marks a finished directory). The
per-record Python loop in the parser walks RECORDS (droplet-sized header
blocks), not bytes — payload bytes move as single memoryview slices.

Reference scope note: Sedona has no WARC reader; this source comes from
the north rule's Common-Crawl input shape (the reference's analogous
component is the format-mapper family, ``core/formatMapper/*.java``).
"""

from __future__ import annotations

import gzip
import os
import uuid

import pyarrow as pa

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


def encode_records(
    urls, dates, payloads, *, content_type: str = "text/html", warc_type: str = "response"
) -> bytes:
    """Serialize aligned (url, iso-date, payload-bytes) triples to one
    WARC/1.0 byte stream. Record IDs are deterministic (uuid5 of url+date)
    so output is byte-stable across retries."""
    out = bytearray()
    for u, d, p in zip(urls, dates, payloads):
        rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{u}|{d}")
        hdr = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: " + warc_type.encode() + _CRLF
            + b"WARC-Target-URI: " + u.encode() + _CRLF
            + b"WARC-Date: " + d.encode() + _CRLF
            + b"WARC-Record-ID: <urn:uuid:" + str(rid).encode() + b">" + _CRLF
            + b"Content-Type: " + content_type.encode() + _CRLF
            + b"Content-Length: " + str(len(p)).encode() + _CRLF
            + _CRLF
        )
        out += hdr
        out += p
        out += _CRLF + _CRLF
    return bytes(out)


def parse_records(buf: bytes):
    """Yield dicts (url, warc_type, warc_date, content_type, payload) from
    one WARC byte stream. Raises ValueError on a malformed record (bad
    magic, missing Content-Length, truncated payload)."""
    pos, n = 0, len(buf)
    view = memoryview(buf)
    while pos < n:
        # tolerate trailing record separators / padding newlines
        while pos < n and buf[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not buf.startswith(b"WARC/", pos):
            raise ValueError(f"bad WARC magic at byte {pos}")
        hdr_end = buf.find(_HDR_END, pos)
        if hdr_end < 0:
            raise ValueError(f"unterminated WARC header at byte {pos}")
        headers = {}
        for line in bytes(view[pos:hdr_end]).split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers[b"content-length"])
        except KeyError:
            raise ValueError(f"record at byte {pos} lacks Content-Length") from None
        body_start = hdr_end + len(_HDR_END)
        if body_start + clen > n:
            raise ValueError(f"truncated payload at byte {body_start}")
        yield {
            "url": headers.get(b"warc-target-uri", b"").decode(),
            "warc_type": headers.get(b"warc-type", b"").decode(),
            "warc_date": headers.get(b"warc-date", b"").decode(),
            "content_type": headers.get(b"content-type", b"").decode(),
            "payload": bytes(view[body_start : body_start + clen]),
        }
        pos = body_start + clen


def _parse_batch(batch: pa.Table) -> pa.Table:
    urls, types, dates, ctypes, payloads = [], [], [], [], []
    for raw in batch["bytes"].to_pylist():
        # sniff the gzip magic instead of trusting the extension —
        # ray.data.read_binary_files already auto-decompresses *.gz
        if raw[:2] == b"\x1f\x8b":
            raw = gzip.decompress(raw)  # multi-member streams supported
        for rec in parse_records(raw):
            urls.append(rec["url"])
            types.append(rec["warc_type"])
            dates.append(rec["warc_date"])
            ctypes.append(rec["content_type"])
            payloads.append(rec["payload"])
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_type": pa.array(types, type=pa.string()),
            "warc_date": pa.array(dates, type=pa.string()),
            "content_type": pa.array(ctypes, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


def read_warc(paths, *, record_types: tuple = ("response",)):
    """Dataset(url, warc_type, warc_date, content_type, payload:binary)
    from WARC / WARC-gz files — file-parallel, no shuffle. ``record_types``
    filters (e.g. drop warcinfo/request records); pass None for all."""
    import ray
    import pyarrow.compute as pc

    ds = ray.data.read_binary_files(paths, include_paths=True)
    out = ds.map_batches(_parse_batch, batch_format="pyarrow")
    if record_types is not None:
        want = list(record_types)
        out = out.map_batches(
            lambda t: t.filter(pc.is_in(t["warc_type"], value_set=pa.array(want))),
            batch_format="pyarrow",
        )
    return out


def write_warc(
    ds,
    path: str,
    *,
    url_col: str = "url",
    date_col: str = "warc_date",
    payload_col: str = "payload",
    content_type: str = "text/html",
    compress: bool = False,
    overwrite: bool = False,
):
    """Write one ``.warc``/``.warc.gz`` file per input block under ``path``
    (distributed, resumable: finishing stamps a ``_SUCCESS`` marker
    recording the row count; a directory already carrying one is left
    untouched and the write short-circuits, returning the RECORDED count —
    so a resumed call is distinguishable from an empty write and a stale
    directory cannot silently swallow new data. Pass ``overwrite=True`` to
    discard the marker and rewrite). File names are content-hashed so
    retries of the same block are idempotent."""
    import hashlib

    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        if not overwrite:
            with open(done) as fh:
                txt = fh.read().strip()
            return int(txt) if txt.isdigit() else 0
        os.remove(done)
    os.makedirs(path, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"file": pa.array([], type=pa.string()), "rows": pa.array([], type=pa.int64())})
        urls = batch[url_col].to_pylist()
        dates = batch[date_col].to_pylist()
        payloads = batch[payload_col].to_pylist()
        blob = encode_records(urls, dates, payloads, content_type=content_type)
        if compress:
            blob = gzip.compress(blob, mtime=0)  # mtime=0: byte-stable
        name = hashlib.sha256(blob).hexdigest()[:20] + ext
        tmp = os.path.join(path, "." + name + ".tmp")
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, os.path.join(path, name))
        return pa.table({"file": pa.array([name]), "rows": pa.array([batch.num_rows], type=pa.int64())})

    summaries = ds.map_batches(write_block, batch_format="pyarrow").to_pandas()
    total = int(summaries["rows"].sum()) if len(summaries) else 0
    with open(done, "w") as fh:
        fh.write(str(total))
    return total
