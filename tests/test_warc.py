"""WARC source: record scanning (Content-Length-delimited), HTTP
envelope unwrapping, malformed-record recovery, mandatory-header
fidelity (WARC-Record-ID / WARC-Date), mixed-delimiter headers, record
offsets, and the DataFrame writer/reader roundtrip."""

from __future__ import annotations

from parsel_spark.sources.warc import _scan_records


def _record(url: str, payload: bytes, wtype: str = "response") -> bytes:
    return (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {wtype}\r\n".encode()
        + f"WARC-Target-URI: {url}\r\n".encode()
        + f"Content-Length: {len(payload)}\r\n".encode()
        + b"\r\n" + payload + b"\r\n\r\n"
    )


def _drop_offsets(got):
    return [(url, html) for _, url, html in got]


def test_scan_content_length_delimited() -> None:
    """A payload containing WARC-looking text must NOT split the
    record — Content-Length drives the scanner."""
    evil = b"<p>WARC/1.0\r\nWARC-Type: response\r\n\r\nfake</p>"
    blob = _record("http://a.test/1", evil) + _record(
        "http://a.test/2", "café — página".encode()
    )
    got = list(_scan_records(blob))
    assert _drop_offsets(got) == [
        ("http://a.test/1", evil.decode()),
        ("http://a.test/2", "café — página"),
    ]


def test_record_offsets_address_records() -> None:
    """record_offset is the byte offset of each record's WARC/ version
    line — re-slicing the blob there re-parses exactly that record's
    tail (the re-fetch-address contract)."""
    r1 = _record("http://a.test/1", b"<p>one</p>")
    r2 = _record("http://a.test/2", b"<p>two</p>")
    blob = r1 + r2
    got = list(_scan_records(blob))
    assert [o for o, _, _ in got] == [0, len(r1)]
    # addressing: scanning from the second record's offset yields it
    assert _drop_offsets(_scan_records(blob[len(r1):])) == [
        ("http://a.test/2", "<p>two</p>")
    ]


def test_http_envelope_unwrapped() -> None:
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>x</html>"
    )
    blob = _record("http://a.test/h", payload)
    assert _drop_offsets(_scan_records(blob)) == [
        ("http://a.test/h", "<html>x</html>")
    ]


def test_non_response_and_malformed_skipped() -> None:
    meta = _record("http://a.test/meta", b"ignored", wtype="warcinfo")
    bad = b"NOT-A-WARC\r\nContent-Length: 3\r\n\r\nxyz\r\n\r\n"
    good = _record("http://a.test/ok", b"<p>ok</p>")
    got = _drop_offsets(_scan_records(meta + bad + good))
    assert got == [("http://a.test/ok", "<p>ok</p>")]


def test_interleaved_request_metadata_records_skipped_locally() -> None:
    """Common-Crawl WARCs interleave request/response/metadata records
    per capture; non-response types must be consumed (Content-Length)
    without desyncing the records after them — even when their payloads
    contain WARC-looking or blank-line-bearing bytes."""
    req = _record(
        "http://a.test/1",
        b"GET /1 HTTP/1.1\r\nHost: a.test\r\n\r\n",
        wtype="request",
    )
    resp1 = _record("http://a.test/1", b"<p>one</p>")
    meta = _record(
        "http://a.test/1", b"fetchTimeMs: 12\r\n\r\nvia: seed", wtype="metadata"
    )
    resp2 = _record("http://a.test/2", b"<p>two</p>")
    got = _drop_offsets(_scan_records(req + resp1 + meta + resp2))
    assert got == [
        ("http://a.test/1", "<p>one</p>"),
        ("http://a.test/2", "<p>two</p>"),
    ]


def test_lf_headers_with_crlf_in_payload() -> None:
    """An LF-delimited header block whose PAYLOAD contains a CRLF blank
    line: the header terminator must be the earlier LFLF, not the CRLF
    pair inside the payload (mixed-delimiter files parse
    record-locally)."""
    payload = b"<p>a</p>\r\n\r\n<p>b</p>"
    lf_rec = (
        b"WARC/1.0\n"
        b"WARC-Type: response\n"
        b"WARC-Target-URI: http://lf.test/1\n"
        + f"Content-Length: {len(payload)}\n".encode()
        + b"\n" + payload + b"\n\n"
    )
    tail = _record("http://lf.test/2", b"<p>tail</p>")
    got = _drop_offsets(_scan_records(lf_rec + tail))
    assert got == [
        ("http://lf.test/1", payload.decode()),
        ("http://lf.test/2", "<p>tail</p>"),
    ]


def test_emitted_records_carry_mandatory_headers(spark) -> None:
    """ISO 28500 mandates WARC-Record-ID and WARC-Date on every record;
    the sink must emit both — Record-ID as a deterministic urn:uuid of
    the target URI, Date as ISO-8601."""
    import re

    from parsel_spark.sources.warc import warc_record_col

    df = spark.createDataFrame(
        [("http://h.test/p", "<b>x</b>")], "url string, html string"
    )
    text = df.select(warc_record_col().alias("v")).first()["v"]
    header = text.split("\r\n\r\n", 1)[0]
    rid = re.search(r"WARC-Record-ID: <urn:uuid:([0-9a-f-]{36})>", header)
    assert rid, header
    assert re.search(
        r"WARC-Date: \d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z", header
    ), header
    # deterministic: same url → same id; different url → different id
    df2 = spark.createDataFrame(
        [("http://h.test/p", "<i>other</i>"), ("http://h.test/q", "<b>x</b>")],
        "url string, html string",
    )
    ids = [
        re.search(r"WARC-Record-ID: (<urn:uuid:[0-9a-f-]{36}>)", r["v"]).group(1)
        for r in df2.select(warc_record_col().alias("v")).collect()
    ]
    assert ids[0] == f"<urn:uuid:{rid.group(1)}>"
    assert ids[1] != ids[0]


def test_dataframe_roundtrip(spark, tmp_path) -> None:
    """(url, html) → warc_record_col → .text files → read_warc recovers
    every row exactly (unicode payloads included), with the richer
    mandatory headers present."""
    from parsel_spark.sources.warc import read_warc, warc_record_col

    rows = [
        (f"http://h{i % 3}.test/p/{i}", f"<html><b>pg {i} café</b></html>")
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = str(tmp_path / "warc")
    df.select(warc_record_col().alias("value")).write.text(out)
    back = {
        (r["url"], r["html"]) for r in read_warc(spark, out).collect()
    }
    assert back == set(rows)


def test_gzip_multi_member_scan(tmp_path) -> None:
    """Common-Crawl-style .warc.gz: one gzip member PER RECORD — the
    scanner must read past the first member; offsets address the
    DECOMPRESSED stream."""
    import gzip

    r1 = _record("http://a.test/1", b"<p>one</p>")
    r2 = _record("http://a.test/2", b"<p>two</p>")
    blob = gzip.compress(r1) + gzip.compress(r2)
    got = list(_scan_records(blob))
    assert _drop_offsets(got) == [
        ("http://a.test/1", "<p>one</p>"),
        ("http://a.test/2", "<p>two</p>"),
    ]
    assert [o for o, _, _ in got] == [0, len(r1)]


def test_write_warc_sink_roundtrip(spark, tmp_path) -> None:
    from parsel_spark.sources.warc import read_warc, write_warc

    rows = [(f"http://s.test/{i}", f"<i>{i}</i>") for i in range(10)]
    df = spark.createDataFrame(rows, "url string, html string")
    out = str(tmp_path / "sink")
    write_warc(df, out)
    back = {(r["url"], r["html"]) for r in read_warc(spark, out).collect()}
    assert back == set(rows)


def test_cdx_index_digest_and_address(spark, tmp_path) -> None:
    """cdx_index rows: urlkey is the SURT of the record URL, digest is
    md5 of the exact payload octets, and (warc_file, record_offset)
    addresses a WARC/ record header whose Target-URI is that URL."""
    import hashlib

    from pyspark.sql import functions as F

    from parsel_spark.sources.warc import cdx_index, read_warc, warc_record_col

    rows = [
        ("http://www.Ex.test/A/1", "<html><body>one</body></html>"),
        ("http://ex.test/b?Q=2", "<html><body>two</body></html>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    warc_dir = str(tmp_path / "warc")
    pages.coalesce(1).select(warc_record_col().alias("value")).write.text(
        warc_dir
    )
    out = {r["url"]: r for r in cdx_index(read_warc(spark, warc_dir)).collect()}
    assert out["http://www.Ex.test/A/1"]["urlkey"] == "test,ex)/a/1"
    assert out["http://ex.test/b?Q=2"]["urlkey"] == "test,ex)/b?q=2"
    for url, html in rows:
        r = out[url]
        assert r["digest"] == hashlib.md5(html.encode()).hexdigest()
        assert r["length"] == len(html.encode())
        with open(r["warc_file"].replace("file:", ""), "rb") as fh:
            fh.seek(r["record_offset"])
            chunk = fh.read(400)
        assert chunk.startswith(b"WARC/")
        assert f"WARC-Target-URI: {url}".encode() in chunk


def test_revisit_dedup_synthetic_cdx(spark) -> None:
    """Digest-sharing captures: first (file,offset) is the response,
    later ones become revisit records pointing at it; stored_length
    sums to the deduped archive size."""
    from parsel_spark.sources.warc import revisit_dedup

    cdx = spark.createDataFrame(
        [
            ("k1", "http://a/1", "d1", 100, "part-0", 0),
            ("k2", "http://a/2", "d1", 100, "part-0", 500),
            ("k3", "http://b/3", "d1", 100, "part-1", 0),
            ("k4", "http://b/4", "d2", 70, "part-1", 900),
        ],
        "urlkey string, url string, digest string, length long, "
        "warc_file string, record_offset long",
    )
    rows = {r["urlkey"]: r for r in revisit_dedup(cdx).collect()}
    assert rows["k1"]["record_type"] == "response"
    assert rows["k1"]["refers_to_file"] is None
    assert rows["k1"]["stored_length"] == 100
    for k in ("k2", "k3"):
        assert rows[k]["record_type"] == "revisit"
        assert rows[k]["refers_to_file"] == "part-0"
        assert rows[k]["refers_to_offset"] == 0
        assert rows[k]["stored_length"] == 0
    assert rows["k4"]["record_type"] == "response"
    assert sum(r["stored_length"] for r in rows.values()) == 170


def test_revisit_dedup_over_real_warc_files(spark, tmp_path) -> None:
    """Composition: write pages (3 sharing a payload) -> scan -> CDX ->
    revisit dedup; the original's re-fetch address must seek to a real
    response record."""
    import glob
    import os as _os

    from parsel_spark.sources.warc import (
        cdx_index,
        read_warc,
        revisit_dedup,
        warc_record_col,
    )

    pages = spark.createDataFrame(
        [(f"http://h.test/p/{i}",
          "<html>same</html>" if i % 2 == 0 else f"<html>{i}</html>")
         for i in range(6)],
        "url string, html string",
    )
    out = str(tmp_path / "warc")
    pages.select(warc_record_col().alias("value")).coalesce(1).write.text(out)
    deduped = revisit_dedup(cdx_index(read_warc(spark, out))).collect()
    by_type = {}
    for r in deduped:
        by_type.setdefault(r["record_type"], []).append(r)
    assert len(by_type["revisit"]) == 2          # 3 identical payloads
    assert len(by_type["response"]) == 4
    orig = {(r["warc_file"], r["record_offset"]) for r in by_type["response"]}
    for r in by_type["revisit"]:
        assert (r["refers_to_file"], r["refers_to_offset"]) in orig
        path = [p for p in glob.glob(_os.path.join(out, "*"))
                if p.endswith(r["refers_to_file"].split("/")[-1])]
        with open(path[0], "rb") as fh:
            fh.seek(r["refers_to_offset"])
            assert fh.read(5) == b"WARC/"
