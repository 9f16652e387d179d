"""WARC source: record scanning (Content-Length-delimited), HTTP
envelope unwrapping, malformed-record recovery, and the DataFrame
writer/reader roundtrip."""

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


def test_scan_content_length_delimited() -> None:
    """A payload containing WARC-looking text must NOT split the
    record — Content-Length drives the scanner."""
    evil = b"<p>WARC/1.0\r\nWARC-Type: response\r\n\r\nfake</p>"
    blob = _record("http://a.test/1", evil) + _record(
        "http://a.test/2", "café — página".encode()
    )
    got = list(_scan_records(blob))
    assert got == [
        ("http://a.test/1", evil.decode()),
        ("http://a.test/2", "café — página"),
    ]


def test_http_envelope_unwrapped() -> None:
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>x</html>"
    )
    blob = _record("http://a.test/h", payload)
    assert list(_scan_records(blob)) == [("http://a.test/h", "<html>x</html>")]


def test_non_response_and_malformed_skipped() -> None:
    meta = _record("http://a.test/meta", b"ignored", wtype="warcinfo")
    bad = b"NOT-A-WARC\r\nContent-Length: 3\r\n\r\nxyz\r\n\r\n"
    good = _record("http://a.test/ok", b"<p>ok</p>")
    got = list(_scan_records(meta + bad + good))
    assert got == [("http://a.test/ok", "<p>ok</p>")]


def test_dataframe_roundtrip(spark, tmp_path) -> None:
    """(url, html) → warc_record_col → .text files → read_warc recovers
    every row exactly (unicode payloads included)."""
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
    scanner must read past the first member."""
    import gzip

    r1 = _record("http://a.test/1", b"<p>one</p>")
    r2 = _record("http://a.test/2", b"<p>two</p>")
    blob = gzip.compress(r1) + gzip.compress(r2)
    got = list(_scan_records(blob))
    assert got == [
        ("http://a.test/1", "<p>one</p>"),
        ("http://a.test/2", "<p>two</p>"),
    ]


def test_write_warc_sink_roundtrip(spark, tmp_path) -> None:
    from parsel_spark.sources.warc import read_warc, write_warc

    rows = [(f"http://s.test/{i}", f"<i>{i}</i>") for i in range(10)]
    df = spark.createDataFrame(rows, "url string, html string")
    out = str(tmp_path / "sink")
    write_warc(df, out)
    back = {(r["url"], r["html"]) for r in read_warc(spark, out).collect()}
    assert back == set(rows)
