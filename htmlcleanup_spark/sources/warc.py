"""WARC ingestion: Common-Crawl archive files -> the pages table.

The reference consumes a saved .html file per run (cleanup_msfp.py:35-44);
at corpus scale the upstream is WARC (ISO 28500), so this source turns a
directory of ``.warc`` files into the north-rule pages shape
(url, warc_ts, html, text=NULL, lang=NULL).

Scale design: ``spark.read.format("binaryFile")`` gives one row per file
(content as bytes); parsing fans out per file via mapInPandas, so a
thousand-executor cluster ingests a thousand WARCs concurrently —
parallelism is file-count, which is how Common Crawl ships (1 GB segment
files).  The parser is a self-contained implementation of the public
WARC/1.0 record grammar (version line, CRLF-separated headers, blank line,
Content-Length octets, CRLF CRLF separator); only ``response`` records are
emitted, with the HTTP envelope stripped.  Gzip members (.warc.gz is a
concatenation of per-record gzip members) are handled by decompressing the
whole stream first — correct for multi-member files because zlib is run
member-by-member.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_CRLF = b"\r\n"


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Yield {url, warc_ts, html} per WARC *response* record in ``data``.

    Pure function over bytes (unit-testable without Spark).  Malformed
    trailing garbage ends the scan rather than raising: a truncated tail
    record in a crawl segment should not poison the whole file.
    """
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            break  # trailing garbage / truncated record
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end == -1:
            break
        headers = {}
        lines = data[pos:hdr_end].split(_CRLF)
        for line in lines[1:]:  # lines[0] is the WARC/1.x version line
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            break
        block_start = hdr_end + 4
        if block_start + length > n:
            break  # truncated final record
        block = data[block_start : block_start + length]
        pos = block_start + length
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts = headers.get(b"warc-date", b"").decode("ascii", "replace")
        # strip the HTTP response envelope if present
        if block[:5] in (b"HTTP/",):
            http_end = block.find(_CRLF + _CRLF)
            html = block[http_end + 4 :] if http_end != -1 else b""
        else:
            html = block
        yield {"url": url, "warc_ts": ts, "html": html}


def _maybe_gunzip(content: bytes) -> bytes:
    if content[:2] != b"\x1f\x8b":
        return content
    out = io.BytesIO()
    stream = io.BytesIO(content)
    # .warc.gz = concatenated gzip members (one per record); GzipFile
    # iterates members transparently
    with gzip.GzipFile(fileobj=stream) as gz:
        out.write(gz.read())
    return out.getvalue()


def read_warc(spark: SparkSession, path: str,
              path_glob: str = "*.warc*") -> DataFrame:
    """Read a directory of .warc / .warc.gz files as the pages table."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", path_glob)
        .load(path)
        .select("content")
    )

    def parse(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_warc_records(_maybe_gunzip(bytes(content))):
                    rows.append(
                        (rec["url"], rec["warc_ts"], rec["html"], None, None)
                    )
            yield pd.DataFrame(
                rows, columns=["url", "_ts", "html", "text", "lang"]
            )

    raw = files.mapInPandas(
        parse, "url string, _ts string, html binary, text string, lang string"
    )
    from pyspark.sql import functions as F

    # WARC-Date is ISO-8601 Zulu (e.g. 2024-01-01T00:00:00Z)
    return raw.select(
        "url",
        F.to_timestamp("_ts").alias("warc_ts"),
        "html",
        "text",
        "lang",
    )


def write_synth_warc(path: str, n_docs: int, seed: int = 42,
                     compress: bool = False) -> None:
    """Deterministic tiny WARC file for tests (synth pages re-packaged)."""
    from .pages import make_html

    chunks = []
    for i in range(n_docs):
        html = make_html(i, seed)
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        )
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + b"WARC-Target-URI: https://host%d.example/p/%d\r\n"
            % (i % 1000, i)
            + b"WARC-Date: 2024-01-01T00:00:%02dZ\r\n" % (i % 60)
            + b"Content-Length: %d\r\n" % len(http)
        )
        chunks.append(hdr + b"\r\n" + http + b"\r\n\r\n")
    # one warcinfo record up front (skipped by the parser)
    info = b"software: synth\r\n"
    head = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"Content-Length: %d\r\n\r\n" % len(info) + info + b"\r\n\r\n"
    )
    data = head + b"".join(chunks)
    if compress:
        buf = io.BytesIO()
        # per-record gzip members, as Common Crawl ships them
        for part in [head] + chunks:
            buf.write(gzip.compress(part))
        data = buf.getvalue()
    with open(path, "wb") as f:
        f.write(data)
