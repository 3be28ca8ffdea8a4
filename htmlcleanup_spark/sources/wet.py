"""WET export: extracted text -> WARC ``conversion`` records.

Common Crawl publishes extracted text as WET files — WARC containers
whose records are ``WARC-Type: conversion`` with a plain-text block
(ISO 28500 §6.8).  This sink renders the extraction pipeline's output
in that interchange shape so downstream consumers (and the repo's own
WARC reader, ``sources/warc.py``) can ingest it directly.

Scale shape: record rendering is pure JVM string concat (whole-stage
codegen, zero Python, zero shuffle — the narrow map rides whatever
partitioning the extraction left); the writer is Spark's text sink with
per-partition gzip, so a 1000-executor job writes 1000 compressed WET
segments concurrently, exactly how Common Crawl ships them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["to_wet_records", "write_wet", "read_wet", "to_wat_records"]

_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def to_wet_records(df: DataFrame, url_col: str = "url",
                   ts_col: str = "warc_ts",
                   text_col: str = "text") -> DataFrame:
    """Render (url, warc_ts, text) rows as WARC/1.0 conversion records.

    Returns (url, record, record_bytes): ``record`` is the full record
    string — version line, CRLF headers (WARC-Type / WARC-Target-URI /
    WARC-Date in ISO-8601 Zulu / Content-Type / Content-Length counting
    UTF-8 OCTETS of the text block, per ISO 28500), blank line, block,
    and the closing CRLF CRLF record separator; ``record_bytes`` is its
    total UTF-8 size (what the record occupies on disk), for segment
    budgeting."""
    rec = F.concat(
        F.lit("WARC/1.0\r\n"
              "WARC-Type: conversion\r\n"
              "WARC-Target-URI: "),
        F.col(url_col),
        F.lit("\r\nWARC-Date: "),
        F.date_format(F.col(ts_col), _DATE_FMT),
        F.lit("\r\nContent-Type: text/plain\r\n"
              "Content-Length: "),
        F.octet_length(F.col(text_col)).cast("string"),
        F.lit("\r\n\r\n"),
        F.col(text_col),
        F.lit("\r\n\r\n"),
    )
    return df.select(
        F.col(url_col).alias("url"),
        rec.alias("record"),
        F.octet_length(rec).cast("long").alias("record_bytes"),
    )


def to_wat_records(df: DataFrame, url_col: str = "url",
                   ts_col: str = "warc_ts", title_col: str = "title",
                   links_col: str = "links") -> DataFrame:
    """Render page metadata as WAT records — Common Crawl's third
    artifact beside WARC (raw) and WET (text): ``WARC-Type: metadata``
    with an ``application/json`` block describing the capture envelope
    and the extracted HTML head/links.

    Expects (url, warc_ts, title, links: array<string>) — title from
    operators/content.page_metadata, links from
    operators/links.extract_outlinks rolled up per page.  Returns
    (url, record, record_bytes) like :func:`to_wet_records`.

    The JSON mirrors the WAT envelope shape
    (Envelope.WARC-Header-Metadata + Envelope.Payload-Metadata.
    HTML-Metadata.{Head.Title, Links[].url}) via ``to_json`` over a
    nested struct — key ORDER is struct-field order, so the payload is
    byte-deterministic and oracle-checkable.  Pure JVM string work,
    zero shuffle, same per-partition gzip text sink as WET.
    """
    meta = F.to_json(
        F.struct(
            F.struct(
                F.struct(
                    F.col(url_col).alias("WARC-Target-URI"),
                    F.date_format(F.col(ts_col), _DATE_FMT)
                    .alias("WARC-Date"),
                ).alias("WARC-Header-Metadata"),
                F.struct(
                    F.struct(
                        F.struct(
                            F.col(title_col).alias("Title")
                        ).alias("Head"),
                        F.transform(
                            F.col(links_col),
                            lambda u: F.struct(u.alias("url")),
                        ).alias("Links"),
                    ).alias("HTML-Metadata")
                ).alias("Payload-Metadata"),
            ).alias("Envelope")
        )
    )
    rec = F.concat(
        F.lit("WARC/1.0\r\n"
              "WARC-Type: metadata\r\n"
              "WARC-Target-URI: "),
        F.col(url_col),
        F.lit("\r\nWARC-Date: "),
        F.date_format(F.col(ts_col), _DATE_FMT),
        F.lit("\r\nContent-Type: application/json\r\n"
              "Content-Length: "),
        F.octet_length(meta).cast("string"),
        F.lit("\r\n\r\n"),
        meta,
        F.lit("\r\n\r\n"),
    )
    return df.select(
        F.col(url_col).alias("url"),
        rec.alias("record"),
        F.octet_length(rec).cast("long").alias("record_bytes"),
    )


def write_wet(df: DataFrame, path: str, compress: bool = True) -> None:
    """Write WET segments: one text file (gzip member) per partition.

    The record column already ends with one CRLF of the WARC
    record separator; the text sink's ``lineSep`` is set to CRLF so the
    writer itself supplies the second — byte-exact WET framing with no
    Python in the write path.  Repartition upstream to size segments
    (Common Crawl targets ~150 MB compressed per WET file)."""
    recs = to_wet_records(df).select(
        # drop ONE trailing CRLF; the writer's lineSep restores it
        F.expr("substring(record, 1, length(record) - 2)").alias("value")
    )
    w = recs.write.mode("overwrite").option("lineSep", "\r\n")
    if compress:
        w = w.option("compression", "gzip")
    w.text(path)


def read_wet(spark: SparkSession, path: str,
             path_glob: str = "part-*") -> DataFrame:
    """Read WET segments back as (url, warc_ts, text) — the round-trip
    twin of :func:`write_wet`, reusing the incremental WARC scanner with
    ``conversion`` records enabled."""
    from .warc import read_warc

    pages = read_warc(spark, path, path_glob=path_glob,
                      record_types=("conversion",))
    return pages.select(
        "url", "warc_ts", F.decode("html", "utf-8").alias("text")
    )
