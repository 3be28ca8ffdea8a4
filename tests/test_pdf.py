"""PDF text/layout parse: synth→parse round trip, totality, Spark operator.

The synth corpus (operators/pdf.synth_pdf_bytes) exercises every parser
path: literal-Tj / TJ-with-kerning / hex-string / FlateDecode content
streams (doc_id % 4), multi-page page trees (1 + doc_id % 3), reversed
file layout for odd docs (page-tree order must beat byte order), and
string escapes (parens + backslash on doc_id % 5 == 0).
"""

from __future__ import annotations

import zlib

import pytest

from htmlcleanup_spark.operators.pdf import (
    expected_pdf_text,
    pdf_text,
    pdf_text_bytes,
    synth_pdf_bytes,
)


@pytest.mark.parametrize("doc_id", list(range(24)))
def test_round_trip(doc_id):
    text, n_pages, err = pdf_text_bytes(synth_pdf_bytes(doc_id))
    assert err is None
    assert n_pages == 1 + doc_id % 3
    assert text == expected_pdf_text(doc_id)


def test_flate_docs_are_actually_compressed():
    b = synth_pdf_bytes(3)  # style 3: FlateDecode
    assert b"/FlateDecode" in b
    assert b"Doc 3 page" not in b  # text only recoverable by inflating
    text, _, err = pdf_text_bytes(b)
    assert err is None and "Doc 3 page 0" in text


def test_page_tree_order_beats_file_order():
    # odd docs lay content streams out reversed; text must still ascend
    b = synth_pdf_bytes(5)  # 3 pages, reversed layout
    first_stream = b.index(b"stream")
    assert b.index(b"/Type /Catalog") > first_stream
    text, n_pages, err = pdf_text_bytes(b)
    assert err is None and n_pages == 3
    pages = text.split("\n\n")
    assert [p.splitlines()[0] for p in pages] == [
        "Doc 5 page 0", "Doc 5 page 1", "Doc 5 page 2"]


def test_escapes_and_hex_and_kerning():
    # doc 10: style 2 (hex) and the escape branch (10 % 5 == 0)
    t10, _, e10 = pdf_text_bytes(synth_pdf_bytes(10))
    assert e10 is None and "esc (a\\b) 0" in t10
    # doc 13: style 1 (TJ with kerning numbers) — numbers must not leak
    t13, _, e13 = pdf_text_bytes(synth_pdf_bytes(13))
    assert e13 is None and "-20" not in t13
    assert t13 == expected_pdf_text(13)


def test_total_on_garbage():
    cases = [
        b"",
        None,
        b"not a pdf",
        b"%PDF-1.4\nhello",
        synth_pdf_bytes(2)[:50],
        b"%PDF-1.4\n1 0 obj\n<< /Length 999999 /Filter /FlateDecode >>\n"
        b"stream\n" + zlib.compress(b"x")[:3] + b"\nendstream\nendobj",
        bytes(range(256)) * 4,
    ]
    for b in cases:
        text, n_pages, err = pdf_text_bytes(b)
        assert (text is None) == (err is not None)


def test_corrupt_flate_is_an_error_value():
    b = synth_pdf_bytes(3)
    i = b.index(b"stream\n") + len(b"stream\n")
    bad = b[:i] + b"\x00\x00" + b[i + 2:]
    text, _, err = pdf_text_bytes(bad)
    assert text is None and "FlateDecode" in err


def test_spark_operator(spark):
    import pandas as pd

    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [synth_pdf_bytes(int(i)) for i in pdf["doc_id"]],
            })

    pdfs = ids.mapInPandas(gen, "doc_id bigint, payload binary")
    out = pdf_text(pdfs).toPandas().sort_values("doc_id")
    assert len(out) == 40
    assert out["error"].isna().all()
    for _, row in out.iterrows():
        assert row["text"] == expected_pdf_text(int(row["doc_id"]))
        assert row["n_pages"] == 1 + int(row["doc_id"]) % 3
