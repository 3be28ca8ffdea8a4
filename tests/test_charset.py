"""Charset sniff + transcode (bytes→str pipeline head): BOM precedence,
meta labels, trial decode, cp1252 fallback, totality, Spark operator."""

from __future__ import annotations

import pytest

from htmlcleanup_spark.functions.charset import (
    decode_html,
    decode_pages,
    detect_charset,
    expected_charset,
    expected_decoded_text,
    synth_encoded_page,
)


@pytest.mark.parametrize("doc_id", list(range(15)))
def test_round_trip(doc_id):
    text, cs, err = decode_html(synth_encoded_page(doc_id))
    assert err is None
    assert cs == expected_charset(doc_id)
    assert text == expected_decoded_text(doc_id)


def test_bom_beats_meta():
    b = b'\xef\xbb\xbf<meta charset="windows-1252"><body>caf\xc3\xa9</body>'
    text, cs, _ = decode_html(b)
    assert cs == "utf-8-sig" and "café" in text and "﻿" not in text


def test_utf16_bom_is_stripped():
    b = b"\xff\xfe" + "<p>héllo</p>".encode("utf-16-le")
    text, cs, _ = decode_html(b)
    assert cs == "utf-16" and text == "<p>héllo</p>"


def test_meta_labels_and_aliases():
    for label, codec in [("ISO-8859-1", "windows-1252"),
                         ("Latin1", "windows-1252"),
                         ("UTF-8", "utf-8"),
                         ("Shift_JIS", "shift_jis")]:
        b = ('<meta charset="%s"><body>x</body>' % label).encode("ascii")
        assert detect_charset(b) == codec, label


def test_meta_only_searched_in_first_1024_bytes():
    pad = b"<!--" + b"x" * 1100 + b"-->"
    b = pad + b'<meta charset="utf-16"><body>ascii only</body>'
    # meta is past the window; pure-ASCII bytes decode as utf-8
    assert detect_charset(b) == "utf-8"


def test_trial_decode_and_cp1252_fallback():
    assert detect_charset("<p>grüße</p>".encode("utf-8")) == "utf-8"
    raw = "<p>grüße</p>".encode("windows-1252")  # no meta, invalid utf-8
    text, cs, _ = decode_html(raw)
    assert cs == "windows-1252" and "grüße" in text


def test_mislabeled_meta_falls_back_to_replace():
    # meta claims utf-16 but the bytes are odd-length ASCII: strict decode
    # fails, the cp1252 replace path still yields a value
    b = b'<meta charset="utf-16"><body>abc</body>'
    assert len(b) % 2 == 1
    text, cs, err = decode_html(b)
    assert err is None and text is not None and cs == "windows-1252"


def test_total_on_garbage():
    for junk in [None, b"", b"\x81\x9d\xff", bytes(range(256))]:
        text, cs, err = decode_html(junk)
        assert (text is None) == (err is not None)


def test_clean_html_sniffs_binary_input():
    from htmlcleanup_spark.engine import clean_html

    page = "<html>\n<head><title>t</title></head>\n<body>\n<p>grüße — café</p>\n</body>\n</html>\n"
    for enc, raw in [
        ("utf-8", page.encode("utf-8")),
        ("cp1252", page.encode("windows-1252")),
        ("utf-8 BOM", b"\xef\xbb\xbf" + page.encode("utf-8")),
        ("utf-16", b"\xff\xfe" + page.encode("utf-16-le")),
    ]:
        r = clean_html(raw)
        assert r.error is None, enc
        assert "grüße — café" in r.text, enc
        assert "�" not in r.text and "﻿" not in r.text, enc
        assert r.bytes_in == len(raw), enc


def test_spark_operator(spark):
    import pandas as pd

    ids = spark.range(0, 25).withColumnRenamed("id", "doc_id")

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [synth_encoded_page(int(i))
                            for i in pdf["doc_id"]],
            })

    raw = ids.mapInPandas(gen, "doc_id bigint, payload binary")
    out = decode_pages(raw).toPandas().sort_values("doc_id")
    assert len(out) == 25 and out["error"].isna().all()
    for _, row in out.iterrows():
        i = int(row["doc_id"])
        assert row["text"] == expected_decoded_text(i)
        assert row["charset"] == expected_charset(i)


def test_fix_mojibake_generic_roundtrip(spark):
    """cp1252 mojibake repairs via the byte round-trip; legitimate
    Latin-script text with telltale chars survives; idempotent."""
    from pyspark.sql import functions as F
    from htmlcleanup_spark.functions.charset import fix_mojibake

    clean = "café — naïve «quote» …"
    moji = clean.encode("utf-8").decode("cp1252")
    rows = [(0, moji), (1, "château legit â text"), (2, "plain"),
            (3, clean)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text
           for r in df.select("doc_id",
                              fix_mojibake().alias("text")).collect()}
    assert out[0] == clean
    assert out[1] == "château legit â text"   # invalid-UTF8 guard
    assert out[2] == "plain"
    assert out[3] == clean                     # already clean: untouched
    # idempotence: repairing the repair is a no-op
    df2 = spark.createDataFrame([(0, out[0])], "doc_id long, text string")
    assert df2.select(fix_mojibake().alias("t")).collect()[0].t == clean


def test_nfc_and_control_strip(spark):
    from htmlcleanup_spark.functions.charset import (
        nfc_normalize_text, strip_control_chars,
    )

    nfd = "café naïve"
    df = spark.createDataFrame(
        [(0, nfd), (1, "a\x01b\x07c ok\ttab\nline")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in nfc_normalize_text(df).select(
        "doc_id", strip_control_chars().alias("text")).collect()}
    assert out[0] == "café naïve" and len(out[0]) == 10
    assert out[1] == "abc ok\ttab\nline"      # tab/newline survive
