"""Charset sniffing + transcoding: the bytes→str step the reference never
needed (it read local files already decoded — cleanup_msfp.py's CLI opens
text — but a Common-Crawl ``html: binary`` column arrives undecoded and
mislabeled, and the cascade's input contract is str).

Detection order follows the WHATWG encoding-sniffing algorithm's practical
core, restricted to what a crawl pipeline can rely on offline:

1. BOM (UTF-8 / UTF-16 LE / UTF-16 BE) — authoritative;
2. ``<meta charset=...>`` or ``<meta http-equiv=Content-Type
   content="...; charset=...">`` within the first 1024 bytes (ASCII
   superset assumption, like browsers);
3. strict UTF-8 trial decode;
4. windows-1252 fallback (decodes any byte sequence; the standard web
   default).

Pure core (this module is Spark-free so ``engine.clean.clean_html`` can
sniff binary inputs); the Arrow-batched Spark operator lives in
``functions.charset.decode_pages``.  A decode failure is an ``error``
value, never an exception.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple


_META_RE = re.compile(
    rb"""<meta\s+[^>]*charset\s*=\s*["']?\s*([a-zA-Z0-9_.:-]+)""",
    re.I,
)

# labels a crawl actually contains → python codec names (tiny, extensible)
_LABELS = {
    "utf8": "utf-8", "utf-8": "utf-8",
    "latin1": "windows-1252", "latin-1": "windows-1252",
    "iso-8859-1": "windows-1252",  # WHATWG maps 8859-1 to cp1252
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "iso-8859-15": "iso-8859-15",
    "us-ascii": "utf-8", "ascii": "utf-8",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis", "sjis": "shift_jis",
    "euc-jp": "euc_jp", "gbk": "gbk", "gb2312": "gbk", "big5": "big5",
    "koi8-r": "koi8_r", "windows-1251": "windows-1251",
}


def detect_charset(b: bytes) -> str:
    """Best-effort charset label (a python codec name) for raw page bytes."""
    if b[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if b[:2] in (b"\xff\xfe", b"\xfe\xff"):
        # the 'utf-16' codec reads the BOM for endianness AND strips it;
        # 'utf-16-le'/'utf-16-be' would leak U+FEFF into the text
        return "utf-16"
    m = _META_RE.search(b[:1024])
    if m:
        label = m.group(1).decode("ascii", "replace").lower()
        codec = _LABELS.get(label)
        if codec:
            return codec
    try:
        b.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def decode_html(b) -> Tuple[Optional[str], Optional[str], Optional[str]]:
    """(text, charset, error) — total on arbitrary bytes."""
    try:
        if b is None:
            return None, None, "null payload"
        b = bytes(b)
        charset = detect_charset(b)
        try:
            return b.decode(charset, "strict"), charset, None
        except (UnicodeDecodeError, LookupError):
            # mislabeled meta: fall back to the undefeatable decoder
            return b.decode("windows-1252", "replace"), "windows-1252", None
    except Exception as exc:  # totality
        return None, None, "%s: %s" % (type(exc).__name__, exc)


# ---------------------------------------------------------------------------
# deterministic synthetic corpus (SQL-arithmetic twin in the oracle)
# ---------------------------------------------------------------------------

_BODY = "café nº %d — grüße"  # é º — ü ß


def expected_decoded_text(doc_id: int) -> str:
    """Ground-truth decoded body for :func:`synth_encoded_page`.

    Styles (doc_id % 5): 0 utf-8 + meta charset, 1 utf-8 BOM, 2
    windows-1252 + http-equiv meta, 3 utf-16-le BOM, 4 bare utf-8 (the
    trial-decode path).  All four non-ASCII body chars (é º — ü/ß) exist
    in cp1252, so every style round-trips its body exactly.
    """
    body = _BODY % doc_id
    style = doc_id % 5
    if style == 0:
        return '<html><head><meta charset="utf-8"></head><body>%s</body></html>' % body
    if style == 1:
        return "<html><body>%s</body></html>" % body
    if style == 2:
        return (
            '<html><head><meta http-equiv="Content-Type" '
            'content="text/html; charset=windows-1252"></head>'
            "<body>%s</body></html>" % body
        )
    if style == 3:
        return "<html><body>%s</body></html>" % body
    return "<html><body>%s</body></html>" % body


def expected_charset(doc_id: int) -> str:
    return ["utf-8", "utf-8-sig", "windows-1252", "utf-16",
            "utf-8"][doc_id % 5]


def synth_encoded_page(doc_id: int) -> bytes:
    text = expected_decoded_text(doc_id)
    style = doc_id % 5
    if style == 0:
        return text.encode("utf-8")
    if style == 1:
        return b"\xef\xbb\xbf" + text.encode("utf-8")
    if style == 2:
        return text.encode("windows-1252")
    if style == 3:
        return b"\xff\xfe" + text.encode("utf-16-le")
    return text.encode("utf-8")
