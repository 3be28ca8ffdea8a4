"""``clean_html``: the whole per-document transformation, no Spark.

Pipeline (reference lifecycle, cleanup_msfp.py:44-302): CRLF->LF, pre-parse
string repair (P1-P3), tokenize+parse, DOM cascade, serialize with the final
``<br />`` -> ``<br>`` rewrite.  This function is the unit under test for the
fixture corpus; the Spark UDF is a thin Arrow-batched wrapper over it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import charset
from .cascade import CascadeEngine
from .dom import parse
from .preparse import preparse
from .rules import DEFAULT_RULES, RuleConfig


@dataclass
class CleanResult:
    text: str | None
    rules_fired: dict = field(default_factory=dict)
    error: str | None = None
    bytes_in: int = 0
    bytes_out: int = 0


def clean_html(html, rules: RuleConfig = DEFAULT_RULES) -> CleanResult:
    """Clean one HTML document (str or utf-8-ish bytes).

    Never raises: per-document failures (the reference crashes the process,
    e.g. htmlcleanup.py:87-94, soupcleanup.py:716-718, 1409-1425) are
    reported in ``error`` with ``text=None`` so one bad page can't kill a
    100 TB job.
    """
    if isinstance(html, (bytes, bytearray)):
        bytes_in = len(html)
        # WHATWG-core sniff (BOM > meta > utf-8 trial > cp1252): valid
        # utf-8 decodes exactly as before; mislabeled/legacy crawl bytes
        # now transcode instead of turning into U+FFFD runs
        html, _charset, _err = charset.decode_html(bytes(html))
        if html is None:
            return CleanResult(text=None, error=_err, bytes_in=bytes_in)
    else:
        bytes_in = len(html.encode("utf-8"))

    try:
        repaired = preparse(html, rules.font_faces_to_remove)
        engine = CascadeEngine(rules)
        doc = engine.run(parse(repaired))
        out = str(doc).replace("<br />", "<br>")
        fired = engine.fired
        if repaired != html.replace("\r\n", "\n"):
            fired = dict(fired)
            fired["p_preparse"] = 1
        return CleanResult(
            text=out,
            rules_fired=fired,
            error=None,
            bytes_in=bytes_in,
            bytes_out=len(out.encode("utf-8")),
        )
    except Exception as exc:  # noqa: BLE001 — per-doc error column by design
        return CleanResult(
            text=None,
            rules_fired={},
            error="%s: %s" % (type(exc).__name__, exc),
            bytes_in=bytes_in,
            bytes_out=0,
        )
