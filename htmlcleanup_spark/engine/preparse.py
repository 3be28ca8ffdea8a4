"""Pre-parse raw-string repair: runs before any DOM exists.

These passes fix "completely wrong" constructs that would make a lenient tree
builder mis-correct otherwise-fine structure (reference rationale:
cleanup_msfp.py:47-84, README.md:49-52).  Semantics reproduced from
rmuit/HtmlCleanup htmlcleanup.py:18-147 (P1/P2) and cleanup_msfp.py:80-84
(P3); implementation is fresh.

Byte-exactness note: the reference's scanner has several load-bearing quirks
that shape its output bytes, all reproduced here deliberately (each cited at
the code that emulates it):

- start tags occurring after the LAST end tag are never collected, so a
  trailing orphan ``<o:p>`` SURVIVES strip-all mode (htmlcleanup.py:72-83:
  the collection condition ``start_pos < end_pos`` is unsatisfiable for
  positions >= 0 once ``end_pos == -1``);
- in strip-all mode a compound start tag (``<name attrs>``) is INVISIBLE to
  the scanner whenever no simple ``<name>`` start remains ahead of the scan
  position (htmlcleanup.py:78-83: the compound hit is only accepted when
  ``p < start_pos`` and the simple search returned a real position), which
  can make an end tag pair up with an earlier simple start, or raise;
- a *paired* compound start in strip-all mode loses only the literal
  ``<name `` prefix — the ``attrs>`` text stays behind as document text
  (htmlcleanup.py:100-108);
- orphan compound starts hit a slice bug (htmlcleanup.py:133):
  ``html[start_pos : start_tag_end_pos - start_pos + 1]``.  When that slice
  is non-empty (tag longer than its own offset, i.e. near the document
  start) it necessarily contains ``<`` and the reference raises; when empty
  (the common case) every check passes vacuously and ZERO characters are
  stripped — the orphan compound tag survives.

All functions are pure ``str -> str`` and run per document inside the Arrow
batch UDF.
"""

from __future__ import annotations

import re


class UnparseableHtml(Exception):
    """Raised for documents whose raw structure can't be trusted.

    The Spark job catches this per document and routes it to the error
    column instead of aborting the job (the reference simply crashes,
    htmlcleanup.py:87-94).
    """


def remove_tag_pairs(html: str, tag_name: str, tag_contents=None) -> str:
    """Strip paired start/end tags of ``tag_name``, keeping their contents.

    ``tag_contents``: optional list of literal attribute strings; only start
    tags written exactly ``<name attrs>`` (single space, literal text,
    htmlcleanup.py:28-36) with one of these attrs are stripped — their
    matching end tag too.  Recursive nesting is handled by matching each end
    tag with the *last* unmatched start tag before it (htmlcleanup.py:68-99).

    When ``tag_contents`` is None, *all* tags of this name are stripped,
    modulo the reference scanner quirks listed in the module docstring
    (trailing orphans survive, compound starts can be invisible, paired
    compound strips leave an ``attrs>`` residue).  An end tag with no
    collected start tag raises (htmlcleanup.py:87-94).
    """
    end_tag = "</" + tag_name + ">"
    simple_start = "<" + tag_name + ">"
    compound_prefix = "<" + tag_name + " "

    # truthiness, not an is-None check: the reference's `if tag_contents:`
    # (htmlcleanup.py:28) treats an EMPTY list exactly like None — both mean
    # strip-all (differentially swept in tests/test_engine.py with
    # tag_contents=[]).
    strip_all = not tag_contents
    if strip_all:
        match_simple = True
        match_compound = True
        strip_prefixes = [simple_start, compound_prefix]
    else:
        match_simple = False
        match_compound = False
        strip_prefixes = []
        for inside in tag_contents:
            if inside:
                match_compound = True
                strip_prefixes.append(compound_prefix + inside + ">")
            else:
                match_simple = True
                strip_prefixes.append(simple_start)

    def find_next_start(s: str, frm: int) -> int:
        """Next start tag at/after frm, with the reference's search quirk:
        when the simple form is searched but absent ahead, a compound hit is
        rejected because ``p < -1`` never holds (htmlcleanup.py:78-83)."""
        p_simple = s.find(simple_start, frm) if match_simple else -1
        if match_compound:
            p_comp = s.find(compound_prefix, frm)
            if (not match_simple) or (p_comp != -1 and p_comp < p_simple):
                return p_comp
        return p_simple

    pending_starts = []  # positions of start tags not yet matched to an end
    scan_from = 0
    while True:
        end_pos = html.find(end_tag, scan_from)
        # Collect every start tag occurring before this end tag.  When no
        # end tag remains (end_pos == -1) the reference collects nothing —
        # its loop guard is `start_pos < end_pos` (htmlcleanup.py:74) — so
        # trailing orphan starts are never recorded and survive.
        if end_pos != -1:
            p = find_next_start(html, scan_from)
            while p != -1 and p < end_pos:
                pending_starts.append(p)
                p = find_next_start(html, p + 1)
        if end_pos == -1:
            break
        if not pending_starts:
            raise UnparseableHtml(
                "%s end tag without start tag near pos %d" % (tag_name, end_pos)
            )
        scan_from = end_pos + 1
        start_pos = pending_starts.pop()
        for prefix in strip_prefixes:
            if html.startswith(prefix, start_pos):
                # The reference deletes exactly len(prefix) characters
                # (htmlcleanup.py:100-108): for a compound start in
                # strip-all mode that is just "<name ", leaving the
                # "attrs>" residue behind as text.
                html = (
                    html[:start_pos]
                    + html[start_pos + len(prefix) : end_pos]
                    + html[end_pos + len(end_tag) :]
                )
                scan_from -= len(prefix) + len(end_tag)
                break

    if pending_starts and strip_all:
        # Orphan start tags collected between pairs: silently strip simple
        # ones (htmlcleanup.py:115-121).  Compound orphans hit the slice bug
        # (htmlcleanup.py:133): slice = html[start_pos : tag_len - start_pos
        # + ... ] -> non-empty only when the tag is longer than its own
        # offset, in which case it contains '<' and the reference raises;
        # otherwise all checks pass on the empty slice and nothing at all
        # is removed.
        while pending_starts:
            start_pos = pending_starts.pop()
            if html.startswith(simple_start, start_pos):
                html = html[:start_pos] + html[start_pos + len(simple_start) :]
            elif html.startswith(compound_prefix, start_pos):
                gt = html.find(">", start_pos + len(compound_prefix))
                if gt == -1:
                    raise UnparseableHtml(
                        'no ">" found for %s tag' % tag_name
                    )
                # Reference slice bug, reproduced byte-for-byte
                # (htmlcleanup.py:133-143).
                sliced = html[start_pos : gt - start_pos + 1]
                if sliced.count('"') % 2 or sliced.count("'") % 2:
                    raise UnparseableHtml(
                        'unsupported ">" inside quoted attribute of %s tag'
                        % tag_name
                    )
                if "<" in sliced:
                    raise UnparseableHtml(
                        'unsupported "<" inside %s tag (missing ">"?)' % tag_name
                    )
                # sliced is empty here (any non-empty slice starts with '<'
                # and raised above): the reference strips len(sliced) == 0
                # characters, i.e. the orphan compound tag survives.
                html = html[:start_pos] + html[start_pos + len(sliced) :]

    return html


# P3: <b><p ...>X</b> with no </p> inside X  =>  <p ...><b>X
# (cleanup_msfp.py:80-84; the splice is length-preserving so match offsets
# from finditer stay valid.)
_RX_B_P_INTERLEAVE = re.compile(r"\<b\>(\s*\<p.*?\>)(.*?)\<\/b>", re.S)


def fix_b_p_interleave(html: str) -> str:
    for m in _RX_B_P_INTERLEAVE.finditer(html):
        if m.group(2).find("/p>") == -1:
            html = html[: m.start()] + m.group(1) + "<b>" + html[m.start(2) :]
    return html


def preparse(html: str, font_faces_to_remove=()) -> str:
    """Run P1-P3 in driver order (cleanup_msfp.py:44-84), incl. CRLF -> LF."""
    html = html.replace("\r\n", "\n")
    if font_faces_to_remove:
        contents = ['face="' + face + '"' for face in font_faces_to_remove]
        html = remove_tag_pairs(html, "font", contents)
    html = remove_tag_pairs(html, "o:p")
    html = fix_b_p_interleave(html)
    return html
