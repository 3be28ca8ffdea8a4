"""Pre-parse raw-string repair: runs before any DOM exists.

These passes fix "completely wrong" constructs that would make a lenient tree
builder mis-correct otherwise-fine structure (reference rationale:
cleanup_msfp.py:47-84, README.md:49-52).  Semantics reproduced from
rmuit/HtmlCleanup htmlcleanup.py:18-147 (P1/P2) and cleanup_msfp.py:80-84
(P3); implementation is fresh.

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
    including orphan start tags left over at the end (htmlcleanup.py:110-145).
    An end tag with no preceding start tag raises (htmlcleanup.py:87-94).

    Deviation from the reference: for a *paired* compound start tag in
    strip-all mode the reference deletes only the literal ``<name `` prefix,
    leaving the attribute text behind (htmlcleanup.py:100-108); we strip the
    whole start tag through ``>`` — same intent, no residue.
    """
    end_tag = "</" + tag_name + ">"
    simple_start = "<" + tag_name + ">"
    compound_prefix = "<" + tag_name + " "

    strip_all = tag_contents is None
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
        """Position of the next start tag of this name at/after frm, or -1."""
        p_simple = s.find(simple_start, frm) if match_simple else -1
        p_comp = s.find(compound_prefix, frm) if match_compound else -1
        if p_simple == -1:
            return p_comp
        if p_comp == -1:
            return p_simple
        return min(p_simple, p_comp)

    pending_starts = []  # positions of start tags not yet matched to an end
    scan_from = 0
    while True:
        end_pos = html.find(end_tag, scan_from)
        # Collect every start tag occurring before this end tag.
        p = find_next_start(html, scan_from)
        while p != -1 and (end_pos == -1 or p < end_pos):
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
                start_len = len(prefix)
                if strip_all and prefix == compound_prefix:
                    gt = html.find(">", start_pos)
                    if gt == -1 or gt > end_pos:
                        raise UnparseableHtml(
                            'no ">" for %s start tag at %d' % (tag_name, start_pos)
                        )
                    start_len = gt + 1 - start_pos
                html = (
                    html[:start_pos]
                    + html[start_pos + start_len : end_pos]
                    + html[end_pos + len(end_tag) :]
                )
                scan_from -= start_len + len(end_tag)
                break

    if pending_starts and strip_all:
        # Orphan start tags: silently strip (htmlcleanup.py:110-145), with
        # the same sanity checks on quote parity / embedded '<'.
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
                start_tag = html[start_pos : gt + 1]
                if start_tag.count('"') % 2 or start_tag.count("'") % 2:
                    raise UnparseableHtml(
                        'unsupported ">" inside quoted attribute of %s tag'
                        % tag_name
                    )
                if "<" in start_tag[1:]:
                    raise UnparseableHtml(
                        'unsupported "<" inside %s tag (missing ">"?)' % tag_name
                    )
                html = html[:start_pos] + html[gt + 1 :]

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
