"""Property-based engine invariants over arbitrary tag soup.

The fixture corpus pins exact bytes for KNOWN inputs; these properties pin
the two behaviors that must hold for ALL inputs at 10^12-doc scale:

1. total safety — clean_html never raises; every failure is a value in
   the error column (one malformed page cannot kill an executor), and
2. convergence — when a document cleans successfully, repeated cleaning
   reaches a fixed point within a few passes (the cascade cannot
   oscillate; idempotence is deliberately NOT claimed — the reference's
   single-pass semantics legitimately takes several passes to settle,
   e.g. S5 empties a <p> on pass N and only pass N+1 can strip the
   whitespace that removal exposes).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from htmlcleanup_spark.engine import clean_html

_WORDS = st.sampled_from(
    ["alpha", "beta", "x", "42", "a b", "&nbsp;", "q.", "é", " "]
)
_TOKENS = st.sampled_from(
    [
        "<p>", "</p>", '<p align="left">', "<b>", "</b>", "<i>", "</i>",
        "<font face=\"Book Antiqua\">", "<font>", "</font>",
        "<span>", "</span>", '<span style="color: navy">',
        "<o:p>", "</o:p>", '<o:p x="1">',
        "<table>", "</table>", "<tr>", "</tr>", "<td>", "</td>",
        '<td><img src="img/rombul12.gif"></td>',
        "<div>", "</div>", '<div align="center">', "<center>", "</center>",
        "<br>", "<br />", "<script>var x=1;</script>", "<!--mstheme-->",
        "<!-- c -->", "<h2>", "</h2>", "<a href=\"x\">", "</a>",
        "<strong>", "</strong>", "<", ">", "</", "<p", "&amp;",
    ]
)


@st.composite
def soup(draw):
    parts = draw(
        st.lists(st.one_of(_WORDS, _TOKENS), min_size=0, max_size=40)
    )
    return (
        "<html>\n<head><title>t</title></head>\n<body>\n"
        + "".join(parts)
        + "\n</body>\n</html>\n"
    )


@settings(max_examples=120, deadline=None)
@given(soup())
def test_never_raises_and_converges(html):
    r = clean_html(html)
    # total safety: failures are values, not exceptions
    assert (r.text is None) != (r.error is None)
    if r.error is not None:
        return
    assert r.bytes_in == len(html.encode("utf-8"))
    assert r.bytes_out == len(r.text.encode("utf-8"))
    # convergence: a fixed point is reached within a bounded number of
    # passes (no oscillation). Each pass can expose new strippable
    # content (emptied <p>s, then whitespace in the emptied parent), so
    # the bound is > 2; 6 is far above anything the cascade produces.
    cur = r.text
    for _ in range(6):
        rn = clean_html(cur)
        if rn.error is not None:
            return  # per-document error column tolerates this
        if rn.text == cur:
            return  # fixed point reached
        cur = rn.text
    raise AssertionError(f"no fixed point within 6 passes: {cur!r}")


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=200))
def test_arbitrary_bytes_never_raise(payload):
    r = clean_html(payload)
    assert (r.text is None) != (r.error is None)
