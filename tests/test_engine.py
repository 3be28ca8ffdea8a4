"""Engine unit tests: fixture pairs, convergence, quirks, error column."""

from __future__ import annotations

import glob
import os

import pytest

from htmlcleanup_spark.engine import clean_html
from htmlcleanup_spark.engine.preparse import (
    UnparseableHtml,
    fix_b_p_interleave,
    remove_tag_pairs,
)
from htmlcleanup_spark.engine.rules import RuleConfig

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")

SPECIAL_RULES = {"w6-split-enabled": RuleConfig(split_double_br=True)}


def fixture_pairs():
    for in_path in sorted(glob.glob(os.path.join(FIXTURE_DIR, "*", "*.in.html"))):
        out_path = in_path.replace(".in.html", ".out.html")
        rule_dir = os.path.basename(os.path.dirname(in_path))
        nn = os.path.basename(in_path).split(".")[0]
        yield pytest.param(in_path, out_path, rule_dir, id="%s-%s" % (rule_dir, nn))


@pytest.mark.parametrize("in_path,out_path,rule_dir", fixture_pairs())
def test_fixture_byte_identical(in_path, out_path, rule_dir):
    with open(in_path) as f:
        html = f.read()
    with open(out_path) as f:
        expected = f.read()
    rules = SPECIAL_RULES.get(rule_dir)
    result = clean_html(html, rules) if rules else clean_html(html)
    assert result.error is None
    assert result.text == expected


@pytest.mark.parametrize("in_path,out_path,rule_dir", fixture_pairs())
def test_cascade_convergence(in_path, out_path, rule_dir):
    """clean(clean(x)) is a fixed point (the cascade converges in 2 passes).

    Full-cascade *idempotence* does not hold in the reference either: S3 only
    strips align= attributes (soupcleanup.py:440-441), so a pass-1 output can
    still carry a removable text-align style.
    """
    with open(out_path) as f:
        once = f.read()
    rules = SPECIAL_RULES.get(rule_dir)
    twice = (clean_html(once, rules) if rules else clean_html(once)).text
    thrice = (clean_html(twice, rules) if rules else clean_html(twice)).text
    assert twice is not None and thrice == twice


class TestPreparse:
    def test_unpaired_end_tag_raises(self):
        with pytest.raises(UnparseableHtml):
            remove_tag_pairs("a</font>b", "font", ['face="X"'])

    def test_orphan_start_stripped_when_strip_all(self):
        assert remove_tag_pairs("a<o:p>b", "o:p") == "ab"
        assert remove_tag_pairs('a<o:p x="1">b', "o:p") == "ab"

    def test_only_configured_faces_stripped(self):
        html = '<font face="X">a</font><font face="Y">b</font>'
        assert remove_tag_pairs(html, "font", ['face="X"']) == (
            'a<font face="Y">b</font>'
        )

    def test_recursive_pairs(self):
        html = '<font face="X">a<font face="X">b</font>c</font>'
        assert remove_tag_pairs(html, "font", ['face="X"']) == "abc"

    def test_bp_interleave_length_preserving(self):
        html = "<b><p> t.</b></p>"
        fixed = fix_b_p_interleave(html)
        assert fixed == "<p><b> t.</b></p>"
        assert len(fixed) == len(html)

    def test_bp_interleave_skips_closed_p(self):
        html = "<b><p>t</p></b>"
        assert fix_b_p_interleave(html) == html


class TestErrorColumn:
    """Per-document failures land in .error; clean_html never raises."""

    def test_unpaired_font_end(self):
        r = clean_html("<body></font><p>x</p></body>")
        assert r.text is None and "UnparseableHtml" in r.error

    def test_no_body(self):
        r = clean_html("<p>no body</p>")
        assert r.text is None and "no <body>" in r.error

    def test_bad_table_structure(self):
        r = clean_html(
            "<html><head><title>t</title></head><body>"
            "<table><div>x</div><tr><td>a</td><td>b</td></tr></table>"
            "</body></html>"
        )
        assert r.text is None and "CascadeError" in r.error

    def test_font_unknown_attr(self):
        r = clean_html(
            "<html><head><title>t</title></head><body>"
            '<p>a<font onclick="x">b</font>c</p></body></html>'
        )
        assert r.text is None and "unknown attributes" in r.error

    def test_empty_and_garbage(self):
        assert clean_html("").error is not None
        assert clean_html(b"\xff\xfe<html>").error is not None


class TestQuirks:
    def test_non_ascii_never_deduped(self):
        body = "<html><head><title>t</title></head><body><p>%s</p></body></html>"
        assert "aé  b" in clean_html(body % "aé  b").text
        assert "ax b" in clean_html(body % "ax  b").text

    def test_double_nbsp_never_deduped(self):
        r = clean_html(
            "<html><head><title>t</title></head><body>"
            "<p>a&nbsp;&nbsp;b</p></body></html>"
        )
        assert "a&nbsp;&nbsp;b" in r.text

    def test_br_serialized_without_slash(self):
        r = clean_html(
            "<html><head><title>t</title></head><body>"
            "<p>x<br>y</p></body></html>"
        )
        assert "<br>" in r.text and "<br />" not in r.text

    def test_crlf_normalized(self):
        r = clean_html(
            "<html>\r\n<head><title>t</title></head>\r\n<body>\r\n"
            "<p>x</p>\r\n</body>\r\n</html>"
        )
        assert "\r" not in r.text

    def test_counters_and_bytes(self):
        r = clean_html(
            "<html><head><title>t</title></head><body>"
            "<script>x</script><!--c--><p><b>x</b></p></body></html>"
        )
        assert r.rules_fired["d1_script"] == 1
        assert r.rules_fired["d2_comment"] == 1
        assert r.rules_fired["d3_rename"] == 1
        assert r.bytes_in > 0 and r.bytes_out > 0
