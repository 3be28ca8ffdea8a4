"""The frozen rule table driving the cleanup cascade.

Every default is taken verbatim from the reference's declarative config
(rmuit/HtmlCleanup — cleanup_msfp.py:22-31, soupcleanup.py:135-170).  The
structure is immutable so one instance can be built on the driver and
broadcast to every executor (``sparkContext.broadcast``); tag-name dispatch is
two nested mappings (tag -> attr/style -> value(s)), i.e. a shallow trie.
"""

from __future__ import annotations

from dataclasses import dataclass, field


def _freeze(d: dict) -> dict:
    """Normalize rule-table values (lists -> tuples).

    Plain dicts (not MappingProxyType) so the instance pickles cleanly for
    ``sparkContext.broadcast``; treat as immutable by convention.
    """
    return {
        k: (_freeze(v) if isinstance(v, dict) else (tuple(v) if isinstance(v, list) else v))
        for k, v in d.items()
    }


@dataclass(frozen=True)
class RuleConfig:
    """Immutable configuration for one cascade run."""

    # Remove one empty <p> following <table>/<ul> (cleanup_msfp.py:22).
    remove_empty_paragraphs_under_blocks: bool = True

    # Bullet images converted to <li> inside 2-column tables
    # (cleanup_msfp.py:25).
    img_bullet_re: str = r"(rom|exp)bul.?.?\.gif$"

    # <font> tags stripped pre-parse when their literal attribute text is
    # exactly face="<one of these>" (cleanup_msfp.py:30-31).
    font_faces_to_remove: tuple = (
        "Book Antiqua, Times New Roman, Times",
        "Book Antiqua",
    )

    # The load-bearing inline/non-inline split (soupcleanup.py:135,
    # README.md:80-84).
    inline_tag_names: tuple = ("strong", "em", "font", "span", "a")

    # Dedupe a single &nbsp; adjacent to other whitespace
    # (soupcleanup.py:139).
    dedupe_nbsp: bool = True

    # Optional pass, default OFF because the reference driver never calls it
    # (soupcleanup.py:1276-1358 defined; absent from cleanup_msfp.py).
    split_double_br: bool = False

    # tag -> attr -> '*' | value | tuple(values) (soupcleanup.py:149-157).
    # The driver injects font/face at startup (cleanup_msfp.py:90-95); we bake
    # it in since font_faces_to_remove is set by default.
    remove_attributes: dict = field(
        default_factory=lambda: _freeze(
            {
                "*": {"lang": "*"},
                "font": {
                    "face": [
                        "Book Antiqua, Times New Roman, Times",
                        "Book Antiqua",
                    ]
                },
            }
        )
    )

    # tag -> style-name -> '*' | value | tuple(values) (soupcleanup.py:161-170).
    remove_styles: dict = field(
        default_factory=lambda: _freeze(
            {
                "*": {
                    "line-height": ["100%", "normal", "15.1 pt"],
                    "color": ["black", "#000", "#000000"],
                    "text-autospace": "none",
                },
                "h2": {"color": "#996600"},
                "h3": {"color": "#999900"},
            }
        )
    )


DEFAULT_RULES = RuleConfig()
