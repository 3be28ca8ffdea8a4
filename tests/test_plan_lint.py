"""Registry-wide physical-plan lint: every `queries()` entry is built at
sf0.001 and its executed plan is checked against the scale invariants the
operator docstrings promise.  This is the whole-repo regression gate for
the 100-TB design rules:

- **No CartesianProduct** — the only sanctioned cross-join shape is the
  broadcast 1-row scalar attach, which prints as BroadcastNestedLoopJoin.
- **No BatchEvalPython** — row-at-a-time Python UDFs are banned; every
  Python crossing is mapInArrow/mapInPandas over batches.
- **Global windows (empty PARTITION BY) only where a docstring documents
  a bound or a windowless corpus path** — a global window is a single
  sort task at corpus scale, and AQE cannot split window partitions.

The allowlist below is not an exemption from the rule but an index of the
documented exceptions; each entry cites why the plan is safe.  A new query
whose plan grows a global window fails here until it either removes the
window or documents + allowlists the bound.
"""

from __future__ import annotations

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = "/root/testdata/sf0.001"

# windowspecdefinition(part1, ..., ord1 ASC NULLS FIRST, frame) — when the
# FIRST argument already carries a sort direction (or is the frame itself),
# the partition clause is empty: a global window.
_GLOBAL_WINDOW = re.compile(
    r"windowspecdefinition\((?:[^(),]+ (?:ASC|DESC) NULLS"
    r"|specifiedwindowframe)"
)

# Documented global-window exceptions: name -> why the plan is safe.
GLOBAL_WINDOW_ALLOWED = {
    # operators/dsir.dsir_select top_frac: exact VALIDATION path; corpus
    # path is the threshold= pushed-down filter (same docstring).
    "dsir_weights": "validation-scale exact top-frac; threshold path at scale",
    # operators/corpus.filter_funnel: running sum over the STAGE table —
    # one row per funnel stage (~7 rows), not per document.
    "filter_funnel": "window input is the ~7-row stage table",
    # operators/lm.ppl_buckets default NTILE: exact validation path;
    # corpus path is thresholds= CASE (same docstring).
    "perplexity": "validation-scale exact NTILE; thresholds path at scale",
    # operators/sample.token_budget_sample: global prefix window is the
    # documented validation path; per-stratum scale path in the docstring.
    "token_budget": "validation-scale prefix sum; stratum path at scale",
    # composes token_budget (above).
    "training_corpus_v2": "inherits token_budget's documented paths",
    # functions/text.zipf_fit: rank window runs AFTER .limit(top_n) —
    # bounded at <= 200 rows by construction.
    "zipf_fit": "window input bounded at top_n (<=200) rows",
    # functions/text.heavy_hitters: rank window runs AFTER .limit(k) —
    # bounded at <= k (20) rows by construction.
    "heavy_hitters": "window input bounded at k (<=20) rows",
}


@pytest.fixture(scope="module")
def registry_plans(spark):
    import __spark_entry__ as entry

    plans = {}
    errors = {}
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, SF_DIR)
            plans[name] = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # pragma: no cover - surfaced by the test
            errors[name] = repr(ex)
    assert not errors, "queries failed to plan: %s" % errors
    return plans


def test_no_cartesian_product_anywhere(registry_plans):
    offenders = [n for n, p in registry_plans.items()
                 if "CartesianProduct" in p]
    assert offenders == [], offenders


def test_no_row_at_a_time_python_udf_anywhere(registry_plans):
    offenders = [n for n, p in registry_plans.items()
                 if "BatchEvalPython" in p]
    assert offenders == [], offenders


def test_global_windows_only_where_documented(registry_plans):
    offenders = sorted(
        n for n, p in registry_plans.items()
        if _GLOBAL_WINDOW.search(p) and n not in GLOBAL_WINDOW_ALLOWED
    )
    assert offenders == [], (
        "undocumented global windows (add the windowless corpus path or "
        "document the bound and allowlist): %s" % offenders
    )


def test_allowlist_entries_still_have_global_windows(registry_plans):
    """The allowlist must not rot: if an entry's plan no longer has a
    global window (the op was fixed or the query rerouted), drop it."""
    stale = sorted(
        n for n in GLOBAL_WINDOW_ALLOWED
        if n in registry_plans
        and not _GLOBAL_WINDOW.search(registry_plans[n])
    )
    assert stale == [], "allowlist entries without global windows: %s" % stale
