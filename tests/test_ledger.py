"""Attestation-ledger invariants (VERDICT r09 #7).

The ledger folds every driver CORRECTNESS_r*.json into per-query
{last_round, last_verdict}; CI fails if any registry query's last driver
verdict is a fail (and it is not queued for re-attestation in the current
window) or if a never-attested query is missing from both the window and
the generated docs/ATTESTATION_QUEUE.md — exactly the omission that let
events_tier_mix (sole driver row: r1 hash FAIL) hide for 8 rounds.
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from attestation_ledger import (  # noqa: E402
    build_ledger,
    check,
    priority_names,
    registry_names,
    summarize,
    _row_green,
)


def test_row_green_semantics():
    assert _row_green(
        {"rows_match": True, "schema_match": True, "hash_match": True}
    )
    # rows-only checks (no oracle SQL) record hash_match: null -> still green
    assert _row_green(
        {"rows_match": True, "schema_match": True, "hash_match": None}
    )
    assert not _row_green(
        {"rows_match": True, "schema_match": True, "hash_match": False}
    )
    assert not _row_green(
        {"rows_match": True, "schema_match": True, "hash_match": True,
         "err": "boom"}
    )


def test_ledger_folds_latest_round_wins():
    ledger = build_ledger()
    # events_tier_mix's r1 row was a hash FAIL; until it is re-attested the
    # ledger must carry that verdict (or green once a later round lands).
    rec = ledger.get("events_tier_mix")
    assert rec is not None
    assert rec.last_round >= 1
    # scd2_orders has been green in many rounds; latest round must win.
    scd = ledger["scd2_orders"]
    assert scd.last_round == max(scd.rounds_attested)
    assert scd.last_verdict == "green"


def test_no_standing_fail_and_no_hidden_backlog():
    ledger = build_ledger()
    names = registry_names()
    window = priority_names()[:50]
    violations = check(ledger, names, window)
    assert violations == [], "\n".join(violations)


def test_every_registry_query_accounted_for():
    """Every registry query is green, in-window, or explicitly queued."""
    ledger = build_ledger()
    names = registry_names()
    s = summarize(ledger, names)
    # sanity: the fold sees the full driver history
    assert len(s["greens"]) + len(s["fails"]) + len(s["never"]) == len(names)
    assert len(s["greens"]) >= 300
