"""Regression tests for the rotation planner's debt accounting — the
round-7 verdict's What's-wrong #1 was exactly this logic under-counting
(stale `no_oracle` rows treated as settled, prefixes padded with
already-green queries while hash-checkable debt remained)."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "sample_debt",
    os.path.join(os.path.dirname(__file__), "..", "dev", "sample_debt.py"),
)
sample_debt = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(sample_debt)


class _Q:
    def __init__(self, oracle):
        self.oracle = oracle


def _row(err=None, rows=1, hash_match=True, rows_match=True, schema_match=True):
    return {
        "err": err,
        "spark_rows": rows,
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": hash_match,
    }


def test_stale_no_oracle_with_oracle_now_is_debt():
    reg = {"q": _Q(oracle="SELECT 1")}
    last = sample_debt.scan_rows(
        {3: {"q": _row(err="no_oracle", hash_match=None, rows_match=None, schema_match=None)}}
    )
    never, reds, stale = sample_debt.classify(reg, last, {"q": "m"})
    assert not never and not reds
    assert [n for n, _ in stale] == ["q"]


def test_stale_no_oracle_without_oracle_is_not_debt():
    reg = {"q": _Q(oracle=None)}  # rows-only by design (Bernoulli)
    last = sample_debt.scan_rows(
        {3: {"q": _row(err="no_oracle", hash_match=None, rows_match=None, schema_match=None)}}
    )
    _, reds, stale = sample_debt.classify(reg, last, {"q": "m"})
    assert not reds and not stale


def test_hash_proof_survives_later_weaker_row():
    # r2 hash-matched; r5 recorded a weaker rows-only row (e.g. the
    # oracle was scale-skipped that round) — the query is NOT debt
    reg = {"q": _Q(oracle="SELECT 1")}
    last = sample_debt.scan_rows(
        {
            2: {"q": _row()},
            5: {"q": _row(err="no_oracle", hash_match=None, rows_match=None, schema_match=None)},
        }
    )
    _, reds, stale = sample_debt.classify(reg, last, {"q": "m"})
    assert not reds and not stale


def test_red_row_is_red_even_with_oracle():
    reg = {"q": _Q(oracle="SELECT 1")}
    last = sample_debt.scan_rows({4: {"q": _row(hash_match=False)}})
    _, reds, stale = sample_debt.classify(reg, last, {"q": "m"})
    assert [n for n, _ in reds] == ["q"] and not stale


def test_never_sampled_grouped_by_module():
    reg = {"a": _Q("SELECT 1"), "b": _Q(None)}
    never, reds, stale = sample_debt.classify(reg, {}, {"a": "m1", "b": "m2"})
    assert never == {"m1": ["a"], "m2": ["b"]} and not reds and not stale


def test_crash_row_is_red():
    reg = {"q": _Q(oracle="SELECT 1")}
    last = sample_debt.scan_rows(
        {6: {"q": {"err": "Traceback ...", "spark_rows": None}}}
    )
    _, reds, _ = sample_debt.classify(reg, last, {"q": "m"})
    assert [n for n, _ in reds] == ["q"]
