"""Unit tests for the exchange-shape audit's pure classification
logic (the full registry scan runs as a tool, not in the suite)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from audit_exchanges import (  # noqa: E402
    KNOWN_TWO_SIDED,
    count_duplicate_arrow_evals,
    count_text_key_exchanges,
    status_for,
)


def test_double_shingle_exchange_flagged():
    plan = (
        "Exchange hashpartitioning(shingle#9, 32)\n"
        "... SortMergeJoin ...\n"
        "Exchange hashpartitioning(shingle#42, 32)\n"
    )
    assert count_text_key_exchanges(plan) == {"shingle": 2}


def test_single_exchange_and_non_text_keys_pass():
    plan = (
        "Exchange hashpartitioning(shingle#9, 32)\n"
        "Exchange hashpartitioning(o_orderkey#3L, 32)\n"
        "Exchange hashpartitioning(o_orderkey#7L, 32)\n"
    )
    # one shingle exchange is the fixed DSIR shape; FK keys are the
    # ordinary relational shape and are out of scope by design
    assert count_text_key_exchanges(plan) == {}


def test_expression_id_suffixes_collapse_to_one_family():
    plan = (
        "Exchange hashpartitioning(token#101, 32)\n"
        "Exchange hashpartitioning(token#2087, 32)\n"
        "Exchange hashpartitioning(tok#3, 32)\n"
    )
    assert count_text_key_exchanges(plan) == {"token": 2}


def test_duplicate_arrow_eval_same_invocation_flagged():
    plan = (
        "(10) ArrowEvalPython\n"
        "Arguments: [_seq_cosine_kernel(q_vec#6, c_vec#9)#16], [pythonUDF0#20], 200\n"
        "(14) ArrowEvalPython\n"
        "Arguments: [_seq_cosine_kernel(q_vec#31, c_vec#34)#41], [pythonUDF0#45], 200\n"
    )
    # same kernel, same columns (expression IDs differ) = the
    # optimizer-duplication shape
    assert count_duplicate_arrow_evals(plan) == {
        "_seq_cosine_kernel(q_vec, c_vec)": 2
    }


def test_same_kernel_different_columns_is_legitimate():
    plan = (
        "(10) ArrowEvalPython\n"
        "Arguments: [_seq_cosine_kernel(q_vec#6, brute_vec#9)#16], [pythonUDF0#20], 200\n"
        "(14) ArrowEvalPython\n"
        "Arguments: [_seq_cosine_kernel(q_vec#31, lsh_vec#34)#41], [pythonUDF0#45], 200\n"
    )
    assert count_duplicate_arrow_evals(plan) == {}


def test_status_precedence_known_then_measured_then_unexplained():
    assert status_for("dup_span_fraction", set()) == "known-two-sided"
    assert "dup_span_fraction" in KNOWN_TWO_SIDED
    assert status_for("some_new_query", {"some_new_query"}) == "sf10-measured"
    assert status_for("some_new_query", set()) == "UNEXPLAINED"
