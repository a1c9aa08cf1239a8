"""Pin the SQL parsers behind tools/audit_topk.py (the top-k cut
determinism audit). Pure string-level checks plus a registry-wide
assertion that every LIMIT-bearing oracle is either probeable
(trailing top-level ORDER BY .. LIMIT) or hand-adjudicated."""

import re
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_ROOT))

from tools.audit_topk import (  # noqa: E402
    ADJUDICATED, key_expr, split_keys, split_trailing_cut,
)
from dask_distributed_vanilla_spark.plans.registry import all_oracles  # noqa: E402


def test_split_trailing_cut_simple():
    base, order_by, n = split_trailing_cut(
        "SELECT a, b FROM t ORDER BY a DESC, b LIMIT 10")
    assert base == "SELECT a, b FROM t "
    assert order_by == "a DESC, b"
    assert n == 10


def test_split_trailing_cut_skips_window_order_by():
    # ORDER BY inside OVER() must not be mistaken for the cut ordering
    sql = ("SELECT id, sum(v) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) "
           "AS run FROM t ORDER BY id LIMIT 1000")
    base, order_by, n = split_trailing_cut(sql)
    assert order_by == "id" and n == 1000
    assert "OVER (ORDER BY ts" in base


def test_split_trailing_cut_none_without_trailing_limit():
    assert split_trailing_cut("SELECT * FROM t ORDER BY a") is None
    assert split_trailing_cut(
        "WITH c AS (SELECT a FROM t ORDER BY a LIMIT 5) SELECT * FROM c") is None


def test_split_keys_paren_aware():
    assert split_keys("f(a, b) DESC, c") == ["f(a, b) DESC", "c"]


def test_key_expr_strips_all_modifiers():
    assert key_expr("pri DESC NULLS LAST") == "pri"
    assert key_expr("a ASC") == "a"
    assert key_expr("coalesce(a, b)") == "coalesce(a, b)"


def test_every_limit_oracle_probeable_or_adjudicated():
    for name, sql in all_oracles().items():
        if not re.search(r"\bLIMIT\s+\d+", sql, re.I):
            continue
        sql = sql.rstrip().rstrip(";")
        parts = split_trailing_cut(sql)
        n_limits = len(re.findall(r"\bLIMIT\b", sql, re.I))
        if parts is None or n_limits > 1:
            assert name in ADJUDICATED, (
                f"{name}: inner LIMIT needs adjudication in tools/audit_topk.py"
            )


def test_split_trailing_cut_word_boundary_on_order():
    # ADVICE r12: an identifier ending in 'order' followed by the token
    # 'by' must not be misparsed as the cut ordering
    assert split_trailing_cut("SELECT preorder by FROM t LIMIT 5") is None
    base, order_by, n = split_trailing_cut(
        "SELECT preorder by FROM t ORDER BY a LIMIT 5")
    assert order_by == "a" and n == 5


def test_adjudicated_entries_not_stale():
    """ADVICE r12: every hand-adjudicated name must still exist in the
    registry and still carry an inner/unprobeable LIMIT -- otherwise
    the adjudication is a stale dict entry adjudicating nothing."""
    oracles = all_oracles()
    for name in ADJUDICATED:
        assert name in oracles, f"{name}: adjudicated but no longer an oracle"
        sql = oracles[name].rstrip().rstrip(";")
        parts = split_trailing_cut(sql)
        n_limits = len(re.findall(r"\bLIMIT\b", sql, re.I))
        assert parts is None or n_limits > 1, (
            f"{name}: adjudication stale -- no inner LIMIT remains"
        )
