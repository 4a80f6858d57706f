"""Shared structural plan guards for scale-safety tests.

One walker, imported by every test that pins the "no full-cardinality
unpartitioned window" contract (q_importance_threshold,
assign_dense_ids_scalable, and any future two-pass operator) — the
subtree-span logic and the Spark plan-JSON field names live here once.
"""

from __future__ import annotations

import json


def assert_no_unpartitioned_fullcardinality_window(df) -> None:
    """Walk the optimized logical plan and assert the two-pass scale
    contract: every Window node with an EMPTY partition spec must sit
    above an Aggregate (its input is bounded histogram/offset cells,
    never raw rows), and every row_number window (the per-key ranker
    over full-cardinality rows) must carry a partition spec."""
    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())

    def span(i):  # pre-order flat list -> index one past node i's subtree
        j = i + 1
        for _ in range(nodes[i]["num-children"]):
            j = span(j)
        return j

    saw_partitioned_rownum = False
    for i, n in enumerate(nodes):
        if not n.get("class", "").endswith("logical.Window"):
            continue
        exprs = json.dumps(n.get("windowExpressions", ""))
        if "RowNumber" in exprs:
            assert n.get("partitionSpec"), \
                "row_number over full-cardinality rows must be " \
                "key-partitioned"
            saw_partitioned_rownum = True
        if not n.get("partitionSpec"):
            sub = nodes[i + 1:span(i)]
            assert any(c.get("class", "").endswith("logical.Aggregate")
                       for c in sub), \
                "unpartitioned window consumes un-aggregated rows"
    assert saw_partitioned_rownum, \
        "expected at least one key-partitioned row_number window"
