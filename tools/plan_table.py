"""Regenerate the SCALE.md measurements table from live physical plans.

Usage: python tools/plan_table.py   # prints the markdown rows

Columns: query | shuffle Exchanges (broadcast excluded) | has
BroadcastHashJoin | has TakeOrderedAndProject | has WindowGroupLimit |
has an Arrow-batched Python stage.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from movie_rec_spark.plans import (  # noqa: E402
    count_exchanges,
    has_broadcast_join,
    has_top_k,
    has_window_group_limit,
    physical_plan,
)
from movie_rec_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("plan_table")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in E.queries().items():
        df = fn(spark, SF)
        p = physical_plan(df)
        py = "Y" if ("InPandas" in p or "ArrowEval" in p
                     or "EvalPython" in p) else ""
        cells = [
            name, str(count_exchanges(df)),
            "Y" if has_broadcast_join(df) else "",
            "Y" if has_top_k(df) else "",
            "Y" if has_window_group_limit(df) else "",
            py,
        ]
        print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
