"""Measure Z-order data skipping on plain parquet (sources/layout.py).

Writes sf0.1 orders twice — natural insertion order vs Morton-ordered
on (o_custkey, epoch-day(o_orderdate)) — with small row groups, then
counts, via parquet footer statistics (pyarrow, no Spark scan), how
many row groups a 2-D box predicate CANNOT skip. The ratio is the
data-skipping win a 100 TB store gets for rectangle queries that
directory partitioning (one column only) cannot serve.

Usage: python tools/zorder_demo.py [sf_dir]   # prints the numbers
"""

from __future__ import annotations

import glob
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from movie_rec_spark.session import get_spark  # noqa: E402
from movie_rec_spark.sources.catalog import load_table  # noqa: E402
from movie_rec_spark.sources.layout import write_zordered  # noqa: E402

CUST_LO, CUST_HI = 4000, 5000        # box predicate: customer band ...
DAY_LO, DAY_HI = 10227, 10257        # ... x one month (1998-01) of epoch days


def candidate_row_groups(path: str) -> tuple[int, int]:
    """(row groups whose [min,max] intersect the box, total row groups)
    from parquet footers only."""
    import pyarrow.parquet as pq

    cand = total = 0
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            g = md.row_group(rg)
            sc = g.column(idx["o_custkey"]).statistics
            sd = g.column(idx["_day"]).statistics
            if (sc.min <= CUST_HI and sc.max >= CUST_LO
                    and sd.min <= DAY_HI and sd.max >= DAY_LO):
                cand += 1
    return cand, total


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("zorder_demo")
    spark.sparkContext.setLogLevel("ERROR")
    orders = load_table(spark, sf, "orders").withColumn(
        "_day", F.datediff(F.to_date("o_orderdate"),
                           F.lit("1970-01-01").cast("date")).cast("long"))
    small_groups = {"parquet.block.size": 64 * 1024}
    natural = "/tmp/zorder_demo/natural"
    w = orders.repartitionByRange(8, "o_orderkey")
    wr = w.write.mode("overwrite")
    for k, v in small_groups.items():
        wr = wr.option(k, v)
    wr.parquet(natural)
    zpath = "/tmp/zorder_demo/zorder"
    write_zordered(orders, zpath, "o_custkey", "_day", n_files=8,
                   row_group_bytes=64 * 1024)  # same 64 KB groups as the
                                               # natural-order control
    cn, tn = candidate_row_groups(natural)
    cz, tz = candidate_row_groups(zpath)
    print(f"natural order : {cn}/{tn} row groups match the box")
    print(f"z-ordered     : {cz}/{tz} row groups match the box")
    print(f"skipping win  : {cn / max(cz, 1):.1f}x fewer candidates")


if __name__ == "__main__":
    main()
