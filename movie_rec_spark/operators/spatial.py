"""Spatial radius join — grid-cell blocking with exact verification.

The geo analogue of the LSH/blocking discipline every other near-dup
operator in this engine follows: a naive radius join is the quadratic
cross product; the scale form snaps every point to a ``cell_size``
grid cell, generates candidates only among points whose cells are
ADJACENT (one side explodes its 3×3 cell neighborhood — each candidate
pair arises exactly once because the other side keeps its single real
cell), and verifies the exact distance inside the candidate set. With
cell_size = radius, any within-radius pair is guaranteed to live in
adjacent cells, so recall is exactly 1.0 — blocking changes COST, not
answers, and the declared oracle is the naive all-pairs join to prove
it.

Scale shape: one equi-join keyed on the cell id — shuffle volume is
9×|points| rows on the exploded side plus |points| on the probe side;
per-cell candidate work tracks local density (the skew knob is the
cell size), never |corpus|². This is the standard geohash/S2-cell
pattern; coordinates here are synthesized deterministically from
event ids (integer arithmetic → bit-identical doubles on every
engine) since the test tables carry no geo columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPATIAL_RADIUS = 1.0   # join radius; cell_size = radius → exact recall
SPATIAL_SAMPLE_MOD = 20  # event_id % MOD == 0 plays the point set
_GRID = 10000  # coordinate lattice: md5-derived ints over [0, 100)^2


def _md5_coord(col, lo: int, hi: int):
    """Hex digits [lo, hi) of md5(pid) as a bigint — the stable_bucket
    primitive; genuinely pseudo-random (a multiplicative-congruential
    synthesis spreads points into a low-discrepancy lattice with NO
    close pairs, making a radius join vacuous)."""
    return F.conv(F.substring(
        F.md5(col.cast("string").cast("binary")), lo, hi - lo),
        16, 10).cast("long")


def event_points(events: DataFrame,
                 sample_mod: int = SPATIAL_SAMPLE_MOD) -> DataFrame:
    """Deterministic synthetic (x, y) per sampled event."""
    pid = F.col("event_id")
    return (events.filter(pid % sample_mod == 0)
            .select(
                pid.alias("pid"),
                ((_md5_coord(pid, 1, 9) % _GRID) / 100.0).alias("x"),
                ((_md5_coord(pid, 9, 17) % _GRID) / 100.0).alias("y")))


def radius_join(points: DataFrame,
                radius: float = SPATIAL_RADIUS) -> DataFrame:
    """All pairs within ``radius`` (Euclidean), via grid-cell blocking
    + exact verify. Output (pid_a, pid_b, dist2) with pid_a < pid_b;
    dist2 rounded to 6dp before the threshold compare so the boundary
    is engine-deterministic."""
    cell = radius
    p = points.select(
        "pid", "x", "y",
        F.floor(F.col("x") / cell).alias("cx"),
        F.floor(F.col("y") / cell).alias("cy"))
    offsets = F.expr(
        "explode(array(" + ",".join(
            f"struct({dx}L as dx, {dy}L as dy)"
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)) + "))")
    a = p.select(
        F.col("pid").alias("pid_a"), F.col("x").alias("xa"),
        F.col("y").alias("ya"), "cx", "cy",
        offsets.alias("o")
    ).select(
        "pid_a", "xa", "ya",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"))
    b = p.select(
        F.col("pid").alias("pid_b"), F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jx"), F.col("cy").alias("jy"))
    d2 = F.round(
        (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
        + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")), 6)
    return (
        a.join(b, ["jx", "jy"])
        .filter(F.col("pid_a") < F.col("pid_b"))
        .select("pid_a", "pid_b", d2.alias("dist2"))
        .filter(F.col("dist2") <= F.lit(radius * radius))
    )


def q_spatial_join(events: DataFrame) -> DataFrame:
    """Declared query: grid-blocked radius join over the synthesized
    point set; the oracle is the NAIVE all-pairs distance join, so
    exact agreement proves cell blocking is answer-preserving (same
    proof shape as q_triangles vs its naive oracle)."""
    return radius_join(event_points(events))
