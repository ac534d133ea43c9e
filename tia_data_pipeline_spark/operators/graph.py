"""Hierarchy / thread-traversal operators (SURVEY op `self-join-tree`,
full-closure form).

The reference stores one level of reply hierarchy (``comments.parent``,
``init_db_tables.sh:52``); real thread reconstruction needs the
transitive closure. Two engine forms:

- :func:`thread_closure` — iterative frontier expansion (one
  distributed join per level, driver loop terminates on empty
  frontier). Depth of a comment thread is small (tens), so the loop
  count is bounded and each level is a plain equi-join the planner
  broadcasts/shuffles as usual.
- Spark 4 recursive CTEs (``WITH RECURSIVE``) express the same thing
  declaratively — used by the contract oracle and available via
  ``spark.sql`` (see ``plans/relational.py::q_thread_closure``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def thread_closure(
    df: DataFrame,
    id_col: str,
    parent_col: str,
    *,
    max_depth: int = 50,
) -> DataFrame:
    """(id, root_id, depth) for every node of a parent/child forest.

    Roots are rows with NULL parent (depth 0, root_id = id). Each
    iteration joins the remaining children onto the current frontier.
    ``max_depth`` guards against cycles (a cycle's nodes simply never
    resolve, matching SQL recursive-CTE semantics under a depth cap).
    """
    nodes = df.select(F.col(id_col).alias("_id"), F.col(parent_col).alias("_parent")).distinct()
    roots = nodes.filter(F.col("_parent").isNull()).select(
        F.col("_id"), F.col("_id").alias("root_id"), F.lit(0).alias("depth")
    )
    children = nodes.filter(F.col("_parent").isNotNull())

    levels = [roots]
    frontier = roots
    for _ in range(max_depth):
        # rename frontier cols: children and frontier share lineage on
        # the first iteration (both from `nodes`) and Spark rejects the
        # ambiguous self-join otherwise
        f_r = frontier.select(
            F.col("_id").alias("_fid"), F.col("root_id").alias("_froot"), F.col("depth").alias("_fdepth")
        )
        nxt = children.join(f_r, children["_parent"] == f_r["_fid"]).select(
            "_id",
            F.col("_froot").alias("root_id"),
            (F.col("_fdepth") + 1).alias("depth"),
        )
        # localCheckpoint keeps the per-level lineage flat so plan size
        # doesn't grow geometrically with depth.
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        levels.append(nxt)
        frontier = nxt
    out = reduce(lambda a, b: a.unionByName(b), levels)
    return out.select(F.col("_id").alias(id_col), "root_id", "depth")
