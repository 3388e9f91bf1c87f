"""Duplicate-cluster resolution: connected components over near-dup pairs.

LSH (MinHash / SimHash / embedding) emits *pairs*; actually removing
duplicates needs the transitive closure — if A~B and B~C, {A,B,C} is one
cluster and one survivor should be kept. This module computes connected
components with iterative min-label propagation:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Each iteration is one join + one aggregation
(both keyed shuffles, fully distributed); the number of iterations is
bounded by the component diameter, which for near-dup clusters is tiny
(near-cliques — typically 2-3 rounds). ``localCheckpoint`` truncates the
growing lineage each round so the plan stays flat at any scale. This is
the standard Spark formulation (GraphFrames' connected components uses
the same alternating propagation); no driver-side graph is ever built —
the driver only sees the converged/not-converged counter.

The reference has no graph analog; this is the closure step the task
brief's dedup family requires to be usable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 50


def connected_components(
    pairs: DataFrame,
    left_col: str = "doc_a",
    right_col: str = "doc_b",
    id_out: str = "doc_id",
    component_out: str = "component",
    max_iterations: int = MAX_ITERATIONS,
) -> DataFrame:
    """(id, component) for every node in ``pairs``; component = min node
    id reachable, so labels are deterministic and engine-portable.

    Raises ``RuntimeError`` if propagation has not converged after
    ``max_iterations`` rounds (component diameter exceeds the budget) —
    stale labels must never be returned silently."""
    edges = (
        pairs.select(
            F.col(left_col).alias("src"), F.col(right_col).alias("dst")
        )
        .unionByName(
            pairs.select(
                F.col(right_col).alias("src"), F.col(left_col).alias("dst")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(max_iterations):
        # neighbor's current label, folded with own label
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(
                neighbor_min, labels["node"] == neighbor_min["src"], "left"
            )
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (component diameter exceeds the budget); raise "
            "max_iterations"
        )
    return labels.select(
        F.col("node").alias(id_out), F.col("label").alias(component_out)
    )


def dedup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    left_col: str = "doc_a",
    right_col: str = "doc_b",
) -> DataFrame:
    """Doc ids kept after near-dup removal: cluster minima survive,
    all other cluster members drop, unpaired docs pass through.

    One anti-join against the (small: only docs in any pair) loser set —
    the corpus itself is never shuffled.
    """
    comp = connected_components(pairs, left_col, right_col, id_col)
    losers = comp.where(F.col(id_col) != F.col("component")).select(id_col)
    return docs.select(id_col).join(losers, id_col, "left_anti")
