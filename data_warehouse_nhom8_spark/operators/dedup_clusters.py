"""Duplicate clustering + canonical selection (SURVEY.md §2k X2 —
the final step of corpus near-dedup).

Pair detectors (MinHash/SimHash/embedding) emit edges; dedup must
drop *clusters*: if A~B and B~C, then {A,B,C} is one group even when
A~C was never emitted. That's connected components, computed here by
iterative min-label propagation in pure DataFrame ops:

  label(v) ← min(label(v), min over neighbours(label(u)))

repeated until no label changes. Each iteration is one join + one
aggregate (shuffles on the vertex id); iterations needed = graph
diameter (near-dup clusters are shallow — a handful of rounds). The
driver-side loop only controls iteration count; all data stays
distributed, and convergence is checked with a cheap count.

`dedup_keep_canonical` then keeps the lowest-id member per cluster —
deterministic, matching exact_dedup's min-id convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every vertex in `pairs`; component = min id
    reachable. Deterministic for a given edge set.

    Raises RuntimeError if labels are still changing after `max_iter`
    rounds (a component with diameter > max_iter would otherwise be
    silently split and dedup would keep extra duplicates). Rounds
    needed = graph diameter; near-dup clusters are shallow, so hitting
    the cap means the edge set is not the graph you expected — raise
    the cap explicitly rather than trusting a truncated answer."""
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .unionByName(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
        # materialize once: edges often sit on an expensive detector
        # pipeline (MinHash etc.) that must not re-run every iteration
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    converged = False
    for _ in range(max_iter):
        # truncate lineage each round — without this the plan doubles
        # per iteration; stays distributed (no driver collect)
        updated = _propagation_round(edges, labels).localCheckpoint(eager=True)
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), on="id")
            .filter(F.col("u.component") < F.col("l.component"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "a component has diameter > max_iter — raise max_iter"
        )
    return labels


def _propagation_round(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """ONE min-label propagation round — split out (r15, VERDICT r14
    task 3) so the plan audit can inspect the per-round physical plan
    the memoized cluster stores hide: one equi-join on the vertex id
    + one partial-aggregated min, then a left join-back; no cartesian
    anywhere, and the caller localCheckpoints the result to keep the
    next round's plan flat."""
    neighbour_min = (
        edges.join(labels, edges["b"] == labels["id"])
        .groupBy(F.col("a").alias("id"))
        .agg(F.min("component").alias("nmin"))
    )
    return labels.join(neighbour_min, on="id", how="left").select(
        "id",
        F.least(
            F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
        ).alias("component"),
    )


def dedup_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop every non-canonical member of each duplicate cluster:
    keeps rows not in any pair, plus the min-id member per component."""
    comp = connected_components(pairs, id_a, id_b)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")
