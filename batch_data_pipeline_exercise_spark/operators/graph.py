"""Connected components for dedup clustering.

Near-duplicate detection emits PAIRS (LSH/SimHash candidates); an actual
dedup pipeline must then group pairs into CLUSTERS and keep one canonical
document per cluster — transitively: if A~B and B~C, then {A,B,C} is one
cluster even though (A,C) never scored. That closure is connected
components over the pair graph.

Algorithm: min-label propagation (the Pregel/GraphX form) — every vertex
repeatedly adopts the smallest component id among itself and its
neighbors, converging in O(cluster diameter) rounds. Dedup graphs are
piles of near-cliques (diameter ≲ 3), so a handful of rounds suffices;
for adversarial long-chain graphs at 100 TB the published
large-star/small-star alternation (Kiveris et al., "Connected Components
in MapReduce and Beyond") halves path lengths per round and drops in
here unchanged — same (id, comp) contract.

Each round is two shuffles (join + groupBy-min). The per-round
``localCheckpoint`` truncates the otherwise exponentially-growing lineage
and pins convergence checks to materialized state; the convergence count
is one scalar action per round — the standard shape for iterative graph
processing on Spark, NOT a driver-side data loop (no row ever reaches
the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(id, comp) with ``comp`` = the smallest vertex id reachable from
    ``id`` — deterministic, engine-independent labels.

    ``vertices`` (one ``id_col`` column) adds isolated vertices, which
    come back as their own singleton components; omitted, only vertices
    incident to an edge are labeled. Raises if ``max_iter`` rounds don't
    converge (pass a larger bound for long-chain graphs)."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=False)  # reused every round — pin it
    if vertices is None:
        nodes = sym.select(F.col("a").alias(id_col)).distinct()
    else:
        nodes = vertices.select(id_col).distinct()
    labels = nodes.select(id_col, F.col(id_col).alias("comp")).localCheckpoint()

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.select(F.col(id_col).alias("b"), F.col("comp").alias("__nc")), "b")
            .groupBy("a")
            .agg(F.min("__nc").alias("__nmin"))
        )
        new_labels = (
            labels.join(nbr_min.withColumnRenamed("a", id_col), id_col, "left")
            .select(id_col, F.least("comp", F.coalesce("__nmin", "comp")).alias("comp"))
            .localCheckpoint()
        )
        changed = (
            labels.select(id_col, F.col("comp").alias("__old"))
            .join(new_labels, id_col)
            .filter(F.col("__old") != F.col("comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("id1", "id2"),
) -> DataFrame:
    """Cluster near-dup pairs transitively: (id_col, cluster) where
    ``cluster`` is the cluster's smallest member id — the canonical
    document to KEEP; every row with ``cluster != id`` is a duplicate to
    drop. Documents in no pair form singleton clusters."""
    labels = connected_components(pairs, all_ids, id_col=id_col, src=pair_cols[0], dst=pair_cols[1])
    return labels.withColumnRenamed("comp", "cluster")
