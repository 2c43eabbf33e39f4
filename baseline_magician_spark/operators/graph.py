"""Connected components over near-duplicate pair graphs — the dedup
clustering step: pairs from MinHash/Jaccard/embedding candidates become
duplicate CLUSTERS, and one survivor is kept per cluster.

Iterative min-label propagation (the standard large-graph formulation,
cf. the "hash-to-min" family):

    label(v) := min(label(v), min label of v's neighbors)   until fixpoint

Each round is one equi-join (edges x labels, shuffle on node id — a
uniform key) + one groupBy min. Rounds needed = graph diameter, which
for near-dup clusters is tiny (pairs within a cluster are nearly
all-to-all). ``localCheckpoint`` truncates lineage each round so plan
size stays constant; convergence is detected with a count of changed
labels (one action per round — the loop is driver-controlled by
necessity, but all data work is distributed).

The fixpoint is path-independent, so results are deterministic and the
DuckDB oracle (recursive-CTE label closure) must hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rounds used by the most recent connected_components call — the
# pointer-jumping regression signal (tests pin the log-depth bound)
LAST_ROUNDS: int = 0


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """(node, cluster_id) for every node in ``edges``; cluster_id = min
    node id in the component."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    global LAST_ROUNDS
    LAST_ROUNDS = 0
    for _ in range(max_iterations):
        LAST_ROUNDS += 1
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("node").alias("b"), F.col("label").alias("_nl")
                ),
                "b",
            )
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("_nl").alias("_nbr_min"))
        )
        stepped = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("_nbr_min"), F.col("label"))
            ).alias("label"),
        )
        # pointer jumping (path halving): label(v) := label(label(v)).
        # Labels are monotone lower bounds within the component, so the
        # fixpoint is unchanged — but propagation depth halves each
        # round, turning diameter-many rounds into ~log2(diameter).
        # Long Hamming/near-dup CHAINS (A~B~C~...) are exactly the
        # graphs where plain neighbor-min needs diameter rounds.
        ptr = stepped.select(
            F.col("node").alias("_pn"), F.col("label").alias("_pl")
        )
        jumped = stepped.join(
            ptr, stepped["label"] == ptr["_pn"], "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("_pl"), F.col("label"))
            ).alias("label"),
        )
        # lazy checkpoint + count: ONE job materializes the round's
        # labels AND evaluates convergence (eager=True would spend a
        # second job per round just to truncate lineage)
        updated = (
            jumped.join(
                labels.select("node", F.col("label").alias("_old")),
                "node",
            )
            .select(
                "node",
                "label",
                (F.col("label") < F.col("_old")).alias("_changed"),
            )
        ).localCheckpoint(eager=False)
        n_changed = updated.where(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            break
    return labels.select("node", F.col("label").alias("cluster_id"))


def dedup_clusters(
    pairs: DataFrame, id_a: str, id_b: str
) -> DataFrame:
    """Near-dup pairs -> (doc_id, cluster_id, is_survivor); survivor =
    min doc id per cluster (the canonical keep policy)."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("is_survivor"),
    )
