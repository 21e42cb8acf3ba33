"""Keep/delete decisions over duplicate clusters (W2, D1-D3, K3-K4).

Semantics (cites into /root/reference/duplicate_finder/duplicate_finder.py):
* keep-first: rank-1 member (urls ascending) kept, rest deleted (:302-309).
* interactive mode (:353-425) becomes DATA: a ``keep_overrides(cluster_id,
  keep_url)`` table; NULL keep_url means the group was skipped (empty
  input at the prompt, :380-383). Absent override → default keep-first.
* dry-run (:317-319): decisions are always materialized; the destructive
  step only runs when delete_duplicates ∧ ¬dry_run ∧ assume_yes — the
  confirmation gate (:91-108) is the explicit ``assume_yes`` flag.
* the delete itself (:322 ``unlink``) is an anti-join rewrite of the
  source table (Iceberg MERGE…DELETE when the catalog supports it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decide(clusters: DataFrame,
           keep_overrides: DataFrame | None = None) -> DataFrame:
    """(cluster_id, url, rank) → + action ∈ {keep, delete, skip} + reason.

    Default: rank==1 keeps (deterministic keep-first). With an override
    row: the named url keeps; members of a NULL-keep_url cluster all skip.
    """
    df = clusters
    if keep_overrides is None:
        return df.withColumn(
            "action", F.when(F.col("rank") == 1, "keep").otherwise("delete")
        ).withColumn(
            "reason", F.when(F.col("rank") == 1, "rank-1 keep-first")
                       .otherwise("duplicate of rank-1"))

    ov = F.broadcast(keep_overrides.select(
        "cluster_id", "keep_url", F.lit(True).alias("_has_ov")))
    joined = df.join(ov, "cluster_id", "left")
    has_override = F.col("keep_url").isNotNull()
    skipped = F.col("_has_ov").isNotNull() & F.col("keep_url").isNull()
    action = (F.when(skipped, "skip")
               .when(has_override & (F.col("url") == F.col("keep_url")), "keep")
               .when(has_override, "delete")
               .when(F.col("rank") == 1, "keep")
               .otherwise("delete"))
    reason = (F.when(skipped, "cluster skipped by override")
               .when(has_override & (F.col("url") == F.col("keep_url")),
                     "kept by override")
               .when(has_override, "deleted by override")
               .when(F.col("rank") == 1, "rank-1 keep-first")
               .otherwise("duplicate of rank-1"))
    return joined.withColumn("action", action) \
                 .withColumn("reason", reason).drop("keep_url", "_has_ov")


def decision_summary(decisions: DataFrame) -> DataFrame:
    """A5 totals: rows + bytes per action (ref :305-307,328-329)."""
    return (decisions.groupBy("action")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("size").alias("total_bytes")))


def apply_delete(pages: DataFrame, decisions: DataFrame,
                 delete_duplicates: bool, dry_run: bool,
                 assume_yes: bool, url_col: str = "url") -> DataFrame:
    """K4: destructive rewrite — survivors only. Gated three ways
    (delete flag, dry-run default ON, explicit yes ≙ D3 gate).

    Returns the surviving pages DataFrame; caller owns the write. With an
    Iceberg catalog this becomes ``MERGE INTO pages USING to_delete ON
    url WHEN MATCHED THEN DELETE`` at the same call site.

    Scale note: the anti-join's delete side is deletes-only — typically
    a small fraction of the corpus — so AQE downgrades it to a broadcast
    anti-join when it fits; the full table never shuffles in that case.
    """
    if not delete_duplicates or dry_run or not assume_yes:
        return pages  # decisions table is the only output (dry-run parity)
    to_delete = decisions.filter(F.col("action") == "delete").select(url_col)
    return pages.join(to_delete, url_col, "left_anti")


def keep_best(members: DataFrame, score_col: str,
              higher_is_better: bool = True,
              cluster_col: str = "cluster_id",
              id_col: str = "url") -> DataFrame:
    """Score-aware survivor selection: per cluster, keep the member
    with the best ``score_col`` (ties → smallest ``id_col``), delete
    the rest.

    The quality-first generalization of ``decide``'s keep-first rule
    (reference :302-309 keeps the lexicographically first path;
    RefinedWeb/CCNet-style pipelines instead keep the longest or
    highest-quality member of a near-dup cluster — pass e.g. a char
    count, a quality_score, or a classifier probability). One window
    exchange on ``cluster_col``; deterministic for any score since the
    id tie-break totally orders members — the same engine-invariance
    contract as every other decision path.
    """
    direction = F.desc(score_col) if higher_is_better else F.asc(score_col)
    from pyspark.sql import Window
    w = Window.partitionBy(cluster_col).orderBy(direction, F.asc(id_col))
    rk = F.row_number().over(w)
    return (members.withColumn("_r", rk)
            .withColumn("action",
                        F.when(F.col("_r") == 1, "keep")
                         .otherwise("delete"))
            .withColumn("reason",
                        F.when(F.col("_r") == 1,
                               F.lit(f"best {score_col} in cluster"))
                         .otherwise(F.lit(f"outscored on {score_col}")))
            .drop("_r"))
