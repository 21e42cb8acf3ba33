"""Report renderers (K1/K2/K3) — driver-side over the tiny final tables.

Format parity with the reference's report sink
(duplicate_finder.py:257-295): each group prints a header
``Group i/N (k file(s), size: <humanized>)`` followed by its members,
members sorted (W1, :246-248). The deletion report mirrors
``Deleted:`` / ``[would delete]`` lines (:342-351,418-425) as rows of
the decisions table rendered to text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duplicate_finder_spark.config import humanize_size


def render_groups(clusters: DataFrame, ordered_cluster_ids=None) -> str:
    """clusters(cluster_id, url, size, rank) → reference-style report text.

    Only ever called on the final (small) clusters table; collection here
    is the reporting tail, not a dataflow stage.
    """
    rows = (clusters
            .groupBy("cluster_id")
            .agg(F.sort_array(F.collect_list("url")).alias("members"),
                 F.max("size").alias("doc_size"),
                 F.count("*").alias("k"))
            .orderBy("cluster_id")
            .collect())
    if ordered_cluster_ids is not None:
        order = {cid: i for i, cid in enumerate(ordered_cluster_ids)}
        rows = sorted(rows, key=lambda r: order.get(r["cluster_id"], 1 << 30))
    n = len(rows)
    lines: list[str] = [f"Found {n} duplicate group(s):", ""]
    for i, r in enumerate(rows, 1):
        lines.append(f"Group {i}/{n} ({r['k']} file(s), "
                     f"size: {humanize_size(r['doc_size'])})")
        lines.extend(f"  {u}" for u in r["members"])
        lines.append("")
    return "\n".join(lines)


def render_decisions(decisions: DataFrame, dry_run: bool = True) -> str:
    """decisions(url, action, …) → Deleted:/[would delete]/skip lines."""
    rows = (decisions.filter(F.col("action").isin("delete", "skip"))
            .orderBy("cluster_id", "url")
            .select("url", "action").collect())
    out = []
    for r in rows:
        if r["action"] == "skip":
            out.append(f"Skipped: {r['url']}")
        elif dry_run:
            out.append(f"[would delete] {r['url']}")
        else:
            out.append(f"Deleted: {r['url']}")
    return "\n".join(out)
