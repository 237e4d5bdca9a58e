"""Iterative graph operators over edge DataFrames.

Connected components is the clustering primitive behind near-duplicate
grouping (the reference deduplicates row-by-row in pandas and never forms
components; this is the distributed formulation a 100 TB corpus needs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "a", dst: str = "b",
                         max_rounds: int = 64) -> DataFrame:
    """Connected components by min-label propagation with pointer jumping.

    Output: (node, label) for every node with at least one edge; label is
    the minimum node id of its component.

    Plain min-propagation moves the minimum label ONE hop per round, so it
    needs O(diameter) rounds — not O(log diameter). The pointer-jumping
    step each round (label <- label(label)) roughly doubles the reach,
    giving O(log diameter) convergence; a 1000-hop chain closes in ~10
    rounds. The loop runs until a fixed point; if `max_rounds` is ever hit
    the function RAISES instead of returning silently fragmented clusters
    (the failure mode a capped loop would hide).

    Per round: one join+groupBy on narrow (node, label) pairs, one
    pointer-jump self-join, one convergence anti-check; the (symmetrized)
    edge set is localCheckpointed once and reused, labels are
    localCheckpointed per round to cut the growing lineage.
    """
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionByName(edges.select(F.col(dst).alias("a"),
                                     F.col(src).alias("b"))))
    sym = sym.localCheckpoint()
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    for _ in range(max_rounds):
        neigh = (sym.join(labels, sym["b"] == labels["node"])
                 .groupBy(F.col("a").alias("node2"))
                 .agg(F.min("label").alias("nlabel")))
        new = (labels.join(neigh, labels["node"] == neigh["node2"], "left")
               .select("node",
                       F.least(F.col("label"),
                               F.coalesce("nlabel", F.col("label"))).alias("label")))
        # pointer jump: adopt the label of the node my label points to —
        # labels only decrease and stay inside the component, so this is
        # safe and doubles how far the minimum travels per round
        jump = new.select(F.col("node").alias("jnode"),
                          F.col("label").alias("jlabel"))
        new = (new.join(jump, new["label"] == jump["jnode"], "left")
               .select("node",
                       F.coalesce("jlabel", F.col("label")).alias("label")))
        new = new.localCheckpoint()
        changed = (new.select("node", F.col("label").alias("l_new"))
                   .join(labels.select("node", F.col("label").alias("l_old")),
                         "node")
                   .filter(F.col("l_new") != F.col("l_old")))
        converged = changed.isEmpty()
        labels = new
        if converged:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds; "
        "a component's diameter exceeds the pointer-jumping reach — raise "
        "max_rounds (silent fragmentation is never returned)")


def connected_components_two_phase(edges: DataFrame, src: str = "a",
                                   dst: str = "b",
                                   max_rounds: int = 32) -> DataFrame:
    """Connected components by large-star/small-star alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the algorithm built for the regime where min-label
    propagation with pointer jumping (connected_components above)
    starts to hurt: each round here is two edge-list rewrites whose
    shuffle volume is bounded by |E| (never a node's full neighborhood
    assembled in one task beyond a groupBy min), edges MOVE toward the
    component minimum instead of labels diffusing over a static edge
    set, and convergence is O(log^2 n) rounds with monotone progress.

    large-star(u): every neighbor v > u re-attaches to m(u) =
    min(neighborhood of u, u). small-star(u): every neighbor v <= u
    (and u itself) attaches to m(u). Alternating the two is
    correctness-preserving (each rewrite keeps the same connectivity)
    and terminates in a forest of stars: every node then points
    directly at its component's minimum id.

    Output: (node, label) for every node with at least one edge —
    identical contract to connected_components, so the two are
    interchangeable and cross-checkable. Raises if max_rounds is hit
    (silent fragmentation is never returned).
    """
    e = (edges.select(F.col(src).cast("long").alias("u"),
                      F.col(dst).cast("long").alias("v"))
         .filter(F.col("u") != F.col("v"))
         .select(F.greatest("u", "v").alias("u"),
                 F.least("u", "v").alias("v"))
         .distinct()
         .localCheckpoint())
    nodes = (e.select(F.col("u").alias("node"))
             .unionByName(e.select(F.col("v").alias("node")))
             .distinct().localCheckpoint())

    def star(cur: DataFrame, large: bool) -> DataFrame:
        sym = (cur.select("u", "v")
               .unionByName(cur.select(F.col("v").alias("u"),
                                       F.col("u").alias("v"))))
        m = (sym.groupBy("u")
             .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        att = sym.join(m, "u")
        if large:
            out = (att.filter(F.col("v") > F.col("u"))
                   .select(F.col("v").alias("a"), F.col("m").alias("b")))
        else:
            out = (att.filter(F.col("v") <= F.col("u"))
                   .select(F.col("v").alias("a"), F.col("m").alias("b"))
                   .unionByName(m.select(F.col("u").alias("a"),
                                         F.col("m").alias("b"))))
        return (out.filter(F.col("a") != F.col("b"))
                .select(F.greatest("a", "b").alias("u"),
                        F.least("a", "b").alias("v"))
                .distinct())

    for _ in range(max_rounds):
        nxt = star(star(e, large=True), large=False).localCheckpoint()
        stable = (nxt.subtract(e).isEmpty() and e.subtract(nxt).isEmpty())
        e = nxt
        if stable:
            # star forest: u (non-root) -> v (root). Roots label
            # themselves; the left join covers isolated-after-rewrite
            # roots that appear only on the v side.
            lab = e.groupBy(F.col("u").alias("node")) \
                   .agg(F.min("v").alias("label"))
            return (nodes.join(lab, "node", "left")
                    .select("node",
                            F.coalesce("label", F.col("node"))
                            .alias("label")))
    raise RuntimeError(
        f"two-phase CC did not converge in {max_rounds} rounds — "
        "raise max_rounds (silent fragmentation is never returned)")


def bounded_sssp(edges: DataFrame, seed_pred: Column,
                 max_hops: int) -> DataFrame:
    """Bounded-hop weighted shortest paths by Bellman-Ford relaxation.

    `edges` is a DIRECTED (a, b, w) frame (pass both directions for an
    undirected graph); `seed_pred` selects seed rows by their `a` column;
    the result is one row per (seed, node) reachable within `max_hops`
    edges, with the min path cost over such paths — exactly the
    depth-guarded recursive-CTE enumeration, but with one row per (seed,
    node) carried between rounds instead of one row per PATH, which is
    what makes it runnable on graphs whose path count explodes.

    Per round: one frontier-x-edges equi-join shuffle on the node key and
    a min-aggregate sharing that partitioning; the frame is
    localCheckpoint'd so the plan stays flat across rounds. Early exit
    when a round improves nothing (a bounded driver-side count — control
    flow, not data); sound because relaxation is monotone: a no-improve
    round implies all later rounds are no-improve.
    """
    if max_hops < 1:
        raise ValueError(
            f"max_hops must be >= 1, got {max_hops} — the initial frame "
            "already encodes 1-hop seed distances, so smaller bounds "
            "cannot be honored")
    dist = (edges.filter(seed_pred)
            .select(F.col("a").alias("seed"), F.col("b").alias("node"),
                    F.col("w").cast("long").alias("cost"))
            .groupBy("seed", "node").agg(F.min("cost").alias("cost"))
            .localCheckpoint())
    for _ in range(max_hops - 1):
        relaxed = (dist.join(edges, dist["node"] == edges["a"])
                   .select("seed", F.col("b").alias("node"),
                           (F.col("cost") + F.col("w")).alias("cost")))
        nd = (dist.unionByName(relaxed)
              .groupBy("seed", "node").agg(F.min("cost").alias("cost"))
              .localCheckpoint())
        improved = nd.join(dist, ["seed", "node", "cost"],
                           "left_anti").count()
        dist = nd
        if improved == 0:
            break
    return dist
