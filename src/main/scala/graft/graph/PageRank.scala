package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic integer PageRank over an undirected similarity graph —
  * the representativeness/centrality score a curation pipeline uses to
  * pick CANONICAL documents out of near-duplicate neighborhoods (the
  * doc every template page copies ranks highest) and to weight cluster
  * exemplars for inspection. Fixed iteration count, all-integer
  * arithmetic, so the scores — not just the ranking — reproduce
  * bit-for-bit on any engine: the same engine-exactness contract as the
  * q127 logistic regression, applied to iterative graph propagation.
  *
  * Semantics (micro units, `dampPpm` out of 1e6):
  *   - r0(v) = 1e6 for every node;
  *   - each round, a node with degree d > 0 sends `r div d` (floored)
  *     along every incident edge;
  *   - r'(v) = (1e6 − dampPpm) + (dampPpm · Σ inflow) div 1e6.
  * Isolated nodes hold the teleport base after round 1; mass lost to
  * flooring and degree-0 nodes is dropped (the standard dangling-mass
  * simplification), stated rather than hidden. Overflow headroom: the
  * damped inflow product stays inside a BIGINT until a single node's
  * inflow exceeds ~1e13 micro — a weighted in-degree of ten million
  * average-rank neighbors; bounded-degree similarity graphs (kNN edges,
  * capped near-dup spanning edges) sit orders of magnitude below.
  *
  * Scale shape: the directed edge list (2·|E| rows, ids-only) is
  * checkpointed ONCE with its degree column and reused every round;
  * each round is one edge-keyed join against the (id, rank) frame, one
  * map-side-combinable sum keyed on the destination, and one left join
  * back to the node skeleton — all shuffles key on node id, so rounds
  * reuse the same hash partitioning, and the rank frame is
  * checkpointed per round so the iterative plan never grows (the
  * [[graft.dedup.Dedup]] connected-components discipline). The edge
  * SOURCE is the caller's choice by signature: exact Jaccard pairs at
  * gate scale (oracle-checkable), the persisted kNN edge store or
  * cluster-collapse spanning edges at corpus scale.
  */
object PageRank {

  /** @param nodes one row per node (`idCol` — every id that should be
    *              scored, including isolated ones)
    * @param edges undirected DISTINCT pairs (`id_a`, `id_b`), id_a ≠
    *              id_b; edges with an endpoint absent from `nodes` are
    *              DROPPED before degree computation (the graph scored
    *              is exactly the one induced on `nodes`)
    * @return (`idCol`, `degree`, `pr_micro`) — degree 0 and the
    *         teleport-base rank for isolated nodes
    */
  def pageRank(
      nodes: DataFrame,
      idCol: String,
      edges: DataFrame,
      iters: Int,
      dampPpm: Long): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampPpm >= 0 && dampPpm <= 1000000,
      s"dampPpm must be in [0, 1e6], got $dampPpm")
    val basePpm = 1000000L - dampPpm
    val skeletonKeys = nodes.select(col(idCol).as("_k"))
    // Clamp edges to the node skeleton BEFORE degrees: an endpoint
    // absent from `nodes` would otherwise inflate its neighbors'
    // divisors while never sending (it has no rank row) — a violated
    // contract would deflate inflow quietly. Two ids-only semi-joins,
    // paid once (the result is what gets checkpointed); when the
    // contract holds the plan drops nothing and the output is
    // unchanged.
    val clamped = edges
      .join(skeletonKeys, edges("id_a") === col("_k"), "left_semi")
      .join(skeletonKeys, edges("id_b") === col("_k"), "left_semi")
    // both directions from ONE scan of the clamped edge list (a
    // self-union would evaluate the two semi-joins twice — the
    // connectedComponents explode precedent)
    val bi = clamped.select(explode(array(
        struct(col("id_a").as("_src"), col("id_b").as("_dst")),
        struct(col("id_b").as("_src"), col("id_a").as("_dst")))).as("_e"))
      .select(col("_e._src").as("_src"), col("_e._dst").as("_dst"))
    val deg = bi.groupBy(col("_src")).agg(count(lit(1)).as("_deg"))
    // (src, dst, deg(src)) — materialized once, read every round
    val adj = graft.util.Blocks.lazyCheckpoint(bi.join(deg, Seq("_src")))
    val skeleton = nodes.select(col(idCol).as("_node"))
    var r = skeleton.select(col("_node"), lit(1000000L).as("_r"))
    for (_ <- 1 to iters) {
      val inflow = adj
        .join(r, adj("_src") === r("_node"))
        .select(col("_dst"), expr("_r div _deg").as("_contrib"))
        .groupBy(col("_dst"))
        .agg(sum(col("_contrib")).as("_inflow"))
      r = graft.util.Blocks.lazyCheckpoint(
        skeleton
          .join(inflow, skeleton("_node") === inflow("_dst"), "left")
          .select(col("_node"),
            (lit(basePpm) +
              expr(s"($dampPpm * coalesce(_inflow, 0L)) div 1000000"))
              .as("_r")))
    }
    r.join(deg, r("_node") === deg("_src"), "left")
      .select(col("_node").as(idCol),
        coalesce(col("_deg"), lit(0L)).as("degree"),
        col("_r").as("pr_micro"))
  }
}
