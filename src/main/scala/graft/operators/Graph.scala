package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph analytics over edge-list DataFrames — the link-graph
 * side of corpus curation (domain authority for quality weighting,
 * citation/link ranking). Connected components live in
 * [[Dedup.dupClusters]]; this adds fixed-iteration PageRank.
 */
object Graph {

  /**
   * PageRank, fixed iteration count, simplified model (no dangling-mass
   * redistribution: a node with no out-edges keeps receiving rank but
   * contributes none — on a symmetrized graph dangling nodes cannot
   * exist and total rank is conserved at exactly #nodes per iteration).
   *
   *   r_{t+1}(v) = (1 - damping) + damping * sum_{u->v} r_t(u) / outdeg(u)
   *
   * `symmetrize = true` adds the reverse of every edge (and re-distincts,
   * so a graph already containing both directions is not double-counted)
   * — the undirected form used for bipartite interaction graphs.
   *
   * Scale shape: edges+outdeg are computed ONCE and lazily
   * localCheckpoint'ed (the iteration loop re-reads materialized shuffle
   * blocks, not the upstream plan); each iteration is one shuffled join
   * (ranks onto edge sources) and one aggregation (contributions by
   * destination) — 2 exchanges per iteration, each O(edges), nothing
   * accumulating on the driver and no lineage growth (per-iteration
   * lazy checkpoints, same pattern as Dedup.dupClusters). Hub skew is
   * bounded by max in-degree and lands in the AQE-covered aggregation.
   *
   * Known localCheckpoint trade (as dupClusters): executor loss during
   * the loop loses the checkpoint blocks and fails the job — acceptable
   * for a bounded 5-iteration batch job, rerun on failure.
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, damping: Double = 0.85,
      symmetrize: Boolean = false): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(damping >= 0.0 && damping <= 1.0, "damping must be in [0, 1]")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val e = if (symmetrize)
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    else e0
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // hash-partition the edge table by the iteration join key BEFORE
    // checkpointing: localCheckpoint preserves outputPartitioning, so
    // every iteration's join re-shuffles only the #nodes-row ranks side —
    // the O(edges) side (the whole cost at link-graph scale) stays put
    val withDeg = e.join(deg, "src")
      .repartition(col("src")).localCheckpoint(eager = false)
    // same partition-reuse trick for the rank-update join: nodes sit
    // hash-partitioned on the join key, and contribs arrives already
    // hash-partitioned on dst from its aggregation exchange, so the
    // left join adds NO exchange on either side
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .repartition(col("node")).localCheckpoint(eager = false)
    var ranks = nodes.withColumn("r", lit(1.0))
    for (_ <- 1 to iterations) {
      val contribs = withDeg
        .join(ranks, withDeg("src") === ranks("node"))
        .select(col("dst"), (col("r") / col("outdeg").cast("double")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contribs, nodes("node") === contribs("dst"), "left")
        .select(col("node"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("s"), lit(0.0))).as("r"))
        .localCheckpoint(eager = false)
    }
    ranks
  }
}
