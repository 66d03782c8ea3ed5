package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph analytics beyond connected components.
  *
  * PageRank here is ENGINE-EXACT by construction: ranks live in
  * integer millionths, per-edge contributions use integer floor
  * division (rank div degree — deterministically losing sub-unit mass
  * instead of accumulating float error), and the damping step is
  * (85·Σ) div 100. Every iteration is therefore a pure integer
  * fixpoint any engine reproduces bit-for-bit — which is what lets a
  * DuckDB oracle certify a 5-line iterative graph algorithm at all.
  * Summation order, the classic float-PageRank nondeterminism, is
  * irrelevant: integer addition commutes exactly.
  *
  * Scale shape per iteration: one join of the rank table against the
  * edge list (shuffle on src), one groupBy(dst) partial-aggregated
  * sum, one left join back to the node set — all keyed, no driver
  * state, lineage cut per iteration (the minLabelComponents pattern).
  */
object Graph {

  /** Fixed-iteration PageRank over an undirected pair list
    * (id_a < id_b, each pair once — the dedup-pair contract). Only
    * edge-incident nodes participate (isolated nodes would all share
    * the base rank). Returns (id, rank) with rank in millionths:
    * rank = 150000 + 850000·(weighted in-neighbor mass).
    */
  def pageRankFixedPoint(pairs: DataFrame, iters: Int): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("degree"))
      .localCheckpoint(true)
    var ranks = deg.select(col("src").as("id"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = ranks.join(deg, ranks("id") === deg("src"))
        .select(col("id"), expr("rank div degree").as("c"))
      val in = edges.join(contrib, edges("src") === contrib("id"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      ranks = deg.select(col("src").as("id"))
        .join(in, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(150000L) + expr("(85 * coalesce(in_sum, 0L)) div 100")).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
