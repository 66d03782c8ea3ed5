package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget context windows (the step between dedup/filter
  * and tokenizer sharding in an LLM data pipeline).
  *
  * Greedy contiguous packing: each document lands in the window that
  * the token mass BEFORE it (in pack order) falls into, so windows
  * overflow by at most one document — the deterministic streaming
  * approximation every large pipeline uses (true bin packing is
  * NP-hard and order-destroying).
  *
  * Scale: one shuffle on the partition column, then a sequential
  * running sum within each partition — at corpus scale the partition
  * key is (shard, lang) or similar, so no single window scan exceeds a
  * partition.
  */
object Packing {

  /** Adds `pack_id`: the 0-based window index within `partitionCol`,
    * packing in `orderCol` order against a `budget`-token window.
    */
  def packWindows(df: DataFrame, orderCol: String, nTokensCol: String,
      budget: Int, partitionCol: String): DataFrame = {
    val w = Window.partitionBy(col(partitionCol)).orderBy(col(orderCol))
    df.withColumn("pack_id",
      floor((sum(col(nTokensCol)).over(w) - col(nTokensCol)) / budget.toDouble)
        .cast("long"))
  }
}
