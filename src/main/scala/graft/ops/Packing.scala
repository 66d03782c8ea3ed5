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

  /** Split each document into overlapping token chunks of `size` with
    * `stride` (< size gives overlap) — the context-window chunking step
    * before tokenizer sharding. Documents shorter than `size` yield one
    * chunk. Emits (idCol, chunk_idx, n_tokens, chunk_md5).
    *
    * Narrow generator: tokens materialize once per row (behind the
    * opaque() barrier — CollapseProject would otherwise inline the
    * split into every slice), chunks explode map-side, no shuffle.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride, s"need 0 < stride <= size")
    val base = df.select(col(idCol),
      graft.functions.ArrayHashes.opaque(TextAnalysis.tokens(col(textCol))).as("w"))
    val nChunks = when(org.apache.spark.sql.functions.size(col("w")) >= size,
      floor((org.apache.spark.sql.functions.size(col("w")) - size)
        .cast("double") / stride).cast("long") + 1L).otherwise(1L)
    base
      .select(col(idCol), col("w"), posexplode(transform(
        sequence(lit(0L), nChunks - 1),
        i => slice(col("w"), (i * stride + 1).cast("int"), lit(size)))).as(Seq("chunk_idx", "cw")))
      .select(col(idCol), col("chunk_idx").cast("long"),
        org.apache.spark.sql.functions.size(col("cw")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("cw"))).as("chunk_md5"))
  }
}
