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

  /** Harmonic SHELF packing — the bin-packing answer with a provable
    * no-overflow guarantee that [[packWindows]]' streaming
    * approximation trades away: items are grouped into capacity
    * classes k = ⌊budget / n_tokens⌋ (every item in class k fits k per
    * bin, since its length ≤ budget/k), ranked within their class, and
    * assigned bin ⌊(rank−1)/k⌋. Every bin's total is ≤ budget BY
    * CONSTRUCTION, and every full bin is more than half full
    * (k items, each > budget/(k+1) ⇒ fill > k/(k+1) ≥ ½) — the
    * classic harmonic-shelf bound, deterministic end to end.
    *
    * Items LONGER than the budget get k = 0 and a bin of their own
    * (truncation is the tokenizer's decision, not the packer's).
    *
    * Scale: the per-class rank is [[Ranking.withGroupedRank]]'s grouped
    * zipWithIndex — one range exchange + O(P+G)-row offset metadata,
    * no single-task window even when one length class dominates (at a
    * 2048 budget, real corpora concentrate in a handful of classes).
    * Output: df + (cap_class, shelf_rank, bin_idx).
    */
  def shelfPack(df: DataFrame, idCol: String, nTokensCol: String,
      budget: Int): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    val withClass = df.withColumn("cap_class",
      floor(lit(budget.toLong) / col(nTokensCol)).cast("long"))
    Ranking.withGroupedRank(withClass, "cap_class", "shelf_rank",
        Seq(col(nTokensCol), col(idCol)))
      .withColumn("bin_idx",
        when(col("cap_class") > 0,
          floor((col("shelf_rank") - 1).cast("double") / col("cap_class")))
          .otherwise(col("shelf_rank") - 1).cast("long"))
  }

  /** Deterministic weighted interleaving of sources — materializes the
    * global training order that realizes a mixture: the i-th row of
    * source s is scheduled at virtual time vt = i / w_s (start-time
    * fair queueing's schedule), so EVERY prefix of the vt order holds
    * sources in proportion to their weights — the property epoch-level
    * mixture sampling only gives in expectation, made exact and
    * deterministic (no rand(), replays bit-identically).
    *
    * `weights` is one row per source: (sourceCol, w6) with w6 the
    * millionth-quantized relative weight (only ratios matter — feed
    * temperature/mixture weights from [[graft.ops.Stats]] unnormalized).
    * vt = rank·10⁶ / w6 runs two exact IEEE steps (the product is exact
    * below 2⁵³, the division is correctly rounded), so the schedule is
    * engine-exact; order by (vt, sourceCol, src_rank) for the total
    * order. The per-source rank is [[Ranking.withGroupedRank]] — no
    * single-task window even when one source dominates the corpus.
    * Sources absent from `weights` are DROPPED (inner join) — give
    * every source a weight, or the omission silently filters.
    * Output: df + (src_rank, vt).
    */
  def interleaveByWeight(
      df: DataFrame, sourceCol: String, sort: Seq[org.apache.spark.sql.Column],
      weights: DataFrame): DataFrame =
    Ranking.withGroupedRank(df, sourceCol, "src_rank", sort)
      .join(broadcast(weights), Seq(sourceCol))
      .withColumn("vt", col("src_rank").cast("double") * 1000000.0 / col("w6"))

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

  /** Per-source token-budget snapshot — the Pile/Dolma-style corpus
    * construction where each source contributes AT MOST `budget(source)`
    * tokens, taken in a deterministic priority order: a document is
    * kept iff its whole token count still fits when its turn comes,
    * and the source TRUNCATES at the first document that does not fit
    * (the hard-cut semantics a reproducible data recipe wants — greedy
    * skip-and-continue would make the kept set depend on every later
    * document's size).
    *
    * Plan: exclusive per-source running token sums via
    * [[Ranking.withGroupedPrefixSum]] (the range-partitioned
    * zipWithIndex scheme — NO per-source single-task window, so a
    * source holding half the corpus still cuts in parallel), one
    * broadcast join against the |sources|-row budget table, one filter.
    * Sources absent from `budgets` are DROPPED (inner join) — budget
    * every source or the omission silently filters. `sort` must
    * total-order within a source. Output: df + (tokens_before) for the
    * kept documents.
    */
  def tokenBudgetCut(
      df: DataFrame, sourceCol: String, nTokensCol: String,
      sort: Seq[org.apache.spark.sql.Column], budgets: DataFrame): DataFrame =
    Ranking.withGroupedPrefixSum(df, sourceCol, col(nTokensCol),
        "tokens_before", sort)
      .join(broadcast(budgets), Seq(sourceCol))
      .filter(col("tokens_before") + col(nTokensCol) <= col("budget"))
      .drop("budget")

  /** Epoch UPSAMPLING — [[tokenBudgetCut]]'s other half: when a
    * source's token budget EXCEEDS its unique tokens, the
    * data-constrained-scaling recipe (Muennighoff et al., 2023)
    * REPEATS the source — up to `maxEpochs` (≈4) passes read nearly as
    * well as fresh data, beyond that returns decay — rather than
    * letting a big source fill the gap. Materialized as rows: per
    * source, epochs6 = clamp(budget·10⁶ ÷ n_tokens, 10⁶, maxEpochs·10⁶)
    * (exact integer division — engine-identical); every doc emits
    * ⌊epochs6/10⁶⌋ full copies (`epoch_idx` 1…full) plus one extra
    * copy selected by the deterministic md5-prefix doc hash at the
    * fractional rate (epochs6 mod 10⁶) — the mx3 hash-Bernoulli, so
    * the realized corpus holds ≈ budget tokens per source and re-runs
    * agree row-for-row. Every doc appears at least once (epochs
    * clamps at 1 — cutting below one pass is [[tokenBudgetCut]]'s
    * job, not this op's).
    *
    * Plan: one count shuffle, a broadcast |sources|-row rate join,
    * one narrow `explode(sequence(…))` — flat at any corpus size (the
    * explode multiplies rows by ≤ maxEpochs + 1, a constant).
    *
    * Output: df + (epochs6, epoch_idx). `budgets` = (sourceCol,
    * budget) as in tokenBudgetCut; sources absent from it are dropped.
    */
  def epochUpsample(
      df: DataFrame, sourceCol: String, idCol: String, nTokensCol: String,
      budgets: DataFrame, maxEpochs: Int = 4): DataFrame = {
    require(maxEpochs >= 1, "maxEpochs must be at least 1")
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(col(nTokensCol)).cast("long").as("__nt"))
      .join(broadcast(budgets), Seq(sourceCol))
      // `div` (integral division), NOT `/`: Spark's / returns DOUBLE,
      // and budget·10⁶ can exceed 2⁵³ where doubles stop being exact
      .select(col(sourceCol),
        least(lit(maxEpochs * 1000000L),
          greatest(lit(1000000L),
            expr(s"CAST(budget AS BIGINT) * 1000000 div __nt")))
          .as("epochs6"))
    val extra = when(pmod(Dedup.hash32(
        concat_ws("|", lit("up"), col(idCol).cast("string"))),
      lit(1000000L)) < col("epochs6") % 1000000L, 1L).otherwise(0L)
    df.join(broadcast(totals), Seq(sourceCol))
      .withColumn("__rep", expr("epochs6 div 1000000") + extra)
      .select(col("*"), explode(sequence(lit(1L), col("__rep"))).as("epoch_idx"))
      .drop("__rep")
  }
}
