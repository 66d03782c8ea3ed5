package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Persisted ANN index — the index-build vs query-serve split a real
  * vector-search system has. Build pays the hashing/assignment and ONE
  * bucketed shuffle at write time; serving reads the STORED partition
  * column, so:
  *
  *  - a small probe set broadcasts against the pre-partitioned lists
  *    (no corpus shuffle, no re-hashing of the corpus), and
  *  - a LARGE probe table bucketed on the same key joins with ZERO
  *    exchanges on either side (`AnnIndexSpec` pins this) — the shape
  *    for batch kNN over millions of queries, where neither side can
  *    broadcast.
  *
  * LSH buckets ([[Similarity.lshBucket]]) and IVF inverted lists
  * ([[Similarity.ivfCentroids]] + [[Similarity.assignToCentroids]]) are
  * both supported; IVF persists its (tiny) trained centroid table
  * alongside the lists so probe selection at serve time uses the exact
  * build-time centroids.
  */
object AnnIndex {

  /** Deterministic per-dataset table name (managed tables are global to
    * the warehouse, so two datasets must not collide —
    * [[Bucketing.dirSuffix]] is a 48-bit digest, not a 32-bit
    * hashCode, so distinct dataset dirs don't silently share an index).
    */
  def tableFor(kind: String, dir: String): String =
    s"graft_ann_${kind}_${Bucketing.dirSuffix(dir)}"

  /** Build: corpus → (vec_id, embedding, bucket), bucketed+sorted on
    * `bucket` so every serve-side join starts pre-partitioned.
    */
  def buildLsh(
      corpus: DataFrame, table: String, planes: Int, dims: Int, buckets: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): Unit =
    Bucketing.writeBucketed(
      corpus.select(col(idCol).as("vec_id"), col(embCol).as("embedding"),
        Similarity.lshBucket(col(embCol), planes, dims).as("bucket")),
      table, "bucket", buckets)

  /** Serve top-k from a persisted LSH index: probes hash their own
    * bucket on the fly (queries are fresh; the index is not) and join
    * the stored `bucket` column — same results as [[Similarity.lshTopK]]
    * with the corpus-side hashing already paid at build time.
    */
  def lshServe(
      spark: SparkSession, table: String, queries: DataFrame, k: Int,
      planes: Int, dims: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      aggRank: Boolean = true): DataFrame = {
    val c = spark.table(table).select(
      col("vec_id").as("neighbor_id"), col("embedding").as("ce"), col("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("qe"),
      Similarity.lshBucket(col(embCol), planes, dims).as("bucket"))
    Similarity.rankTopK(c.join(broadcast(q), Seq("bucket")), k, aggRank)
  }

  /** Multi-probe serve from the persisted LSH index — the
    * recall-critical variant a production user runs: each query
    * inspects its own bucket plus the `nProbe - 1` lowest-margin
    * bit-flip buckets ([[Similarity.lshProbeBuckets]]), against the
    * STORED corpus buckets. Probe expansion happens on the broadcast
    * query side only; every stored vector still lives in exactly one
    * bucket, so no candidate pair is generated twice, no dedup shuffle
    * is needed, and the index side scans its stored bucketing with no
    * exchange. Results are identical to
    * [[Similarity.lshTopKMultiProbe]] over the same corpus.
    */
  def lshServeMultiProbe(
      spark: SparkSession, table: String, queries: DataFrame, k: Int,
      planes: Int, dims: Int, nProbe: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      aggRank: Boolean = true): DataFrame = {
    val c = spark.table(table).select(
      col("vec_id").as("neighbor_id"), col("embedding").as("ce"), col("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("qe"),
      explode(Similarity.lshProbeBuckets(col(embCol), planes, dims, nProbe))
        .as("bucket"))
    Similarity.rankTopK(c.join(broadcast(q), Seq("bucket")), k, aggRank)
  }

  /** Bucket-co-located batch serve: both sides are bucketed tables on
    * `bucket` with the same bucket count, so the candidate join plans
    * with NO exchange on either side — batch kNN at a scale where the
    * probe set itself is too big to broadcast.
    */
  def lshServeBucketed(
      spark: SparkSession, corpusTable: String, probeTable: String, k: Int,
      aggRank: Boolean = true): DataFrame = {
    val c = spark.table(corpusTable).select(
      col("vec_id").as("neighbor_id"), col("embedding").as("ce"), col("bucket"))
    val q = spark.table(probeTable).select(
      col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
    Similarity.rankTopK(c.join(q, Seq("bucket")), k, aggRank)
  }

  /** Build: trained centroids → per-vector nearest-centroid assignment,
    * lists bucketed+sorted on `cent_id`; the centroid table persists
    * alongside as `<table>_cents`.
    */
  def buildIvf(
      corpus: DataFrame, table: String, nCentroids: Int, refine: Int, buckets: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    val cents = Similarity.ivfCentroids(corpus, nCentroids, refine, idCol, embCol)
    Bucketing.resetTable(spark, s"${table}_cents")
    cents.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(s"${table}_cents")
    // assign against the PERSISTED centroids: skips re-running the
    // k-means refinement (a corpus scan + shuffle per pass) and
    // guarantees the lists derive from byte-identical stored centroids
    val assigned = Similarity.assignToCentroidsWithSim(corpus,
      spark.table(s"${table}_cents"), "vec_id", "embedding", idCol, embCol)
    Bucketing.writeBucketed(assigned.drop("cent_sim"), table, "cent_id", buckets)
    Bucketing.resetTable(spark, s"${table}_drift")
    driftSummary(assigned, "build").write.mode(SaveMode.Overwrite)
      .format("parquet").saveAsTable(s"${table}_drift")
  }

  /** Constant-size mergeable summary of one assignment pass: a 20-bin
    * histogram over the assigned cosine in [-1, 1] plus an EXACT
    * fixed-point similarity sum per bin — two scopes of it (build vs
    * appends) are the whole drift signal, and rows merge by addition,
    * so N appends cost N tiny row-sets, never a re-scan.
    */
  private def driftSummary(assigned: DataFrame, scope: String): DataFrame =
    assigned.select(
        least(floor((col("cent_sim") + lit(1.0d)) * 10).cast("int"), lit(19))
          .as("bin"),
        col("cent_sim"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("cent_sim") * 1000000.0 + 0.5).cast("bigint")).as("sum_fp"))
      .select(lit(scope).as("scope"), col("bin"), col("cnt"), col("sum_fp"))

  /** The data-driven rebuild signal [[appendIvf]]'s no-retrain contract
    * needs: per scope ('build' vs accumulated 'append'), the vector
    * count, mean assigned similarity (exact fixed-point sum ⇒ engine-
    * reproducible), and the 10th-percentile histogram bin. A drifting
    * corpus shows up as the append scope's mean/p10 sliding below the
    * build scope's — compare the two rows and rebuild when the gap
    * crosses your threshold.
    */
  def ivfDriftReport(spark: SparkSession, table: String): DataFrame = {
    val d = spark.table(s"${table}_drift")
    val tot = d.groupBy(col("scope")).agg(
      sum(col("cnt")).as("n_vectors"),
      (sum(col("sum_fp")).cast("double") / sum(col("cnt")) / lit(1000000.0d))
        .as("mean_sim"))
    val byBin = d.groupBy(col("scope"), col("bin")).agg(sum(col("cnt")).as("c"))
    val cum = byBin.withColumn("cum",
      sum(col("c")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("scope")).orderBy(col("bin"))))
    val p10 = cum.join(tot.select(col("scope"), col("n_vectors")), Seq("scope"))
      .filter(col("cum") >= col("n_vectors") * lit(0.1d))
      .groupBy(col("scope")).agg(min(col("bin")).as("p10_bin"))
    tot.join(p10, Seq("scope"))
      .select(col("scope"), col("n_vectors"), col("mean_sim"), col("p10_bin"))
  }

  /** The maintenance decision loop closed over [[ivfDriftReport]] —
    * ann5 emits the signal, this consumes it. Reads the stored
    * constant-size drift summaries (never the corpus); if the append
    * scope's assignment quality has slid below the build scope's by at
    * least `minMeanGap` (mean assigned cosine) OR `minP10Gap`
    * (10th-percentile histogram bins), rebuilds the index in place
    * over its CURRENT stored rows — retrain centroids, reassign every
    * list row, reset the drift table to a fresh 'build' scope — and
    * returns true. Below threshold (or with no appends recorded at
    * all) it touches nothing and returns false, so a maintenance cron
    * can call it unconditionally: the decision costs two rows of
    * drift-table read, and the rebuild fires exactly once per drift
    * episode (the reset clears the 'append' scope that tripped it).
    *
    * The stored rows are materialized (lineage cut) BEFORE the rebuild
    * because [[buildIvf]] drops and rewrites the very table they came
    * from. Same single-writer contract as [[compact]]: a maintenance
    * operation, not safe concurrent with an in-flight append or serve.
    */
  def maybeRebuild(
      spark: SparkSession, table: String,
      minMeanGap: Double, minP10Gap: Int,
      nCentroids: Int, refine: Int, buckets: Int): Boolean = {
    val rep = ivfDriftReport(spark, table).collect()
      .map(r => r.getAs[String]("scope") -> r).toMap
    val drifted = (for { b <- rep.get("build"); a <- rep.get("append") } yield
      b.getAs[Double]("mean_sim") - a.getAs[Double]("mean_sim") >= minMeanGap ||
        b.getAs[Int]("p10_bin") - a.getAs[Int]("p10_bin") >= minP10Gap
    ).getOrElse(false)
    if (drifted) {
      val current = spark.table(table)
        .select(col("vec_id"), col("embedding"))
        .localCheckpoint(true)
      buildIvf(current, table, nCentroids, refine, buckets)
    }
    drifted
  }

  /** Append a new vector batch to a stored LSH index without
    * rebuilding: SRP buckets are a pure function of each vector, so the
    * append is EXACT — append-then-serve ≡ rebuild-over-the-union-
    * then-serve (`AnnIndexSpec` proves row identity). O(|batch|)
    * hashing + one bucketed append per ingest batch.
    */
  def appendLsh(
      batch: DataFrame, table: String, planes: Int, dims: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): Unit =
    Bucketing.appendBucketed(
      batch.select(col(idCol).as("vec_id"), col(embCol).as("embedding"),
        Similarity.lshBucket(col(embCol), planes, dims).as("bucket")),
      table)

  /** Append a new vector batch to a stored IVF index: assign against
    * the STORED trained centroids (no retrain — the standard IVF ingest
    * contract; centroid drift is handled by periodic rebuild, and the
    * WHEN is data-driven: each append also records its
    * assignment-quality summary, so [[ivfDriftReport]] shows the
    * append scope sliding against the build scope), append the list
    * rows. Serve after append ≡ serve over a rebuild that assigns the
    * union against the same centroids.
    */
  def appendIvf(
      batch: DataFrame, table: String,
      idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    val spark = batch.sparkSession
    val assigned = Similarity.assignToCentroidsWithSim(batch,
      spark.table(s"${table}_cents"), "vec_id", "embedding", idCol, embCol)
    Bucketing.appendBucketed(assigned.drop("cent_sim"), table)
    // drift bookkeeping: this batch's assignment-quality summary lands
    // in the 'append' scope (rows merge by addition across appends —
    // ivfDriftReport sums them). Advisory signal, so a plain append
    // suffices; it rides no exactly-once contract.
    driftSummary(assigned, "append").write.mode(SaveMode.Append)
      .format("parquet").saveAsTable(s"${table}_drift")
  }

  /** [[appendIvf]] made VALUE-IDEMPOTENT for replayable streaming-epoch
    * appends ([[graft.streaming.SemanticIngestGate]]): list rows land
    * via [[Bucketing.appendBucketedEpoch]]'s deterministic
    * (epochKey, bucket) file names, so a replayed epoch replaces its
    * own files instead of duplicating them. The advisory drift summary
    * is intentionally NOT written here — a replay would double-count
    * its bins; epoch-driven ingest reads drift from periodic
    * [[appendIvf]]-path maintenance instead.
    */
  def appendIvfEpoch(
      batch: DataFrame, table: String, epochKey: String,
      idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    val spark = batch.sparkSession
    val assigned = Similarity.assignToCentroids(batch,
      spark.table(s"${table}_cents"), "vec_id", "embedding", idCol, embCol)
    Bucketing.appendBucketedEpoch(assigned, table, epochKey)
  }

  /** Append a new vector batch to a stored IVF×PQ index: assignment
    * against the stored centroids, encoding against the stored
    * codebooks — the batch's floats are read once here and never at
    * serve time, like [[buildIvfPq]].
    */
  def appendIvfPq(
      batch: DataFrame, table: String, m: Int, dims: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    val spark = batch.sparkSession
    val assigned = Similarity.assignToCentroids(batch,
        spark.table(s"${table}_cents"), "neighbor_id", "ce", idCol, embCol)
      .select(col("neighbor_id"), col("cent_id"))
    val codes = Similarity.pqEncode(batch,
        spark.table(s"${table}_cb"), "neighbor_id", m, dims, idCol, embCol)
      .groupBy(col("neighbor_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub_id"), col("code")))),
        x => x.getField("code")).as("codes"))
    Bucketing.appendBucketed(
      assigned.join(codes, Seq("neighbor_id"))
        .select(col("cent_id"), col("neighbor_id"), col("codes")),
      table)
  }

  /** Maintenance hook: fold an append-accumulated serving index back to
    * one file per bucket. The list table is the only bucketed half
    * (`_cents`/`_cb` are tiny write-once artifacts that appends never
    * touch); all three index kinds (LSH / IVF / IVF×PQ) store their
    * lists in `table`, so one hook serves them all. Serve-safe (the
    * versioned pointer flip — concurrent reads see pre- or post-compact
    * rows, never partial state); see [[Bucketing.compactTable]] for the
    * crash choreography. Appends stay single-writer with compaction.
    */
  def compact(spark: SparkSession, table: String): Unit =
    Bucketing.compactTable(spark, table)

  /** Build the composed IVF×PQ serving index — at 100 TB the PQ codes
    * and codebooks ARE the index: float vectors are touched here (IVF
    * assignment, codebook training, encoding) and never again at serve
    * time. Persists:
    *
    *  - `<table>_cents`: trained IVF centroids (tiny),
    *  - `<table>_cb`: trained PQ sub-codebooks (m·codebookK rows),
    *  - `table`: the inverted lists WITH the codes inline —
    *    (cent_id, neighbor_id, codes[m] ordered by sub_id),
    *    bucketed+sorted on `cent_id` — so one stored-list scan yields
    *    both the candidate set and the bytes to score it.
    */
  def buildIvfPq(
      corpus: DataFrame, table: String, nCentroids: Int, refine: Int,
      m: Int, dims: Int, codebookK: Int, refinePq: Int, buckets: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    val cents = Similarity.ivfCentroids(corpus, nCentroids, refine, idCol, embCol)
    Bucketing.resetTable(spark, s"${table}_cents")
    cents.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(s"${table}_cents")
    val cb = Similarity.pqCodebooks(corpus, m, dims, codebookK, refinePq, idCol, embCol)
    Bucketing.resetTable(spark, s"${table}_cb")
    cb.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(s"${table}_cb")
    // assignment + encoding both run against the PERSISTED artifacts so
    // the lists/codes derive from byte-identical stored trained state
    val assigned = Similarity.assignToCentroids(corpus,
        spark.table(s"${table}_cents"), "neighbor_id", "ce", idCol, embCol)
      .select(col("neighbor_id"), col("cent_id"))
    val codes = Similarity.pqEncode(corpus,
        spark.table(s"${table}_cb"), "neighbor_id", m, dims, idCol, embCol)
      .groupBy(col("neighbor_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub_id"), col("code")))),
        x => x.getField("code")).as("codes"))
    Bucketing.writeBucketed(
      assigned.join(codes, Seq("neighbor_id"))
        .select(col("cent_id"), col("neighbor_id"), col("codes")),
      table, "cent_id", buckets)
  }

  /** Serve top-k from the persisted IVF×PQ index: probe selection runs
    * against the stored centroids, ADC scoring against the stored codes
    * through the query's broadcast LUT (stored codebooks) — the
    * full-precision corpus vectors are never read. Results are
    * row-identical to [[Similarity.ivfPqTopK]] with the same
    * parameters; the rank tail is the bounded-heap aggregator
    * (`score6` is an exact ≤2⁵³ fixed-point long, so the double
    * round-trip through the aggregator is lossless).
    */
  def ivfPqServe(
      spark: SparkSession, table: String, queries: DataFrame, k: Int,
      nProbe: Int, m: Int, dims: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      aggRank: Boolean = true): DataFrame = {
    val cents = spark.table(s"${table}_cents")
    val probes = Similarity.probeCentroids(
        queries, cents, "query_id", "qe", nProbe, idCol, embCol)
      .select(col("query_id"), col("cent_id"))
    val lut = Similarity.pqLut(queries,
      spark.table(s"${table}_cb"), "query_id", m, dims, idCol, embCol)
    val cand = spark.table(table).join(broadcast(probes), Seq("cent_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        posexplode(col("codes")).as(Seq("sub_id", "code")))
    val scored = cand.join(broadcast(lut), Seq("query_id", "sub_id", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("q6")).as("score6"))
    if (aggRank)
      scored.groupBy(col("query_id"))
        .agg(graft.functions.TopK.topKByScore(k)(
          col("score6").cast("double"), col("neighbor_id")).as("tk"))
        .select(col("query_id"), explode(col("tk")).as("t"))
        .select(col("query_id"), col("t._1").as("neighbor_id"),
          col("t._2").cast("long").as("score6"), col("t._3").as("rank"))
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("score6").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    }
  }

  /** Serve top-k from a persisted IVF index: rank the stored centroids
    * per query (nProbe probes), then scan only the probed stored lists.
    */
  def ivfServe(
      spark: SparkSession, table: String, queries: DataFrame, k: Int, nProbe: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      aggRank: Boolean = true): DataFrame = {
    val lists = spark.table(table).select(
      col("vec_id").as("neighbor_id"), col("embedding").as("ce"), col("cent_id"))
    ivfServeFrames(spark.table(s"${table}_cents"), lists, queries, k, nProbe,
      idCol, embCol, aggRank)
  }

  /** [[ivfServe]] over pre-resolved (optionally cached) index frames —
    * the hot-serve entry point: a serving tier that pins the index
    * snapshot in memory calls this per batch and skips catalog
    * resolution + parquet scanning entirely. `cents` must be the
    * `<table>_cents` table; `lists` must already be projected to
    * (neighbor_id, ce, cent_id).
    */
  def ivfServeFrames(
      cents: DataFrame, lists: DataFrame, queries: DataFrame, k: Int, nProbe: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      aggRank: Boolean = true): DataFrame = {
    val probes = Similarity.probeCentroids(
      queries, cents, "query_id", "qe", nProbe, idCol, embCol)
    Similarity.rankTopK(broadcast(probes).join(lists, Seq("cent_id")), k, aggRank)
  }
}
