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
    val cents = Similarity.ivfCentroids(corpus, nCentroids, refine, idCol, embCol)
    Bucketing.resetTable(corpus.sparkSession, s"${table}_cents")
    cents.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(s"${table}_cents")
    // assign against the PERSISTED centroids: skips re-running the
    // k-means refinement (a corpus scan + shuffle per pass) and
    // guarantees the lists derive from byte-identical stored centroids
    Bucketing.writeBucketed(
      Similarity.assignToCentroids(corpus,
        corpus.sparkSession.table(s"${table}_cents"), "vec_id", "embedding",
        idCol, embCol),
      table, "cent_id", buckets)
  }

  /** Serve top-k from a persisted IVF index: rank the stored centroids
    * per query (nProbe probes), then scan only the probed stored lists.
    */
  def ivfServe(
      spark: SparkSession, table: String, queries: DataFrame, k: Int, nProbe: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      aggRank: Boolean = true): DataFrame = {
    val cents = spark.table(s"${table}_cents")
    val probes = Similarity.probeCentroids(
      queries, cents, "query_id", "qe", nProbe, idCol, embCol)
    val lists = spark.table(table).select(
      col("vec_id").as("neighbor_id"), col("embedding").as("ce"), col("cent_id"))
    Similarity.rankTopK(broadcast(probes).join(lists, Seq("cent_id")), k, aggRank)
  }
}
