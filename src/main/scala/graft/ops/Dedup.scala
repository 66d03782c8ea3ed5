package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design (the point of each operator):
  *  - exact: one hash-groupBy — a single shuffle on a 32-byte key, the
  *    cheapest possible full-corpus dedup at 100 TB.
  *  - MinHash+LSH: signatures are narrow map-side work; candidate
  *    generation joins on band keys so the pair space is O(collisions),
  *    never O(n²); verification runs only on banded candidates.
  *  - SimHash: pure Column DSL (array aggregates) — a narrow projection,
  *    zero shuffle until the band-key self-join.
  *  - All hashes derive from md5 prefixes so results are reproducible in
  *    any engine (and against the DuckDB oracle) — no engine-private
  *    hash functions in semantics-bearing positions.
  */
object Dedup {

  /** 32-bit hash from an md5 prefix (engine-portable, deterministic). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  // ---- exact dedup -------------------------------------------------------

  /** Exact duplicate groups: content hash → survivor (min id) + count. */
  def exactDupGroups(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(text).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup: keep the minimum id per normalized-content hash. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val groups = exactDupGroups(df, col(idCol), col(textCol))
      .select(col("keep_id").as(idCol))
    df.join(groups, Seq(idCol), "left_semi")
  }

  // ---- MinHash + LSH -----------------------------------------------------

  /** K-permutation MinHash signature over distinct word shingles. */
  def minHashSignature(text: Column, k: Int): Column = {
    val words = array_distinct(TextAnalysis.tokens(text))
    val sig = (0 until k).map { i =>
      array_min(transform(words, w => hash32(concat(lit(i), lit("|"), w))))
    }
    array(sig: _*)
  }

  /** LSH band keys: bands of `r` signature rows, hashed with the band
    * index so bands never collide across positions.
    */
  def lshBandKeys(sig: Column, bands: Int, r: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|",
        lit(b) +: (0 until r).map(j => element_at(sig, b * r + j + 1)): _*))
    }: _*)

  /** Word-set Jaccard similarity. */
  def jaccard(a: Column, b: Column): Column = {
    val ia = array_distinct(a)
    val ib = array_distinct(b)
    round(size(array_intersect(ia, ib)).cast("double") /
      size(array_union(ia, ib)), 6)
  }

  /** MinHash-LSH near-duplicate pairs: banded candidates verified with
    * exact Jaccard ≥ threshold. Output: (id_a, id_b, jaccard).
    */
  def minHashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, bands: Int = 2, threshold: Double = 0.9): DataFrame = {
    val r = k / bands
    val sigs = df.select(
      col(idCol).as("id"),
      array_distinct(TextAnalysis.tokens(col(textCol))).as("words"),
      lshBandKeys(minHashSignature(col(textCol), k), bands, r).as("band_keys"))
    val banded = sigs.select(col("id"), col("words"),
      explode(col("band_keys")).as("band_key"))
    val a = banded.select(col("band_key"), col("id").as("id_a"), col("words").as("wa"))
    val b = banded.select(col("band_key"), col("id").as("id_b"), col("words").as("wb"))
    a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("wa"), col("wb")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  // ---- SimHash -----------------------------------------------------------

  /** 32-bit SimHash over distinct words — bit j is the sign of the sum of
    * ±1 contributions from each word's hash bit j. Pure array
    * expressions: narrow, shuffle-free.
    */
  def simHash32(text: Column): Column = {
    val hashes = transform(array_distinct(TextAnalysis.tokens(text)), w => hash32(w))
    val bits = (0 until 32).map { j =>
      val bitSum = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(bitSum > 0, shiftleft(lit(1L), j)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: candidates share one of 4 8-bit chunks
    * (standard simhash blocking), verified by Hamming ≤ maxDist.
    */
  def simHashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 2): DataFrame = {
    val withSim = df.select(col(idCol).as("id"), simHash32(col(textCol)).as("simhash"))
    val chunked = withSim.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        concat_ws(":", lit(c), shiftright(col("simhash"), c * 8).bitwiseAND(255))): _*))
        .as("chunk_key"))
    val a = chunked.select(col("chunk_key"), col("id").as("id_a"), col("simhash").as("sa"))
    val b = chunked.select(col("chunk_key"), col("id").as("id_b"), col("simhash").as("sb"))
    a.join(b, Seq("chunk_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sa"), col("sb")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
