package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document fingerprints.
  *
  * All pure Column DSL (no UDFs) — every operator is a narrow, codegen'd
  * projection that scales linearly with no shuffle; at 100 TB these run
  * map-side at parquet-scan speed with column pruning (only `text` read).
  */
object TextAnalysis {

  /** Engine-agnostic 6-dp rounding: `round()` half-way behavior differs
    * between engines on exactly-representable .5 boundaries (observed:
    * Spark 0.724062 vs DuckDB 0.724063 on the same double);
    * floor(x·10⁶ + 0.5) is pure IEEE arithmetic and identical anywhere.
    */
  def round6(c: Column): Column = floor(c * 1000000.0 + 0.5) / 1000000.0

  /** Whitespace tokenization (BPE-ish regex boundary). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Type-token ratio: distinct tokens / tokens (lexical diversity). */
  def typeTokenRatio(text: Column): Column = {
    val t = tokens(text)
    round6(size(array_distinct(t)).cast("double") / size(t))
  }

  def avgWordLen(text: Column): Column = {
    val t = tokens(text)
    round6(aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(t))
  }

  /** Punctuation-ish character ratio (quality signal). */
  def punctRatio(text: Column): Column =
    round6((length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))).cast("double")
      / greatest(length(text), lit(1)))

  /** Stopword lists per language — re-exported from the native kernel's
    * single source of truth ([[graft.functions.ArrayHashes.stopwordLangs]]).
    */
  val stopwords: Map[String, Seq[String]] =
    graft.functions.ArrayHashes.stopwordLangs.toMap

  private val langIndex: Map[String, Int] =
    graft.functions.ArrayHashes.stopwordLangs.map(_._1).zipWithIndex.toMap

  def stopwordHits(text: Column, lang: String): Column =
    graft.functions.ArrayHashes.stopword_hits(tokens(text), langIndex(lang))
      .cast("int")

  /** N-gram-heuristic language ID: argmax of stopword-hit counts,
    * 'und' (unknown) when nothing matches; ties resolve to the
    * alphabetically-last language (hits·4 + index encoding). One
    * native token pass ([[graft.functions.ArrayHashes.lang_best]]) —
    * the DSL form re-evaluated the inlined split + an interpreted
    * filter lambda once per language (5 full passes per row).
    */
  def langId(text: Column): Column =
    graft.functions.ArrayHashes.lang_best(tokens(text))

  /** Composite quality score in [0,1]: length, diversity, word shape.
    * Deterministic decimal-free arithmetic (6-dp rounded terms).
    */
  def qualityScore(text: Column): Column = {
    val lenTerm = least(lit(1.0), tokenCount(text).cast("double") / 50.0)
    val ttr = typeTokenRatio(text)
    val wordTerm = least(lit(1.0), avgWordLen(text) / 8.0)
    val punct = punctRatio(text)
    round6(lit(0.4) * lenTerm + lit(0.3) * ttr + lit(0.2) * wordTerm
      + lit(0.1) * (lit(1.0) - punct))
  }

  /** Whole-document fingerprint: hash of whitespace-normalized text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Shingle fingerprint: minimum hash over word n-gram shingles — the
    * single-permutation core of MinHash (see Dedup.minHashSignature).
    */
  def shingles(text: Column, n: Int): Column = shinglesOf(tokens(text), n)

  /** Shingles over an ALREADY-MATERIALIZED token-array column. Callers
    * on a hot path must pass a bound attribute, not `tokens(text)`
    * inline: the lambda references the array once per n-gram element,
    * and an inlined `split` sub-tree is re-evaluated on every reference
    * (measured 6× on the repetition-signal query).
    */
  def shinglesOf(t: Column, n: Int): Column = {
    val count = size(t) - (n - 1)
    when(count > 0,
      transform(sequence(lit(0), count - 1),
        i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*)))
      .otherwise(array(concat_ws(" ", t)))
  }

  /** Native one-pass min-md5 over word n-gram shingles
    * ([[graft.functions.ArrayHashes.shingleMinMd5]]). The previous DSL
    * form (`array_min(transform(shingles(text, n), md5))`) hit the
    * shinglesOf caveat above from INSIDE this helper: the inlined
    * `tokens(text)` sub-tree re-evaluated the full split per lambda
    * element reference — O(len²) per document, measured 24 s on
    * tx3_fingerprint alone at sf0.1 under the noop-timed bench (0.6 s
    * native). Same bytes hashed, same min (unsigned digest order ==
    * lowercase-hex string order), same short-document fallback.
    */
  def shingleFingerprint(text: Column, n: Int = 5): Column =
    graft.functions.ArrayHashes.shingle_min_md5(tokens(text), n)
}
