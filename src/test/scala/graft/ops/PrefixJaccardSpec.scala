package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact prefix-filtered Jaccard join: the operator's contract is
  * EXACTNESS — identical output to the naive quadratic join at any
  * threshold — so the spec computes the brute-force answer and demands
  * equality, including pairs exactly AT the threshold boundary.
  */
class PrefixJaccardSpec extends SparkSpec {
  import spark.implicits._

  // tokens are synthetic words; doc 1/2 share 8 of 10 distinct tokens
  // (jaccard exactly 0.8 — the boundary), doc 3 sits just below
  // (8/11 ≈ 0.727), docs 4/5 are identical (1.0), docs 6/7 unrelated,
  // doc 8 is a singleton word
  private lazy val docs = Seq(
    (1L, "t1 t2 t3 t4 t5 t6 t7 t8 a1"),
    (2L, "t1 t2 t3 t4 t5 t6 t7 t8 b1"),
    (3L, "t1 t2 t3 t4 t5 t6 t7 t8 c1 c2 c3"),
    (4L, "x1 x2 x3 x4 x5"),
    (5L, "x1 x2 x3 x4 x5"),
    (6L, "u1 u2 u3 u4 u5 u6"),
    (7L, "v1 v2 v3 v4 v5 v6"),
    (8L, "w1")).toDF("doc_id", "text")

  private def brute(df: DataFrame, threshold: Double): Set[(Long, Long, Double)] = {
    val sets = df.select(col("doc_id"),
      graft.functions.ArrayHashes.shingle_hash_set(
        TextAnalysis.tokens(col("text")), 1).as("wh"))
    val a = sets.select(col("doc_id").as("id_a"), col("wh").as("wa"))
    val b = sets.select(col("doc_id").as("id_b"), col("wh").as("wb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.jaccardSorted(col("wa"), col("wb")).as("j"))
      .filter(col("j") >= threshold)
      .as[(Long, Long, Double)].collect().toSet
  }

  test("matches brute force exactly, including the threshold boundary") {
    val got = Dedup.prefixJaccardPairs(docs, "doc_id", "text", threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val want = brute(docs, 0.8)
    assert(got == want)
    assert(got.contains((1L, 2L, 0.8))) // exactly-at-threshold pair kept
    assert(got.contains((4L, 5L, 1.0)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L)) // 0.727 < 0.8
  }

  test("exactness holds at a loose threshold (larger candidate space)") {
    val got = Dedup.prefixJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == brute(docs, 0.5))
  }

  test("finds every sf0.001 near-dup the quadratic join finds") {
    val real = graft.Tables.load(spark, sfSmoke, "documents")
    val got = Dedup.prefixJaccardPairs(real, "doc_id", "text", threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == brute(real, 0.8))
    assert(got.nonEmpty) // the corpus plants near-dups; exactness must see them
  }
}
