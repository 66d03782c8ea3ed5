package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-dup pair blocking (round 16: two-chunk 16-bit keys for
  * maxDist ≤ 2): the contract is EXACTNESS of the verified output —
  * blocking may only ever change the candidate set, never the result —
  * so the spec demands equality with the brute-force quadratic Hamming
  * join, on both the planted fixture and the real sf0.001 corpus, on
  * both the two-chunk (maxDist ≤ 2) and single-chunk (maxDist = 3)
  * paths.
  */
class SimHashPairsSpec extends SparkSpec {
  import spark.implicits._

  private def brute(df: DataFrame, maxDist: Int): Set[(Long, Long, Int)] = {
    val sims = df.select(col("doc_id").as("id"),
      Dedup.simHash32(col("text")).as("sh"))
    val a = sims.select(col("id").as("id_a"), col("sh").as("sa"))
    val b = sims.select(col("id").as("id_b"), col("sh").as("sb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.hamming(col("sa"), col("sb")).cast("int").as("h"))
      .filter(col("h") <= maxDist)
      .as[(Long, Long, Int)].collect().toSet
  }

  private def got(df: DataFrame, maxDist: Int): Set[(Long, Long, Int)] =
    Dedup.simHashNearDupPairs(df, "doc_id", "text", maxDist)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int"))
      .as[(Long, Long, Int)].collect().toSet

  // identical docs (hamming 0), light edits (small hamming), unrelated
  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta"),
    (3L, "alpha beta gamma delta epsilon zeta eta iota"),
    (4L, "alpha beta gamma delta epsilon zeta kappa iota"),
    (5L, "totally different content about spark engines and shuffles"),
    (6L, "another unrelated document with its own words entirely"),
    (7L, "w1")).toDF("doc_id", "text")

  test("two-chunk blocking (maxDist=2) matches brute force exactly") {
    assert(got(docs, 2) == brute(docs, 2))
    assert(got(docs, 2).exists(_._3 == 0)) // identical pair present
  }

  test("maxDist=1 and maxDist=0 stay exact on the two-chunk path") {
    assert(got(docs, 1) == brute(docs, 1))
    assert(got(docs, 0) == brute(docs, 0))
  }

  test("single-chunk path (maxDist=3) unchanged and exact") {
    assert(got(docs, 3) == brute(docs, 3))
  }

  test("matches brute force on the real sf0.001 corpus at maxDist=2") {
    val real = graft.Tables.load(spark, sfSmoke, "documents")
    val g = got(real, 2)
    assert(g == brute(real, 2))
    assert(g.nonEmpty) // the corpus plants near-dups; blocking must see them
  }
}
