package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Alternating large-star/small-star connected components: agreement
  * with min-label propagation (the two algorithm classes must produce
  * the identical component-minimum labeling) on topologies that stress
  * each one differently.
  */
class StarComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)], n: Long): Map[Long, Long] = {
    val p = pairs.toDF("id_a", "id_b")
    val ids = spark.range(n).select(col("id").as("doc_id"))
    Dedup.alternatingStarComponents(p, ids, "doc_id")
      .as[(Long, Long)].collect().toMap
  }

  private def minLabelOf(pairs: Seq[(Long, Long)], n: Long): Map[Long, Long] = {
    val p = pairs.toDF("id_a", "id_b")
    val ids = spark.range(n).select(col("id").as("doc_id"))
    Dedup.minLabelComponents(p, ids, "doc_id")
      .as[(Long, Long)].collect().toMap
  }

  test("long path collapses to one component (the diameter stressor)") {
    // a 60-node path has diameter 59 — the topology where naive label
    // propagation needs O(diameter) rounds; star contraction must still
    // land every node on the path minimum within its O(log n) budget
    val path = (0L until 59L).map(i => (i, i + 1))
    val got = labelsOf(path, 60)
    assert(got.size == 60)
    assert(got.values.toSet == Set(0L))
  }

  test("agrees with min-label propagation on a mixed random graph") {
    // several components of different shapes: a clique, a star, a path,
    // isolated nodes — generated deterministically
    val clique = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val star = (21L to 25L).map(b => (20L, b))
    val path = (30L until 34L).map(i => (i, i + 1))
    val cross = Seq((14L, 21L)) // merge clique and star components
    val pairs = clique ++ star ++ path ++ cross
    val star_ = labelsOf(pairs, 40)
    val mlp = minLabelOf(pairs, 40)
    assert(star_ == mlp)
    assert(star_(25L) == 10L) // merged clique+star component min
    assert(star_(33L) == 30L)
    assert(star_(5L) == 5L) // isolated → self
  }

  test("empty pair set labels every id as itself") {
    val got = labelsOf(Seq.empty, 5)
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }
}
