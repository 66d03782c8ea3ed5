package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRankFixedPoint(pairs.toDF("id_a", "id_b"), iters)
      .as[(Long, Long)].collect().toMap

  test("star graph: the hub outranks every leaf") {
    val star = (1L to 6L).map(l => (0L, l))
    val r = ranks(star, iters = 3)
    val hub = r(0L)
    assert((1L to 6L).forall(l => r(l) < hub), s"hub $hub vs $r")
    // leaves are symmetric → identical integer ranks
    assert((1L to 6L).map(r).toSet.size == 1)
  }

  test("path symmetry: mirrored nodes get identical integer ranks") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val r = ranks(path, iters = 4)
    assert(r(0L) == r(4L))
    assert(r(1L) == r(3L))
    assert(r(2L) >= r(1L))
  }

  test("total rank mass stays near n (floor-division loss only shrinks it)") {
    val clique = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val r = ranks(clique, iters = 3)
    val total = r.values.sum
    assert(total <= 5L * 1000000L)
    assert(total > (5L * 1000000L * 95L) / 100L, s"lost too much mass: $total")
  }
}
