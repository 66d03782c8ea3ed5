package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hll estimate is within ~10% of truth at 10k distinct (m=256 -> ~6.5% rse)") {
    val d = (1 to 10000).map(_.toLong).toDF("v")
    val row = Sketches.hllDistinct(d, col("v")).collect().head
    val est = row.getAs[Double]("hll_estimate")
    assert(math.abs(est - 10000.0) / 10000.0 < 0.10, s"estimate $est")
    assert(row.getAs[Long]("buckets_used") == 256L)
  }

  test("hll is insensitive to duplicates") {
    val once = (1 to 500).map(_.toLong).toDF("v")
    val thrice = ((1 to 500) ++ (1 to 500) ++ (1 to 500)).map(_.toLong).toDF("v")
    val a = Sketches.hllDistinct(once, col("v")).collect().head.getDouble(0)
    val b = Sketches.hllDistinct(thrice, col("v")).collect().head.getDouble(0)
    assert(a == b)
  }

  test("quantizeInt8 digest: max-magnitude element maps to ±127") {
    val d = Seq((1L, Array(0.5f, -1.0f, 0.25f)), (2L, Array(0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.quantizeInt8(d, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // q = round(127 * v / 1.0) = (64, -127, 32): sum -31, min -127, max 64
    assert(out(1L) == ((1.0, -31L, -127L, 64L)))
    assert(out(2L) == ((0.0, 0L, 0L, 0L))) // zero vector -> all zeros
  }

  test("dimStats computes fixed-point mean and variance per dimension") {
    val d = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.dimStats(d, "embedding").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) == ((2L, 2.0, 1.0)))  // mean 2, var ((1-2)²+(3-2)²)/2 = 1
    assert(out(2L) == ((2L, 2.0, 0.0)))
  }
}
