package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantifies the z-order claim: after clustering, EVERY partition
  * (≈ output file) spans a small range of BOTH dimensions, where a
  * linear sort leaves the trailing dimension unclustered — the
  * property that turns file-level min/max stats into scan pruning for
  * multi-dimensional predicates.
  */
class LayoutSpec extends SparkSpec {

  // 100×100 grid: global spread is 99 in each dimension
  private lazy val grid = spark.range(10000).select(
    (col("id") % 100).as("x"), (col("id") / 100).cast("long").as("y"))

  private def avgSpreads(d: DataFrame): (Double, Double) = {
    val row = d.withColumn("pid", spark_partition_id())
      .groupBy(col("pid"))
      .agg((max(col("x")) - min(col("x"))).as("sx"),
        (max(col("y")) - min(col("y"))).as("sy"))
      .agg(avg(col("sx")), avg(col("sy"))).head()
    (row.getDouble(0), row.getDouble(1))
  }

  test("z-order clusters BOTH dims; linear sort leaves the trailing dim unclustered") {
    val (zx, zy) = avgSpreads(Layout.zorderBy(grid, "x", "y", bits = 4, numPartitions = 16))
    val (lx, ly) = avgSpreads(
      grid.repartitionByRange(16, col("x"), col("y"))
        .sortWithinPartitions(col("x"), col("y")))
    // linear: leading dim tight, trailing dim spans nearly everything
    assert(lx < 20, s"linear leading-dim spread unexpectedly wide: $lx")
    assert(ly > 90, s"fixture broken: linear trailing dim should be unclustered: $ly")
    // z-order: both dims tight (16 z-runs of a 16x16 grid ≈ 4x4 blocks)
    assert(zx < 60, s"z-order x spread too wide: $zx")
    assert(zy < 60, s"z-order y spread too wide: $zy")
    assert(zy < ly / 2, s"z-order did not beat linear on the trailing dim: $zy vs $ly")
  }

  test("zValue2 interleaves bits (Morton order)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L))
      .toDF("bx", "by")
      .select(Layout.zValue2(col("bx"), col("by"), 2).as("z"))
      .as[Long].collect().toSeq
    assert(rows == Seq(0L, 1L, 2L, 3L, 14L)) // z(2,3) = y1 x1 y0 x0 = 1110b
  }
}
