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

  /** Rows the parquet reader actually materialized for a filtered read:
    * row groups whose min/max stats fail the pushed predicate are never
    * decoded, so the scan node's numOutputRows IS the pruning metric.
    * (AQE wraps the plan; unwrap before collecting scan nodes.)
    */
  private def scannedRows(df: DataFrame): Long = {
    // collect() executes THIS queryExecution (count() would plan and
    // run a separate tree whose metrics we can't reach)
    df.collect()
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    exec.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numOutputRows").value
    }.sum
  }

  test("written z-order layout prunes parquet row groups on BOTH predicate dims") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toFile
    try {
      val zdir = new java.io.File(tmp, "z").getAbsolutePath
      val ldir = new java.io.File(tmp, "linear").getAbsolutePath
      // 16 output partitions → 16 files, one row group each (625 rows
      // ≪ the default group size), so row-group stats = file stats
      Layout.zorderBy(grid, "x", "y", bits = 4, numPartitions = 16)
        .write.mode("overwrite").parquet(zdir)
      grid.repartitionByRange(16, col("x"), col("y"))
        .sortWithinPartitions(col("x"), col("y"))
        .write.mode("overwrite").parquet(ldir)

      def read(dir: String, pred: org.apache.spark.sql.Column) =
        spark.read.parquet(dir).filter(pred)

      // predicate on the TRAILING dim only — the case linear layout
      // cannot prune at all (every file spans all of y)
      val yPred = col("y").between(10L, 19L)
      val zy = scannedRows(read(zdir, yPred))
      val ly = scannedRows(read(ldir, yPred))
      assert(read(zdir, yPred).count() == read(ldir, yPred).count()) // same answer
      assert(ly >= 9000L, s"fixture broken: linear should scan ~everything for y-only: $ly")
      assert(zy <= 5000L, s"z-order failed to prune row groups on y: scanned $zy of 10000")

      // predicate on the leading dim — z-order must also prune here
      // (that's the 'a little of each' trade, not a loss of x pruning)
      val xPred = col("x").between(10L, 19L)
      val zx = scannedRows(read(zdir, xPred))
      assert(zx <= 5000L, s"z-order failed to prune row groups on x: scanned $zx of 10000")
      info(s"scanned rows of 10000 — y-only: z=$zy linear=$ly; x-only: z=$zx")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
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
