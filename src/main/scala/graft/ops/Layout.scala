package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side data layout: Z-order (Morton) clustering so files carry
  * tight min/max ranges on SEVERAL columns at once — the layout that
  * makes scan pruning work for more than one predicate dimension at
  * 100 TB. A linear sort gives perfect pruning on its leading column
  * and none on the others; bit-interleaving two bucket ids trades a
  * little of each for locality in both (asserted quantitatively in
  * LayoutSpec).
  *
  * Buckets come from [[Ranking.withNtile]] (distributed exact quantile
  * binning — no single-partition window, value-skew-proof because
  * buckets are equal-COUNT, not equal-width), the z-value is pure
  * Column bit arithmetic (codegen'd), and the final
  * `repartitionByRange` + in-partition sort puts rows into
  * z-contiguous output files.
  */
object Layout {

  /** Morton interleave of two bucket ids, `bits` bits each: x occupies
    * even bit positions, y odd. Pure Column ops — stays in codegen.
    */
  def zValue2(bx: Column, by: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftright(bx, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(by, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** Cluster `df` in z-order over two columns: 2^bits equal-count
    * buckets per dimension, interleaved, range-partitioned into
    * `numPartitions` z-contiguous partitions (≈ output files when
    * written). Adds no user-visible columns.
    */
  def zorderBy(df: DataFrame, colX: String, colY: String,
      bits: Int = 8, numPartitions: Int = 0): DataFrame = {
    require(bits >= 1 && bits <= 20, "bits must be in [1, 20]")
    val n = 1 << bits
    val tieX = col(colX).asc
    val bucketedX = Ranking.withNtile(df, n, "__zbx", Seq(tieX))
    val bucketed = Ranking.withNtile(bucketedX, n, "__zby", Seq(col(colY).asc))
    val withZ = bucketed.withColumn("__zv",
      zValue2(col("__zbx") - 1, col("__zby") - 1, bits))
    val parted =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col("__zv"))
      else withZ.repartitionByRange(col("__zv"))
    parted.sortWithinPartitions(col("__zv"))
      .drop("__zbx", "__zby", "__zv")
  }
}
