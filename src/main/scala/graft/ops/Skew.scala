package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers. AQE's skew-join handles most runtime skew;
  * salting is the explicit tool when one hot key dominates a shuffle
  * (e.g. a null-ish default pk or a celebrity user at 100 TB).
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a random-free,
    * DETERMINISTIC salt derived from a second column; the small side is
    * exploded `salts`-fold so every salted key still matches. Result is
    * row-identical to the unsalted join, but the shuffle spreads each
    * hot key over `salts` reducers.
    */
  def saltedJoin(
      skewed: DataFrame, other: DataFrame, key: String, salts: Int,
      saltSource: Column, joinType: String = "inner"): DataFrame = {
    val saltedL = skewed.withColumn("__salt", pmod(crc32(saltSource.cast("string")), lit(salts)))
    val saltedR = other
      .withColumn("__salt_i", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt_i").cast("long"))
      .drop("__salt_i")
    saltedL.join(saltedR, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
