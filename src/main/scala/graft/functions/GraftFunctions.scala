package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration of the engine's native expressions, so
  * `spark.sql("SELECT debezium_decimal(...)")` works.
  *
  * Two entry points:
  *  - `GraftExtensions` for `spark.sql.extensions` /
  *    `SparkSession.builder().withExtensions(...)` (production path);
  *  - `GraftFunctions.registerAll(spark)` for an already-built session.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "debezium_decimal" -> (es => DebeziumDecimalDecode(es.head)),
    "jaccard_sorted" -> (es => ArrayHashes.SortedJaccard(es(0), es(1))),
    "simhash32" -> (es => ArrayHashes.SimHash32(es.head)),
    "minhash_signature" -> (es =>
      ArrayHashes.MinHashSignature(es(0), intLit(es(1), "k"))),
    "minhash_band_keys" -> (es =>
      ArrayHashes.MinHashBandKeys(es(0), intLit(es(1), "k"), intLit(es(2), "bands"))),
    "shingle_hash_set" -> (es =>
      ArrayHashes.ShingleHashSet(es(0), intLit(es(1), "n"))),
    "prefix_any_equal" -> (es =>
      ArrayHashes.PrefixAnyEqual(es(0), es(1), es(2))),
    "dot_product" -> (es => VectorOps.DotProduct(es(0), es(1))),
    "srp_bucket" -> (es =>
      VectorOps.SrpBucket(es(0), intLit(es(1), "planes"), intLit(es(2), "dims"))))

  /** Register on an existing session (temp functions + optimizer rule). */
  def registerAll(spark: SparkSession): Unit = {
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.LevenshteinThresholdRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.LevenshteinThresholdRule
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), b))
    }
    e.injectOptimizerRule(_ => graft.plans.LevenshteinThresholdRule)
  }
}
