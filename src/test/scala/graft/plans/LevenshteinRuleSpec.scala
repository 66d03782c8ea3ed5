package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._

/** The optimizer rule must rewrite every bounded-comparison shape to
  * the threshold variant (banded DP) without changing results — the
  * soundness claim is `lev(a,b) ≤ n ≡ 0 ≤ lev(a,b,n) ≤ n`.
  */
class LevenshteinRuleSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed fixture: a local Seq would collapse to a
  // LocalRelation and ConvertToLocalRelation would evaluate the whole
  // filter at optimize time, leaving no expression to assert on
  private lazy val df = {
    val dir = java.nio.file.Files.createTempDirectory("graft-lev").toString
    Seq(("kitten", "sitting"), ("abc", "abd"),
      ("same", "same"), ("totally", "different")).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def thresholdLevs(q: DataFrame): Seq[Levenshtein] =
    q.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case l: Levenshtein => l
    })

  test("lev(a,b) <= n rewrites to the banded threshold form; results unchanged") {
    graft.functions.GraftFunctions.registerAll(spark)
    val q = df.filter(levenshtein(col("a"), col("b")) <= 2)
    val levs = thresholdLevs(q)
    assert(levs.nonEmpty && levs.forall(_.threshold.isDefined),
      s"unbounded levenshtein survived:\n${q.queryExecution.optimizedPlan}")
    assert(q.as[(String, String)].collect().toSet ==
      Set(("abc", "abd"), ("same", "same")))
  }

  test("strict < and reversed-literal comparisons rewrite too") {
    graft.functions.GraftFunctions.registerAll(spark)
    val lt = df.filter(levenshtein(col("a"), col("b")) < 3)
    val ltLevs = thresholdLevs(lt)
    assert(ltLevs.nonEmpty && ltLevs.forall(_.threshold.isDefined))
    assert(lt.count() == 2) // dist 1 and 0
    val rev = df.filter(lit(3) >= levenshtein(col("a"), col("b")))
    val revLevs = thresholdLevs(rev)
    assert(revLevs.nonEmpty && revLevs.forall(_.threshold.isDefined))
    assert(rev.count() == 3) // kitten/sitting (3) now included
  }

  test("already-thresholded and unrelated comparisons are left alone") {
    graft.functions.GraftFunctions.registerAll(spark)
    // equality against a distance is not a bounded-band comparison the
    // rule handles; it must pass through unrewritten and still work
    val eq = df.filter(levenshtein(col("a"), col("b")) === 1)
    val eqLevs = thresholdLevs(eq)
    assert(eqLevs.nonEmpty && eqLevs.forall(_.threshold.isEmpty))
    assert(eq.count() == 1)
  }
}
