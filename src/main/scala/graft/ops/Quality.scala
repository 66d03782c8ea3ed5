package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract gate a
  * production table passes before anything downstream reads it
  * (completeness, domain bounds, key uniqueness, referential
  * integrity), evaluated the only way that scales:
  *
  *  - every row-local expectation folds into ONE aggregation pass over
  *    ONE scan (a violations counter per check — conditional sums,
  *    exactly [[Profile]]'s one-scan argument), and
  *  - referential checks are LEFT ANTI joins (orphan count), the only
  *    shape that needs a second relation.
  *
  * The report is rows of (check, violations, passed) — exact integer
  * counts, so the gate is engine-deterministic and oracle-checkable,
  * not a float "quality score".
  */
object Quality {

  /** A named row-local expectation: `violations` is an AGGREGATE
    * expression counting offending rows (0 = pass).
    */
  final case class Expectation(name: String, violations: Column)

  /** Rows with a null `c`. */
  def notNull(c: String): Expectation =
    Expectation(s"not_null($c)",
      sum(when(col(c).isNull, 1L).otherwise(0L)))

  /** Rows outside [lo, hi] (nulls count as violations too — a bound
    * check subsumes presence).
    */
  def inRange(c: String, lo: Double, hi: Double): Expectation =
    Expectation(s"in_range($c)",
      sum(when(col(c).isNull || !col(c).between(lo, hi), 1L).otherwise(0L)))

  /** Rows whose `c` is not in the allowed set. */
  def inSet(c: String, allowed: Seq[String]): Expectation =
    Expectation(s"in_set($c)",
      sum(when(col(c).isin(allowed: _*), 0L).otherwise(1L)))

  /** Duplicate rows beyond the first per key tuple: count(*) −
    * count(DISTINCT keys). One extra Expand inside the same pass.
    */
  def unique(keys: String*): Expectation =
    Expectation(s"unique(${keys.mkString(",")})",
      count(lit(1)) - count_distinct(struct(keys.map(col): _*)))

  /** Evaluate all row-local expectations in one scan → rows of
    * (check, violations, passed), ordered by check name.
    */
  def report(df: DataFrame, exps: Seq[Expectation]): DataFrame = {
    require(exps.nonEmpty, "Quality.report: no expectations")
    // names key both the agg aliases and the output map — duplicates
    // (two inRange bounds on one column) would fail deep inside Spark
    // with an ambiguous-reference error; refuse loudly here instead
    // (construct Expectation directly with a distinct name to stack
    // same-kind checks on one column)
    val dup = exps.groupBy(_.name).collect { case (n, es) if es.size > 1 => n }
    require(dup.isEmpty,
      s"Quality.report: duplicate expectation names ${dup.mkString(", ")}")
    val aggs = exps.map(e => e.violations.cast("long").as(e.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val kv = exps.flatMap(e => Seq(lit(e.name), col(e.name)))
    one.select(explode(map(kv: _*)).as(Seq("check", "violations")))
      .withColumn("passed", col("violations") === 0L)
      .orderBy(col("check"))
  }

  /** Referential integrity: rows of `df` whose `fk` has no partner
    * `pk` in `dim` — a LEFT ANTI join, reported in the same
    * (check, violations, passed) shape for unioning with [[report]].
    */
  def fkOrphans(df: DataFrame, fk: String, dim: DataFrame, pk: String): DataFrame =
    df.join(dim.select(col(pk)), df(fk) === dim(pk), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(s"fk($fk)").as("check"), col("violations"),
        (col("violations") === 0L).as("passed"))
}
