package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through the driver contract.
  *
  * @param name   stable id (keys `SparkEntry.queries` / `oracleSql`)
  * @param doc    what SURVEY.md §2 operator(s) this exercises
  * @param fn     Spark implementation, (session, sfDir) => result
  * @param oracle equivalent ANSI SQL for the DuckDB oracle over the same
  *               parquet tables; None for ops not expressible in SQL
  *               (driver then records a weaker rows-only check)
  *
  * Determinism contract: every query ends in a total-order `ORDER BY`
  * (full tie-break) present in BOTH the Spark plan and the oracle SQL, and
  * all float aggregates go through exact decimal arithmetic before a final
  * cast to double, so the driver's hash compare cannot be tripped by
  * summation order.
  */
final case class Q(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def all: Seq[Q]
}
