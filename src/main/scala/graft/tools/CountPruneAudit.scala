package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: find queries whose `.count()` plan PRUNES the work the
  * query exists to measure (guide §1.4: count lets the optimizer drop
  * columns and whole subtrees — e.g. a final left join with a unique
  * right key is eliminated outright, taking the entire right-side
  * computation with it). For every registered query, diff the operator
  * multiset of the full plan vs the count plan and report the heavy
  * operators (joins, aggregates, windows, generates) that disappear.
  * Usage: runMain graft.tools.CountPruneAudit [sfDir]
  */
object CountPruneAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val heavy = Seq("Join", "Aggregate", "Window", "Generate", "Sort")
    def sig(p: org.apache.spark.sql.execution.SparkPlan): Map[String, Int] = {
      def walk(n: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
        val kids = n match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
            Seq(r.child)
          case other => other.children
        }
        n.nodeName +: kids.flatMap(walk)
      }
      walk(p).filter(n => heavy.exists(n.contains))
        .groupBy(identity).view.mapValues(_.size).toMap
    }
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val full = sig(df.queryExecution.executedPlan)
        val cnt = sig(df.groupBy().count().queryExecution.executedPlan)
        val lost = full.flatMap { case (k, v) =>
          val d = v - cnt.getOrElse(k, 0)
          if (d > 0) Some(s"$k:-$d") else None
        }
        if (lost.nonEmpty)
          println(s"[prune] $name lost ${lost.toSeq.sorted.mkString(", ")}")
      } catch {
        case e: Throwable => println(s"[prune] $name PLANNING FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
