package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}
import scala.collection.concurrent.TrieMap

/** Dev-only: per-SQL-execution wall attribution for the composed
  * eight-tier ladder (the ConcurrentProfile treatment applied to
  * [[graft.StreamBench.ladderThroughput]]) — which ACTIONS does a
  * ladder trigger actually pay for, and how much is per-action driver
  * floor vs data? Read together with the GRAFT_TRIGGER_TIMING per-tier
  * wall split.
  */
object LadderExecProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // GRAFT_AQE=false A/Bs the adaptive-replanning hypothesis: AQE
      // re-plans per stage, which at trigger-sized batches is pure
      // fixed cost
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = TrieMap.empty[Long, (String, Long)]
    val sums = TrieMap.empty[String, (Long, Long)]
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = jobs += 1
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case e: SparkListenerSQLExecutionStart =>
          // foreachBatch execs carry empty descriptions — key by the
          // physical plan's root + first scan-ish line instead
          val plan = e.physicalPlanDescription.linesIterator.take(14).toSeq
          val root = e.sparkPlanInfo.nodeName
          val hint = plan.find(l => l.contains("parquet ") ||
            l.contains("FileScan") || l.contains("LocalTableScan"))
            .getOrElse("").trim.take(60)
          starts.put(e.executionId, (s"$root | $hint", e.time)); ()
        case e: SparkListenerSQLExecutionEnd =>
          starts.remove(e.executionId).foreach { case (desc, t0) =>
            val key = desc.replaceAll("[0-9]+", "N")
            val (c, t) = sums.getOrElse(key, (0L, 0L))
            sums.put(key, (c + 1, t + (e.time - t0)))
          }
        case _ => ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val (med, mn, mx) = graft.StreamBench.ladderThroughput(spark, 8)
    Thread.sleep(500)
    println(f"ladder_docs_per_s=$med%.0f [$mn%.0f, $mx%.0f]  spark_jobs=$jobs")
    val total = sums.values.map(_._2).sum
    println(s"total_sql_exec_ms=$total  execs=${sums.values.map(_._1).sum}")
    sums.toSeq.sortBy(-_._2._2).take(25).foreach { case (desc, (c, t)) =>
      println(f"[exec] n=$c%4d total=${t}%6d ms avg=${t / math.max(c, 1)}%5d ms  $desc")
    }
    spark.stop()
  }
}
