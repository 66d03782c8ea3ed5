package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}
import scala.collection.concurrent.TrieMap

/** Dev-only: the all-six concurrent topology with per-action timing —
  * where does an aggregate trigger round's wall clock go when six
  * pipelines share one store and one driver? Prints a duration
  * histogram per action description plus total SQL-exec count, then the
  * StreamBench concurrent number for the same session.
  */
object ConcurrentProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = TrieMap.empty[Long, (String, Long)]
    val sums = TrieMap.empty[String, (Long, Long)] // desc -> (count, totalMs)
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = jobs += 1
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case e: SparkListenerSQLExecutionStart =>
          starts.put(e.executionId, (e.description.take(60), e.time)); ()
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

    val eps = graft.StreamBench.concurrentThroughput(spark)
    Thread.sleep(500) // let listener events drain
    println(f"concurrent_events_per_s=$eps%.0f  spark_jobs=$jobs")
    sums.toSeq.sortBy(-_._2._2).foreach { case (desc, (c, t)) =>
      println(f"[exec] n=$c%4d total=${t}%6d ms avg=${t / math.max(c, 1)}%5d ms  $desc")
    }
    spark.stop()
  }
}
