package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import scala.collection.concurrent.TrieMap

/** Dev-only: run the sync probe with per-action timing, to see where a
  * trigger's wall clock goes (delta write vs audit vs state store vs
  * framework overhead).
  */
object TriggerProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = TrieMap.empty[Long, (String, Long)]
    val listener = new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case e: SparkListenerSQLExecutionStart =>
          starts.put(e.executionId, (e.description.take(90), e.time)); ()
        case e: SparkListenerSQLExecutionEnd =>
          starts.remove(e.executionId).foreach { case (desc, t0) =>
            println(f"[exec] ${e.time - t0}%6d ms  $desc")
          }
        case _ => ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val regMs = 1768280000000L
    def envelope(id: Int, tsMs: Long): String = {
      val img = s"""{"BOOK_ID":"$id","BOOK_TITLE":"t$id","AUTHOR":"a","CATEGORY":"01","STATUS":"Y","REG_DATE":$regMs,"MOD_DATE":null}"""
      s"""{"payload":{"op":"c","before":null,"after":$img,"source":{"schema":"ASIS_USER","table":"BOOK_INFO"},"ts_ms":$tsMs}}"""
    }

    val dir = Files.createTempDirectory("graft-profile").toFile
    val store = new graft.streaming.SnapshotStore(spark, s"$dir/store")
    val pipeline = new graft.streaming.SyncPipeline(spark, store,
      trigger = Trigger.ProcessingTime("0 seconds"))
    val mem = MemoryStream[String](spark)(spark.sqlContext.implicits.newStringEncoder)
    val source = mem.toDF().withColumn("topic", lit("asis.ASIS_USER.BOOK_INFO"))
    val q = pipeline.start(source, graft.cdc.Registry.book,
      graft.cdc.Direction.AsisToTobe, s"$dir/ckpt")
    val t0 = 1768284000000L
    (0 until 8).foreach { i =>
      val w0 = System.nanoTime()
      mem.addData((0 until 20000).map(j => envelope(i * 20000 + j, t0 + i * 1000L)))
      q.processAllAvailable()
      println(f"[batch $i] ${(System.nanoTime() - w0) / 1e6}%.0f ms total")
    }
    q.stop()
    spark.stop()
  }
}
