package graft.streaming

import graft.SparkSpec
import graft.sources.AnnIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** The streaming serve tier: query batches answered from the PERSISTED
  * index must equal batch-mode serve on the same queries, epoch by
  * epoch — and a replayed epoch must not duplicate result rows.
  */
class AnnServeStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.Tables.load(spark, sfSmoke, "embeddings")

  test("streamed IVF×PQ serve equals batch serve per epoch; replay is a no-op") {
    val dir = Files.createTempDirectory("graft-annserve").toString
    AnnIndex.buildIvfPq(emb, "annstream_ivfpq", nCentroids = 8, refine = 2,
      m = 8, dims = 64, codebookK = 16, refinePq = 2, buckets = 4)

    val mem = MemoryStream[Long](spark)
    val queries = mem.toDF().toDF("qid")
      .join(emb, col("qid") === col("vec_id"))
      .select(col("vec_id"), col("embedding"))
    val q = AnnServeStream.startIvfPq(queries, "annstream_ivfpq",
      s"$dir/out", s"$dir/ckpt", k = 5, nProbe = 3, m = 8, dims = 64,
      trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      mem.addData(0L, 1L)
      q.processAllAvailable()
      mem.addData(2L, 3L)
      q.processAllAvailable()

      val epochs = spark.read.parquet(s"$dir/out")
        .select("epoch", "query_id", "neighbor_id", "score6", "rank")
        .as[(Long, Long, Long, Long, Int)].collect()
      assert(epochs.map(_._1).toSet == Set(0L, 1L), "one epoch dir per trigger")
      // each epoch must byte-match batch-mode serve on that batch's queries
      for ((ids, epoch) <- Seq(Seq(0L, 1L) -> 0L, Seq(2L, 3L) -> 1L)) {
        val batchServe = AnnIndex.ivfPqServe(spark, "annstream_ivfpq",
            emb.filter(col("vec_id").isin(ids: _*)), k = 5, nProbe = 3,
            m = 8, dims = 64)
          .select("query_id", "neighbor_id", "score6", "rank")
          .as[(Long, Long, Long, Int)].collect().toSet
        val streamed = epochs.filter(_._1 == epoch)
          .map(r => (r._2, r._3, r._4, r._5)).toSet
        assert(streamed == batchServe, s"epoch $epoch drifted from batch serve")
      }

      // a replayed epoch finds its committed dir and recomputes nothing
      val before = spark.read.parquet(s"$dir/out").count()
      AnnServeStream.applyBatch(
        emb.filter(col("vec_id") < 2).select(col("vec_id"), col("embedding")),
        batchId = 0L, s"$dir/out",
        (s, b) => AnnIndex.ivfPqServe(s, "annstream_ivfpq", b, 5, 3, 8, 64))
      assert(spark.read.parquet(s"$dir/out").count() == before,
        "replayed epoch must not duplicate rows")
      assert(!Files.exists(Paths.get(s"$dir/out", ".staging", "e0")),
        "no staging debris after replay")
    } finally q.stop()
  }

  test("pinned-snapshot IVF serve produces identical epochs to resolve-per-batch") {
    AnnIndex.buildIvf(emb, "annstream_pin", nCentroids = 8, refine = 1, buckets = 4)
    def serveAll(pin: Boolean): Set[(Long, Long, Long, Double, Int)] = {
      val dir = Files.createTempDirectory(s"graft-annserve-pin$pin").toString
      val mem = MemoryStream[Long](spark)
      val queries = mem.toDF().toDF("qid")
        .join(emb, col("qid") === col("vec_id"))
        .select(col("vec_id"), col("embedding"))
      val q = AnnServeStream.startIvf(queries, "annstream_pin",
        s"$dir/out", s"$dir/ckpt", k = 5, nProbe = 2,
        trigger = Trigger.ProcessingTime("0 seconds"), pinSnapshot = pin)
      try {
        mem.addData(0L, 1L); q.processAllAvailable()
        mem.addData(2L, 3L); q.processAllAvailable()
        spark.read.parquet(s"$dir/out")
          .select("epoch", "query_id", "neighbor_id", "score", "rank")
          .as[(Long, Long, Long, Double, Int)].collect().toSet
      } finally q.stop()
    }
    assert(serveAll(pin = true) == serveAll(pin = false),
      "pinning the index snapshot must not change any result row")
  }

  test("pinned-snapshot replicas are released at stream termination, across restarts") {
    AnnIndex.buildIvf(emb, "annstream_release", nCentroids = 8, refine = 1,
      buckets = 4)
    def awaitReleased(): Unit = {
      // termination listeners dispatch on the async listener bus
      val deadline = System.nanoTime() + 30e9.toLong
      while (!AnnServeStream.pinnedBroadcasts.isEmpty &&
          System.nanoTime() < deadline) Thread.sleep(25)
    }
    assert(AnnServeStream.pinnedBroadcasts.isEmpty, "clean registry at start")
    val held = (1 to 3).map { i =>
      val dir = Files.createTempDirectory(s"graft-annserve-rel$i").toString
      val mem = MemoryStream[Long](spark)
      val queries = mem.toDF().toDF("qid")
        .join(emb, col("qid") === col("vec_id"))
        .select(col("vec_id"), col("embedding"))
      val q = AnnServeStream.startIvf(queries, "annstream_release",
        s"$dir/out", s"$dir/ckpt", k = 3, nProbe = 2,
        trigger = Trigger.ProcessingTime("0 seconds"), pinSnapshot = true)
      try {
        mem.addData(0L, 1L); q.processAllAvailable()
        val bcs = AnnServeStream.pinnedBroadcasts.get(q.id)
        assert(bcs != null && bcs.size == 2,
          s"run $i: live stream holds exactly its centroid+list replicas")
        bcs
      } finally q.stop()
    }
    awaitReleased()
    // no accumulation: every restart's replicas are deregistered…
    assert(AnnServeStream.pinnedBroadcasts.isEmpty,
      s"replicas leaked across restarts: ${AnnServeStream.pinnedBroadcasts.keySet()}")
    // …and DESTROYED, not just forgotten (a destroyed broadcast refuses
    // value access — the executor/driver copies are gone)
    held.flatten.foreach { bc =>
      intercept[org.apache.spark.SparkException](bc.value)
    }
  }
}
