package graft.queries

import graft.SparkSpec

/** The shared mm9/mm10 wav-stage cache's eviction contract: a data
  * rewrite under the same (session, dir) must (1) miss the cache — new
  * frames, not stale ones — and (2) unpersist the evicted entry's
  * localCheckpoint blocks instead of leaking them until ContextCleaner
  * GC (round-13 advice item).
  */
class WavCacheSpec extends SparkSpec {

  test("wav-stage cache eviction on data rewrite unpersists the stale localCheckpoint blocks") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wavcache").toString
    def writeDocs(n: Int): Unit =
      graft.Tables.load(spark, sfSmoke, "documents").limit(n)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def persistedIds: Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet
    try {
      writeDocs(6)
      val before = persistedIds
      val (segs1, pairs1) = Extras.sharedWavSegPairs(spark, dir)
      segs1.count(); pairs1.count()
      val firstIds = persistedIds -- before
      assert(firstIds.nonEmpty, "first call should pin checkpoint blocks")
      // same snapshot → cache hit, no new blocks
      Extras.sharedWavSegPairs(spark, dir)
      assert((persistedIds -- before) == firstIds)
      // rewrite (different row count → size/count token change even if
      // mtime granularity coincides) → miss + evict + unpersist
      writeDocs(4)
      val (segs2, _) = Extras.sharedWavSegPairs(spark, dir)
      assert(segs2.select("doc_id").distinct().count() <= 4,
        "post-rewrite call must read the new snapshot, not stale frames")
      val after = persistedIds
      assert(firstIds.forall(!after.contains(_)),
        s"evicted entry's blocks must be unpersisted; leaked ids: ${firstIds.intersect(after)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
