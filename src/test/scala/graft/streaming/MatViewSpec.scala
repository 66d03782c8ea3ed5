package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming materialized view: inserts add, updates fold as
  * retract+insert pairs, deletes retract keys away, and a crash-replayed
  * epoch is a no-op (the batch id commits atomically with the version).
  */
class MatViewSpec extends SparkSpec {
  import spark.implicits._

  test("insert/update/delete stream maintains the per-key aggregate") {
    val dir = Files.createTempDirectory("graft-matview").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val mem = MemoryStream[(String, String, Double)](spark)
    val q = MatView.start(mem.toDF().toDF("op", "k", "v"), store, "MV",
      Seq("k"), "v", "op", s"$dir/ckpt", Trigger.ProcessingTime("0 seconds"))
    try {
      def state() = store.snapshot("MV", null)
        .as[(String, Long, Long)].collect()
        .map { case (k, n, q6) => (k, n, q6 / 100.0) }.toSet

      mem.addData(("INSERT", "a", 1.00), ("INSERT", "a", 2.00), ("INSERT", "b", 9.00))
      q.processAllAvailable()
      assert(state() == Set(("a", 2L, 3.00), ("b", 1L, 9.00)))

      // UPDATE b: 9.00 → 4.00 as the retract+insert pair
      mem.addData(("DELETE", "b", 9.00), ("INSERT", "b", 4.00))
      q.processAllAvailable()
      assert(state() == Set(("a", 2L, 3.00), ("b", 1L, 4.00)))

      // DELETE a twice: key fully retracted, disappears
      mem.addData(("DELETE", "a", 1.00), ("DELETE", "a", 2.00))
      q.processAllAvailable()
      assert(state() == Set(("b", 1L, 4.00)))

      // crash replay: re-applying the last epoch must be a no-op
      val v = store.currentVersion("MV")
      MatView.applyBatch(store, "MV",
        Seq(("DELETE", "a", 1.00), ("DELETE", "a", 2.00)).toDF("op", "k", "v"),
        batchId = v - 1, Seq("k"), "v", "op")
      assert(store.currentVersion("MV") == v, "replayed epoch must not commit")
      assert(state() == Set(("b", 1L, 4.00)))
    } finally q.stop()
  }

  test("a raw UPDATE envelope fails the batch instead of double-counting") {
    val dir = Files.createTempDirectory("graft-matview-upd").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    MatView.applyBatch(store, "MV",
      Seq(("INSERT", "a", 1.00)).toDF("op", "k", "v"),
      batchId = 0, Seq("k"), "v", "op")
    val ex = intercept[Exception] {
      MatView.applyBatch(store, "MV",
        Seq(("UPDATE", "a", 5.00)).toDF("op", "k", "v"),
        batchId = 1, Seq("k"), "v", "op")
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.toString +: causes(t.getCause)
    assert(causes(ex).exists(_.contains("unsupported op")),
      s"contract violation must surface, got: ${causes(ex)}")
    // the failed batch must not have committed anything
    assert(store.currentMeta("MV").contains("0"))
    assert(store.snapshot("MV", null).as[(String, Long, Long)].collect().toSet ==
      Set(("a", 1L, 100L)))
  }

  test("streaming distinct-count view: estimate equals the batch sketch") {
    val dir = Files.createTempDirectory("graft-hllview").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val mem = MemoryStream[Long](spark)
    val q = MatView.startDistinct(mem.toDF().toDF("id"), store, "DC", "id",
      s"$dir/ckpt", Trigger.ProcessingTime("0 seconds"))
    try {
      mem.addData(1L to 400L: _*); q.processAllAvailable()
      mem.addData(201L to 700L: _*); q.processAllAvailable() // overlap on purpose
      val streamed = graft.ops.Sketches
        .hllEstimate(store.snapshot("DC", null))
        .head().getAs[Double]("hll_estimate")
      val batch = graft.ops.Sketches
        .hllDistinct((1L to 700L).toDF("id"), org.apache.spark.sql.functions.col("id"))
        .head().getAs[Double]("hll_estimate")
      assert(streamed == batch,
        s"streamed sketch must equal batch sketch: $streamed vs $batch")
      // state is the register table: bounded regardless of id volume
      assert(store.snapshot("DC", null).count() <= 256)
    } finally q.stop()
  }

  test("kmv view: streamed per-group sketches equal the batch sketch; replay is a no-op") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-matview-kmv").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val k = 32
    val mem = MemoryStream[(String, Long)](spark)
    val q = MatView.startKmvDistinct(mem.toDF().toDF("g", "v"), store, "KMV",
      "g", "v", k, s"$dir/ckpt", Trigger.ProcessingTime("0 seconds"))
    try {
      // two batches with overlapping groups and duplicate values
      val b1 = (1L to 800L).map(v => ("a", v)) ++ (1L to 300L).map(v => ("b", v))
      val b2 = (400L to 1200L).map(v => ("a", v)) ++ (200L to 900L).map(v => ("b", v))
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()

      val streamed = store.snapshot("KMV", null)
        .select(col("g"), col("kmv")).as[(String, Seq[Long])].collect().toMap
      val batchSk = graft.ops.Sketches.kmvGroupedSketch(
          (b1 ++ b2).toDF("g", "v"), col("g"), col("v"), k)
        .as[(String, Seq[Long])].collect().toMap
      assert(streamed == batchSk,
        "streamed KMV state must be bit-identical to the batch sketch")
      // state is bounded: ≤ k hashes per group
      assert(streamed.values.forall(_.length <= k))
      // the stored sketches answer an intersection question at read time
      val sk = store.snapshot("KMV", null)
      val est = sk.filter(col("g") === "a").select(col("kmv").as("ka"))
        .crossJoin(sk.filter(col("g") === "b").select(col("kmv").as("kb")))
        .select(graft.ops.Sketches.thetaIntersect(col("ka"), col("kb"), k))
        .head().getDouble(0)
      // true intersection = |[200,900] ∪ [1..300]∩...| — sets: a = 1..1200, b = 1..900 → ∩ = 900
      assert(math.abs(est - 900.0) / 900.0 < 0.75, s"estimate $est")

      // crash replay: re-applying the last epoch must not commit
      val v = store.currentVersion("KMV")
      MatView.applyKmvBatch(store, "KMV", b2.toDF("g", "v"),
        batchId = 1, "g", "v", k)
      assert(store.currentVersion("KMV") == v, "replayed epoch must not commit")
    } finally q.stop()
  }

  test("refreshFromStore: view catches up from the change feed, both images folded") {
    val dir = Files.createTempDirectory("graft-matview-cdf").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    def commit(rows: (Long, String, Int, String, Double)*): Int =
      store.commitDelta("SRC",
        rows.toDF("seq", "operation", "ID", "G", "V"), "ID", "seq", Seq("G", "V"))
    def view() = store.snapshot("VIEW", null)
      .as[(String, Long, Long)].collect()
      .map { case (g, n, q) => (g, n, q / 100.0) }.toSet
    def recompute() = graft.ops.Incremental
      .aggState(store.snapshot("SRC", null), Seq("G"), "V")
      .as[(String, Long, Long)].collect()
      .map { case (g, n, q) => (g, n, q / 100.0) }.toSet

    commit((1L, "INSERT", 1, "a", 10.0), (2L, "INSERT", 2, "a", 20.0),
      (3L, "INSERT", 3, "b", 5.0))
    assert(MatView.refreshFromStore(store, "SRC", "VIEW", Seq("G"), "V") == 1)
    assert(view() == Set(("a", 2L, 30.0), ("b", 1L, 5.0)))

    // UPDATE that MOVES a row across groups + a delete: the before
    // image must retract from the old group
    commit((4L, "UPDATE", 2, "b", 20.0), (5L, "DELETE", 3, "b", 5.0))
    MatView.refreshFromStore(store, "SRC", "VIEW", Seq("G"), "V")
    assert(view() == Set(("a", 1L, 10.0), ("b", 1L, 20.0)))
    assert(view() == recompute())

    // same-group value change: the delta is (cnt 0, qsum != 0) — the
    // case a naive pre-merged delta would drop
    commit((6L, "UPDATE", 1, "a", 15.0))
    MatView.refreshFromStore(store, "SRC", "VIEW", Seq("G"), "V")
    assert(view() == Set(("a", 1L, 15.0), ("b", 1L, 20.0)))
    assert(view() == recompute())

    // fully retracting a group drops its key from the view
    commit((7L, "DELETE", 2, "b", 20.0))
    MatView.refreshFromStore(store, "SRC", "VIEW", Seq("G"), "V")
    assert(view() == Set(("a", 1L, 15.0)))

    // already caught up: refresh is a no-op (no new view version)
    val vv = store.currentVersion("VIEW")
    assert(MatView.refreshFromStore(store, "SRC", "VIEW", Seq("G"), "V")
      == store.currentVersion("SRC"))
    assert(store.currentVersion("VIEW") == vv, "no-op refresh must not commit")
  }

  test("startRefreshLoop: managed cadence catches the view up as the source moves") {
    val dir = Files.createTempDirectory("graft-matview-loop").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    def commit(rows: (Long, String, Int, String, Double)*): Int =
      store.commitDelta("SRC2",
        rows.toDF("seq", "operation", "ID", "G", "V"), "ID", "seq", Seq("G", "V"))
    commit((1L, "INSERT", 1, "a", 10.0))
    val q = MatView.startRefreshLoop(spark, store, "SRC2", "VIEW2",
      Seq("G"), "V", s"$dir/ckpt", Trigger.ProcessingTime("0 seconds"))
    try {
      def viewAt(n: Int): Set[(String, Long, Long)] = {
        // ticks fire on their own; poll until the view reflects version n
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (store.currentMeta("VIEW2").forall(_.toInt < n) &&
          System.nanoTime() < deadline) Thread.sleep(100)
        store.snapshot("VIEW2", null).as[(String, Long, Long)].collect().toSet
      }
      assert(viewAt(1) == Set(("a", 1L, 1000L)))
      commit((2L, "INSERT", 2, "b", 5.0), (3L, "DELETE", 1, "a", 10.0))
      assert(viewAt(2) == Set(("b", 1L, 500L)))
    } finally q.stop()
  }
}
