package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, count, lit, sum}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Aggregate-over-join IVM: the per-group (count, sum) rollup of
  * `A ⋈ B` maintained from signed join deltas without materializing
  * the join, its state living in a MULTI-MEASURE additive chain.
  * Shape under test: per-nation order rollup — A = (k, price),
  * B = (k, nation), view = nation → (COUNT(*), SUM(price)).
  */
class JoinAggViewSpec extends SparkSpec {
  import spark.implicits._

  private def dA(rows: (String, Double, String)*) =
    rows.toDF("k", "price", "op")
  private def dB(rows: (String, String, String)*) =
    rows.toDF("k", "nation", "op")

  /** (nation, n_rows, total) of the maintained view. */
  private def agg(store: SnapshotStore, t: String): Set[(String, Long, Double)] =
    JoinAggView.snapshot(store, t, Seq("nation"))
      .select("nation", "n_rows", "total_value")
      .as[(String, Long, Double)].collect().toSet

  /** Brute-force expected rollup from the full op history. */
  private def expected(
      aOps: Seq[(String, Double, String)],
      bOps: Seq[(String, String, String)]): Set[(String, Long, Double)] = {
    def net[T](ops: Seq[(T, String)]): Seq[T] =
      ops.foldLeft(Vector.empty[T]) {
        case (acc, (v, "INSERT")) => acc :+ v
        case (acc, (v, op)) =>
          require(op == "DELETE")
          val i = acc.indexOf(v); require(i >= 0); acc.patch(i, Nil, 1)
      }
    val as = net(aOps.map { case (k, p, op) => ((k, p), op) })
    val bs = net(bOps.map { case (k, n, op) => ((k, n), op) })
    val joined = for { (ka, p) <- as; (kb, n) <- bs if ka == kb } yield (n, p)
    joined.groupBy(_._1).map { case (n, rows) =>
      (n, rows.size.toLong, rows.map(_._2).sum)
    }.toSet
  }

  test("incremental rollup equals the batch aggregate after every trigger") {
    val dir = Files.createTempDirectory("graft-jointagg").toString
    val store = new SnapshotStore(spark, s"$dir/store")

    var aHist = Seq.empty[(String, Double, String)]
    var bHist = Seq.empty[(String, String, String)]
    def step(id: Long, a: Seq[(String, Double, String)],
        b: Seq[(String, String, String)]): Unit = {
      aHist ++= a; bHist ++= b
      JoinAggView.applyBatch(store, "AGV", dA(a: _*), dB(b: _*), id,
        Seq("k"), Seq("nation"), "price", "op")
      assert(agg(store, "AGV") == expected(aHist, bHist),
        s"diverged after trigger $id")
    }

    // inserts on both sides, multiple orders per customer, two nations
    step(0L,
      Seq(("c1", 10.5, "INSERT"), ("c1", 2.25, "INSERT"), ("c2", 7.0, "INSERT")),
      Seq(("c1", "DE", "INSERT"), ("c2", "FR", "INSERT")))
    // delete one order: the FR rollup loses exactly that contribution
    step(1L, Seq(("c2", 7.0, "DELETE"), ("c3", 4.0, "INSERT")), Nil)
    // group-moving update: c1 moves DE → FR as retract+insert; BOTH
    // its orders move groups in one trigger
    step(2L, Nil, Seq(("c1", "DE", "DELETE"), ("c1", "FR", "INSERT")))
    // late B match: c3's order was waiting unmatched
    step(3L, Nil, Seq(("c3", "DE", "INSERT")))
    // fully retracting a group: DE vanishes from the rollup entirely
    step(4L, Seq(("c3", 4.0, "DELETE")), Nil)
    assert(!agg(store, "AGV").exists(_._1 == "DE"))
  }

  test("crash windows between the three commits replay to the same rollup") {
    val dir = Files.createTempDirectory("graft-jointagg-crash").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    JoinAggView.applyBatch(store, "AGV",
      dA(("c1", 5.0, "INSERT")), dB(("c1", "DE", "INSERT")), 0L,
      Seq("k"), Seq("nation"), "price", "op")

    val before = Seq("AGV__A", "AGV", "AGV__B")
      .map(t => t -> store.currentVersion(t)).toMap
    def run1(): Unit = JoinAggView.applyBatch(store, "AGV",
      dA(("c1", 5.0, "DELETE"), ("c2", 3.0, "INSERT")),
      dB(("c2", "FR", "INSERT")), 1L, Seq("k"), Seq("nation"), "price", "op")
    run1()
    val exp = Set(("FR", 1L, 3.0))
    assert(agg(store, "AGV") == exp)
    // recreate crash states by rolling the not-yet-committed tables'
    // pointers back through the raw local FS (JoinViewSpec's device)
    def rollback(t: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/store/$t/_current")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf()) match {
        case l: org.apache.hadoop.fs.LocalFileSystem => l.getRaw
        case o => o
      }
      val out = fs.create(p, true)
      try out.write(before(t).toString.getBytes) finally out.close()
    }
    // crash after A: replay recomputes ΔJ against (A_new, B_old)
    rollback("AGV"); rollback("AGV__B")
    run1()
    assert(agg(store, "AGV") == exp, "replay from crash-after-A diverged")
    // crash after the agg commit: replay only lands B
    val aggVersion = store.currentVersion("AGV")
    rollback("AGV__B")
    run1()
    assert(store.currentVersion("AGV") == aggVersion,
      "replay must not recommit the aggregate")
    assert(agg(store, "AGV") == exp)
  }

  test("per-trigger writes are O(touched groups), never state-sized") {
    val dir = Files.createTempDirectory("graft-jointagg-delta").toString
    val store = new SnapshotStore(spark, s"$dir/store", compactEvery = 100)
    // 200 customers in 200 distinct nations → 200-group state
    val seedA = (1 to 200).map(i => (s"c$i", i.toDouble, "INSERT"))
    val seedB = (1 to 200).map(i => (s"c$i", s"N$i", "INSERT"))
    JoinAggView.applyBatch(store, "AGD", dA(seedA: _*), dB(seedB: _*), 0L,
      Seq("k"), Seq("nation"), "price", "op")
    assert(agg(store, "AGD").size == 200)
    // one two-row trigger touches one group: the committed agg delta
    // holds ONE row, not a 200-group rewrite
    JoinAggView.applyBatch(store, "AGD",
      dA(("c7", 100.0, "INSERT")), dB(), 1L,
      Seq("k"), Seq("nation"), "price", "op")
    def deltaRows(t: String): Long = {
      val v = store.currentVersion(t)
      spark.read.parquet(s"$dir/store/$t/d$v").count()
    }
    assert(deltaRows("AGD__A") == 1)
    assert(deltaRows("AGD") == 1, "agg delta must be touched-groups-sized")
    assert(agg(store, "AGD").exists { case (n, c, t) =>
      n == "N7" && c == 2L && t == 107.0 })
  }

  test("multi-measure additive chain folds exactly at compaction boundaries") {
    val dir = Files.createTempDirectory("graft-jointagg-fold").toString
    val store = new SnapshotStore(spark, s"$dir/store", compactEvery = 3)
    var aHist = Seq.empty[(String, Double, String)]
    val bOps = Seq(("c0", "X", "INSERT"), ("c1", "Y", "INSERT"))
    JoinAggView.applyBatch(store, "AGF", dA(), dB(bOps: _*), 0L,
      Seq("k"), Seq("nation"), "price", "op")
    (1 to 8).foreach { i =>
      val a = Seq((s"c${i % 2}", i * 1.5, "INSERT"))
      aHist ++= a
      JoinAggView.applyBatch(store, "AGF", dA(a: _*), dB(), i.toLong,
        Seq("k"), Seq("nation"), "price", "op")
    }
    assert(agg(store, "AGF") == expected(aHist, bOps))
    // the fold ran: an aggregated base exists, and BOTH measures
    // survived it (a single-measure fold would have grouped qsum away)
    val fDir = new java.io.File(s"$dir/store/AGF")
    assert(fDir.listFiles().exists(_.getName.startsWith("v")),
      "compaction boundary must fold the multi-measure chain")
  }

  test("measure columns are fixed at the chain's first commit") {
    val dir = Files.createTempDirectory("graft-jointagg-kind").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    store.commitAdditive("M2", Seq(("g1", 1L, 100L))
      .toDF("g", "state_cnt", "state_qsum"), cntCols = JoinAggView.MeasureCols)
    // a single-measure commit into the two-measure chain must refuse —
    // silently folding qsum into the GROUP key would corrupt the state
    val e = intercept[IllegalStateException] {
      store.commitAdditive("M2", Seq(("g1", 1L, 100L))
        .toDF("g", "state_cnt", "state_qsum"))
    }
    assert(e.getMessage.contains("measure columns are fixed"))
    // read derives the measure set from the kind marker: the payload is
    // g alone, both measures summed
    store.commitAdditive("M2", Seq(("g1", 2L, -40L))
      .toDF("g", "state_cnt", "state_qsum"), cntCols = JoinAggView.MeasureCols)
    val got = store.additiveSnapshot("M2", null)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("g1", 3L, 60L)))
  }

  test("refreshFromStore maintains the rollup over two delta-chain store tables") {
    val dir = Files.createTempDirectory("graft-jointagg-cdf").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    def commitA(rows: (Long, String, Int, String, Double)*): Int =
      store.commitDelta("RA", rows.toDF("seq", "operation", "ID", "K", "PRICE"),
        "ID", "seq", Seq("K", "PRICE"))
    def commitB(rows: (Long, String, Int, String, String)*): Int =
      store.commitDelta("RB", rows.toDF("seq", "operation", "ID", "K", "NATION"),
        "ID", "seq", Seq("K", "NATION"))
    def refresh() = JoinAggView.refreshFromStore(store, "RAGG", "RA", "RB",
      Seq("K"), Seq("PRICE"), Seq("NATION"), Seq("NATION"), "PRICE")
    def expected(): Set[(String, Long, Double)] =
      store.snapshot("RA", null).select("K", "PRICE")
        .join(store.snapshot("RB", null).select("K", "NATION"), "K")
        .groupBy("NATION").agg(count(lit(1)), sum(col("PRICE")))
        .as[(String, Long, Double)].collect().toSet
    def got(): Set[(String, Long, Double)] =
      JoinAggView.snapshot(store, "RAGG", Seq("NATION"))
        .select("NATION", "n_rows", "total_value")
        .as[(String, Long, Double)].collect().toSet

    // one-sided backlog vs an empty partner: no commit at all
    commitA((1L, "INSERT", 1, "k1", 5.0), (2L, "INSERT", 2, "k2", 2.5))
    assert(refresh() == (0, 0))
    assert(store.currentVersion("RAGG") == 0)

    // B arrives: its delta joins the CURRENT A (absorbs the backlog)
    commitB((10L, "INSERT", 10, "k1", "DE"), (11L, "INSERT", 11, "k2", "FR"))
    refresh()
    assert(got() == expected())
    assert(got() == Set(("DE", 1L, 5.0), ("FR", 1L, 2.5)))

    // group-moving B update (k1: DE→FR) + a second A row in one refresh
    commitB((12L, "UPDATE", 10, "k1", "FR"))
    commitA((3L, "INSERT", 3, "k1", 1.25))
    refresh()
    assert(got() == expected())
    assert(got() == Set(("FR", 3L, 8.75)))

    // deleting an A row retracts exactly its contribution; replayed
    // refresh (already caught up) is a no-op
    commitA((4L, "DELETE", 2, "k2", 2.5))
    refresh()
    assert(got() == expected())
    val vv = store.currentVersion("RAGG")
    refresh()
    assert(store.currentVersion("RAGG") == vv, "no-op refresh must not commit")
  }

  test("streaming start maintains the rollup over one tagged change stream") {
    val dir = Files.createTempDirectory("graft-jointagg-stream").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Option[Double], Option[String], String, String)]
    val changes = mem.toDF().toDF("k", "price", "nation", "side", "op")
    // ProcessingTime(0) + processAllAvailable, NOT AvailableNow: the
    // latter snapshots offsets at start, so data added after start()
    // races the snapshot and can be silently skipped (observed flake)
    val q = JoinAggView.start(changes, store, "AGS", Seq("k"),
      aCols = Seq("price"), bCols = Seq("nation"), gKeys = Seq("nation"),
      valueCol = "price", sideCol = "side", opCol = "op",
      checkpoint = s"$dir/chk", trigger = Trigger.ProcessingTime("0 seconds"))
    try {
      mem.addData(
        ("c1", Some(9.0), None, "A", "INSERT"),
        ("c1", None, Some("DE"), "B", "INSERT"),
        ("c2", Some(1.0), None, "A", "INSERT"))
      q.processAllAvailable()
      assert(agg(store, "AGS") == Set(("DE", 1L, 9.0)))
    } finally q.stop()
  }
}
