package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Incremental join-view maintenance: inserts on either side extend the
  * join, deletes retract every joined row they contributed to, bag
  * multiplicities multiply, and the three-table commit choreography
  * (A → view → B, each gated on its own batch-id meta) replays
  * correctly from every crash window.
  */
class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private def view(store: SnapshotStore, t: String): Set[(String, String, String, Long)] =
    store.additiveSnapshot(t, null).as[(String, String, String, Long)].collect().toSet

  private def dA(rows: (String, String, String)*) =
    rows.toDF("k", "a_val", "op")
  private def dB(rows: (String, String, String)*) =
    rows.toDF("k", "b_val", "op")

  test("two-sided insert/delete changes maintain the join view incrementally") {
    val dir = Files.createTempDirectory("graft-joinview").toString
    val store = new SnapshotStore(spark, s"$dir/store")

    // epoch 0: A gets k1/k2, B matches k1 only
    JoinView.applyBatch(store, "JV",
      dA(("k1", "a1", "INSERT"), ("k2", "a2", "INSERT")),
      dB(("k1", "b1", "INSERT")), 0L, Seq("k"), "op")
    assert(view(store, "JV") == Set(("k1", "a1", "b1", 1L)))

    // epoch 1: B-side delta joins against the STORED A state
    JoinView.applyBatch(store, "JV", dA(),
      dB(("k1", "b2", "INSERT"), ("k2", "b9", "INSERT")), 1L, Seq("k"), "op")
    assert(view(store, "JV") == Set(
      ("k1", "a1", "b1", 1L), ("k1", "a1", "b2", 1L), ("k2", "a2", "b9", 1L)))

    // epoch 2: deleting one A row retracts EVERY join row it produced
    JoinView.applyBatch(store, "JV",
      dA(("k1", "a1", "DELETE")), dB(), 2L, Seq("k"), "op")
    assert(view(store, "JV") == Set(("k2", "a2", "b9", 1L)))

    // epoch 3: bag semantics — a duplicate A row doubles the multiplicity
    JoinView.applyBatch(store, "JV",
      dA(("k2", "a2", "INSERT")), dB(), 3L, Seq("k"), "op")
    assert(view(store, "JV") == Set(("k2", "a2", "b9", 2L)))

    // epoch 4: same-epoch deltas on BOTH sides include the ΔA⋈ΔB term
    JoinView.applyBatch(store, "JV",
      dA(("k3", "a3", "INSERT")), dB(("k3", "b3", "INSERT")), 4L, Seq("k"), "op")
    assert(view(store, "JV") == Set(
      ("k2", "a2", "b9", 2L), ("k3", "a3", "b3", 1L)))

    // an empty trigger skips before any commit — an idle stream must
    // not rewrite three O(|state|) tables per tick (zero-sum deltas
    // count as empty: the sided aggregation cancels them)
    val idleBefore = Seq("JV__A", "JV", "JV__B").map(store.currentVersion)
    JoinView.applyBatch(store, "JV", dA(), dB(), 5L, Seq("k"), "op")
    JoinView.applyBatch(store, "JV",
      dA(("kz", "az", "INSERT"), ("kz", "az", "DELETE")), dB(), 6L, Seq("k"), "op")
    assert(Seq("JV__A", "JV", "JV__B").map(store.currentVersion) == idleBefore,
      "empty/zero-sum trigger must not commit any table")

    // a replayed epoch is a no-op across all three tables
    val versions = Seq("JV__A", "JV", "JV__B").map(store.currentVersion)
    JoinView.applyBatch(store, "JV",
      dA(("k3", "a3", "INSERT")), dB(("k3", "b3", "INSERT")), 4L, Seq("k"), "op")
    assert(Seq("JV__A", "JV", "JV__B").map(store.currentVersion) == versions,
      "replayed epoch must not commit any table")
    assert(view(store, "JV") == Set(
      ("k2", "a2", "b9", 2L), ("k3", "a3", "b3", 1L)))
  }

  test("crash windows between the three table commits replay to the same state") {
    val dir = Files.createTempDirectory("graft-joinview-crash").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    JoinView.applyBatch(store, "JV",
      dA(("k1", "a1", "INSERT")), dB(("k1", "b1", "INSERT")), 0L, Seq("k"), "op")

    // land epoch 1 fully, then recreate each crash state by rolling the
    // not-yet-committed tables' pointers back (old version dirs remain
    // on disk — exactly what a crashed process leaves behind)
    val before = Seq("JV__A", "JV", "JV__B").map(t => t -> store.currentVersion(t)).toMap
    def run1(): Unit = JoinView.applyBatch(store, "JV",
      dA(("k2", "a2", "INSERT"), ("k1", "a1", "DELETE")),
      dB(("k2", "b2", "INSERT")), 1L, Seq("k"), "op")
    run1()
    val expected = Set(("k2", "a2", "b2", 1L))
    assert(view(store, "JV") == expected)
    // roll back through the RAW local FS the store itself uses — the
    // checksummed layer would leave a .crc sidecar the store never
    // maintains
    def rollback(t: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/store/$t/_current")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf()) match {
        case l: org.apache.hadoop.fs.LocalFileSystem => l.getRaw
        case o => o
      }
      val out = fs.create(p, true)
      try out.write(before(t).toString.getBytes) finally out.close()
    }

    // crash A: A committed, view and B still old → replay skips A,
    // recomputes ΔJ against (A_new, B_old), lands view then B
    rollback("JV"); rollback("JV__B")
    run1()
    assert(view(store, "JV") == expected, "replay from crash-after-A diverged")

    // crash B: A and view committed, B still old → replay only lands B
    val viewVersion = store.currentVersion("JV")
    rollback("JV__B")
    run1()
    assert(store.currentVersion("JV") == viewVersion,
      "replay from crash-after-view must not recommit the view")
    assert(view(store, "JV") == expected)

    // and the B state caught up: a later A insert joins against b2
    JoinView.applyBatch(store, "JV",
      dA(("k2", "a9", "INSERT")), dB(), 2L, Seq("k"), "op")
    assert(view(store, "JV") == Set(
      ("k2", "a2", "b2", 1L), ("k2", "a9", "b2", 1L)))
  }

  test("refreshFromStore maintains the join view over two delta-chain store tables") {
    val dir = Files.createTempDirectory("graft-joinview-cdf").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    def commitA(rows: (Long, String, Int, String, String)*): Int =
      store.commitDelta("A", rows.toDF("seq", "operation", "ID", "K", "AV"),
        "ID", "seq", Seq("K", "AV"))
    def commitB(rows: (Long, String, Int, String, String)*): Int =
      store.commitDelta("B", rows.toDF("seq", "operation", "ID", "K", "BV"),
        "ID", "seq", Seq("K", "BV"))
    def refresh() = JoinView.refreshFromStore(store, "JVC", "A", "B",
      Seq("K"), Seq("AV"), Seq("BV"))
    def expected(): Set[(String, String, String, Long)] =
      store.snapshot("A", null).select("K", "AV")
        .join(store.snapshot("B", null).select("K", "BV"), "K")
        .groupBy("K", "AV", "BV").count()
        .as[(String, String, String, Long)].collect().toSet

    // A fills while B has never held a row: ΔJ = ∅, view untouched
    commitA((1L, "INSERT", 1, "k1", "a1"), (2L, "INSERT", 2, "k2", "a2"))
    assert(refresh() == (0, 0))
    assert(store.currentVersion("JVC") == 0, "empty-side refresh must not commit")

    // B arrives: the B-delta joins the CURRENT A (covers A's backlog)
    commitB((10L, "INSERT", 10, "k1", "b1"))
    refresh()
    assert(view(store, "JVC") == Set(("k1", "a1", "b1", 1L)))
    assert(view(store, "JVC") == expected())

    // a group-moving A update + a new B row in one refresh
    commitA((3L, "UPDATE", 1, "k3", "a1"))
    commitB((11L, "INSERT", 11, "k2", "b2"))
    refresh()
    assert(view(store, "JVC") == Set(("k2", "a2", "b2", 1L)))
    assert(view(store, "JVC") == expected())

    // duplicate projected values multiply: second A row with (k2, a2)
    commitA((4L, "INSERT", 5, "k2", "a2"))
    refresh()
    assert(view(store, "JVC") == Set(("k2", "a2", "b2", 2L)))
    assert(view(store, "JVC") == expected())

    // deleting the B partner retracts every joined row (both a2 copies);
    // k1's b1 has no A partner left (row 1 moved to k3) — view empties
    commitB((12L, "DELETE", 11, "k2", "b2"))
    refresh()
    assert(view(store, "JVC") == expected())
    assert(view(store, "JVC").isEmpty)

    // caught up: refresh is a no-op
    val vv = store.currentVersion("JVC")
    refresh()
    assert(store.currentVersion("JVC") == vv, "no-op refresh must not commit")
  }

  test("property: random two-sided op sequences — incremental view equals batch join") {
    import org.scalacheck.Gen
    def samples[T](g: Gen[T], n: Int): Seq[T] = {
      val p = Gen.Parameters.default
      Iterator.from(0)
        .map(i => g(p, org.scalacheck.rng.Seed(11L + i)))
        .flatten.take(n).toSeq
    }
    // op scripts over a tiny domain so inserts/deletes genuinely collide
    val opGen: Gen[(Boolean, String, String, String)] = for {
      sideA <- Gen.oneOf(true, false)
      k <- Gen.oneOf("k1", "k2", "k3")
      v <- Gen.oneOf("x", "y")
      ins <- Gen.frequency(3 -> true, 1 -> false)
    } yield (sideA, k, v, if (ins) "INSERT" else "DELETE")

    for (scenario <- 0 until 3) {
      val dir = Files.createTempDirectory(s"graft-jv-prop$scenario").toString
      val store = new SnapshotStore(spark, s"$dir/store")
      val script = samples(opGen, 24).zipWithIndex
      // reference multisets, replayed epoch by epoch
      val refA = scala.collection.mutable.Map.empty[(String, String), Long]
      val refB = scala.collection.mutable.Map.empty[(String, String), Long]
      script.grouped(8).zipWithIndex.foreach { case (epoch, id) =>
        val (as, bs) = epoch.partition(_._1._1)
        // a DELETE of a value not present would drive a reference
        // multiset negative — the view algebra handles it (signed
        // multiplicities), and so must the oracle
        def apply(ref: scala.collection.mutable.Map[(String, String), Long],
            ops: Seq[((Boolean, String, String, String), Int)]): Unit =
          ops.foreach { case ((_, k, v, op), _) =>
            val d = if (op == "INSERT") 1L else -1L
            val nv = ref.getOrElse((k, v), 0L) + d
            if (nv == 0L) ref.remove((k, v)) else ref((k, v)) = nv
          }
        apply(refA, as); apply(refB, bs)
        JoinView.applyBatch(store, "JVP",
          as.map { case ((_, k, v, op), _) => (k, v, op) }.toDF("k", "a_val", "op"),
          bs.map { case ((_, k, v, op), _) => (k, v, op) }.toDF("k", "b_val", "op"),
          id.toLong, Seq("k"), "op")
        val expected = (for {
          ((ka, av), ca) <- refA.toSeq
          ((kb, bv), cb) <- refB.toSeq
          if ka == kb
          prod = ca * cb
          if prod != 0L
        } yield ((ka, av, bv), prod))
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          .filter(_._2 != 0L)
          .map { case ((k, a, b), c) => (k, a, b, c) }.toSet
        assert(view(store, "JVP") == expected,
          s"scenario $scenario epoch $id diverged from the batch join")
      }
    }
  }

  test("per-trigger writes are delta-sized, never state-sized") {
    val dir = Files.createTempDirectory("graft-joinview-additive").toString
    // compactEvery high enough that no fold runs inside this test
    val store = new SnapshotStore(spark, s"$dir/store", compactEvery = 100)
    // seed a state much larger than any later batch
    val seedA = (1 to 500).map(i => (s"k$i", s"a$i", "INSERT"))
    val seedB = (1 to 500).map(i => (s"k$i", s"b$i", "INSERT"))
    JoinView.applyBatch(store, "JVD", seedA.toDF("k", "a_val", "op"),
      seedB.toDF("k", "b_val", "op"), 0L, Seq("k"), "op")
    assert(view(store, "JVD").size == 500)

    // one small batch against the 500-row state: the committed version
    // dirs must hold ONLY this batch's deltas (2 side rows + 2 joined
    // rows), not a rewritten state — the additive-backing contract
    JoinView.applyBatch(store, "JVD",
      dA(("k1", "a1", "DELETE"), ("k501", "a501", "INSERT")), dB(),
      1L, Seq("k"), "op")
    def deltaRows(t: String): Long = {
      val v = store.currentVersion(t)
      spark.read.parquet(s"$dir/store/$t/d$v").count()
    }
    assert(deltaRows("JVD__A") == 2, "A-side trigger write must be batch-sized")
    assert(deltaRows("JVD") == 1, "view trigger write must be |matching|-sized")
    assert(deltaRows("JVD__B") == 0, "empty B delta writes no rows")
    // and the merged view is still correct: k1 retracted, k501 unmatched
    assert(!view(store, "JVD").exists(_._1 == "k1"))
    assert(view(store, "JVD").size == 499)
  }

  test("additive chain folds into an aggregated base at the compaction boundary") {
    val dir = Files.createTempDirectory("graft-joinview-fold").toString
    val store = new SnapshotStore(spark, s"$dir/store", compactEvery = 3)
    (0 until 7).foreach { i =>
      JoinView.applyBatch(store, "JVF",
        dA((s"k${i % 2}", "a", "INSERT")), dB((s"k${i % 2}", s"b$i", "INSERT")),
        i.toLong, Seq("k"), "op")
    }
    // multiplicities accumulated across many deltas survive the folds:
    // each k bucket's joined multiplicity = (#a inserts) per matching b
    val got = view(store, "JVF")
    val refA = (0 until 7).groupBy(i => s"k${i % 2}").view.mapValues(_.size.toLong)
    val expected = (0 until 7).map { i =>
      val k = s"k${i % 2}"; (k, "a", s"b$i", refA(k))
    }.toSet
    assert(got == expected)
    // at least one aggregated base exists on disk (the fold ran)
    val aDir = new java.io.File(s"$dir/store/JVF__A")
    assert(aDir.listFiles().exists(_.getName.startsWith("v")),
      "compaction boundary must fold the additive chain into a base")
  }

  test("additive and CDC table kinds refuse each other's readers and writers") {
    val dir = Files.createTempDirectory("graft-joinview-kind").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    JoinView.applyBatch(store, "JVK",
      dA(("k1", "a1", "INSERT")), dB(("k1", "b1", "INSERT")), 0L, Seq("k"), "op")
    // CDC-layout reads of an additive table would bind (seq, op, pk)
    // onto join payload columns — they must refuse loudly
    val e1 = intercept[IllegalStateException] { store.snapshot("JVK", null) }
    assert(e1.getMessage.contains("ADDITIVE"))
    intercept[IllegalStateException] { store.changeFeed("JVK", 0, 1) }
    // and the reverse: a CDC table is not additive
    store.commit("CDCK", Seq(("x", 1L)).toDF("k", "state_cnt"))
    val e2 = intercept[IllegalStateException] {
      store.additiveSnapshot("CDCK", null).collect()
    }
    assert(e2.getMessage.contains("not an additive"))
    val e3 = intercept[IllegalStateException] {
      store.commitAdditive("CDCK", Seq(("x", 1L)).toDF("k", "state_cnt"))
    }
    assert(e3.getMessage.contains("cannot mix"))
  }

  test("streaming start maintains the view over one tagged change stream") {
    val dir = Files.createTempDirectory("graft-joinview-stream").toString
    val store = new SnapshotStore(spark, s"$dir/store")
    val mem = MemoryStream[(String, String, String, String, String)](spark)
    val changes = mem.toDF().toDF("side", "op", "k", "a_val", "b_val")
    val q = JoinView.start(changes, store, "JVS", Seq("k"),
      aCols = Seq("a_val"), bCols = Seq("b_val"), sideCol = "side",
      opCol = "op", s"$dir/ckpt", Trigger.ProcessingTime("0 seconds"))
    try {
      mem.addData(("A", "INSERT", "k1", "a1", ""), ("B", "INSERT", "k1", "", "b1"))
      q.processAllAvailable()
      assert(view(store, "JVS") == Set(("k1", "a1", "b1", 1L)))

      mem.addData(("B", "INSERT", "k1", "", "b2"), ("A", "DELETE", "k1", "a1", ""))
      q.processAllAvailable()
      // the delete retracts a1's contribution to BOTH b rows — but the
      // same-epoch b2 insert joined A_new (post-delete), so nothing of
      // a1 survives: the view is empty
      assert(view(store, "JVS").isEmpty)

      mem.addData(("A", "INSERT", "k1", "a9", ""))
      q.processAllAvailable()
      assert(view(store, "JVS") == Set(("k1", "a9", "b1", 1L), ("k1", "a9", "b2", 1L)))
    } finally q.stop()
  }
}
