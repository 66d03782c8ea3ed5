package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, concat, lit}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import java.nio.file.Files

/** Store-op fuzzer — seam testing, systematized. The round-10
  * changedImages bug lived at the COMPOSITION of two individually-green
  * features (add-column evolution × feed-range reads) and only a
  * composed spec caught it; this suite generates seeded-random op
  * sequences over one table — commitDelta / compact / evolve-add-column
  * / deleteWhere / updateWhere / vacuum / cloneAt / syncFromStore — and
  * checks EVERY step against a driver-side model:
  *
  *  - `snapshot` == the model's current state after every op;
  *  - `snapshotAt(v)` == the model's recorded state at v (≥ horizon);
  *  - `changeFeed(i, j)` == the model's recorded events for the range;
  *  - `netChanges(i, j)` == the model's endpoint classification;
  *  - the synced JDBC target == the model whenever a sync lands;
  *  - cloned tables == the model state at the cloned version;
  *  - reads below the vacuum horizon refuse.
  *
  * The model replays the engine's OWN apply semantics (INSERT upserts,
  * UPDATE applies only to existing keys, DELETE of a missing key
  * no-ops) sequentially per event — any divergence between "merge the
  * events on read" and "apply them one at a time" is a real bug.
  */
class StoreFuzzSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftfuzz;create=true"

  private case class Evt(seq: Long, op: String, pk: Long, vals: Map[String, String])

  private type State = Map[Long, Map[String, String]]

  /** Driver-side model: states / events / commit instants indexed by
    * store version.
    */
  private final class Model {
    var state: State = Map.empty
    var now: Long = 10000L
    val states = scala.collection.mutable.ArrayBuffer[State](Map.empty)
    val events = scala.collection.mutable.ArrayBuffer[Seq[Evt]](Seq.empty)
    val tss = scala.collection.mutable.ArrayBuffer[Long](0L)
    var dataCols: Seq[String] = Seq("VAL")

    def applySequential(evts: Seq[Evt]): State =
      evts.sortBy(e => (e.seq, e.pk)).foldLeft(state) { (s, e) =>
        e.op match {
          case "INSERT" => s + (e.pk -> e.vals)
          case "UPDATE" => if (s.contains(e.pk)) s + (e.pk -> e.vals) else s
          case "DELETE" => s - e.pk
        }
      }

    /** Record the state/events at `newVersion`; versions skipped in
      * between (forced compaction boundaries) carry the pre-op state
      * and this op's clock instant.
      */
    def record(newVersion: Int, newState: State, evts: Seq[Evt]): Unit = {
      while (states.length < newVersion) {
        states += state; events += Seq.empty; tss += now
      }
      states += newState; events += evts; tss += now
      assert(states.length == newVersion + 1, "model/version drift")
      state = newState
    }
  }

  private def eventsDf(evts: Seq[Evt], dataCols: Seq[String]): DataFrame = {
    val schema = StructType(
      Seq(StructField("seq", LongType), StructField("operation", StringType),
        StructField("ID", LongType)) ++
        dataCols.map(c => StructField(c, StringType)))
    val rows = evts.map(e =>
      Row.fromSeq(Seq(e.seq, e.op, e.pk) ++ dataCols.map(c => e.vals.get(c).orNull)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Collect a (ID, data…) frame into the model's shape, null-safe. */
  private def collectState(df: DataFrame): State = {
    val dataCols = df.columns.filterNot(_ == "ID")
    df.collect().map { r =>
      r.getLong(r.fieldIndex("ID")) ->
        dataCols.flatMap(c => Option(r.getAs[String](c)).map(c -> _)).toMap
    }.toMap
  }

  private def assertStateEquals(df: DataFrame, want: State, what: String): Unit = {
    val cols = df.columns.filterNot(_ == "ID").toSet
    val wantVisible = want.map { case (pk, vals) =>
      pk -> vals.filter { case (c, _) => cols.contains(c) }
    }
    assert(collectState(df) == wantVisible, what)
  }

  private def ddl(sql: String*): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try sql.foreach(st.executeUpdate) finally st.close()
    } finally c.close()
  }

  private def runSequence(seqIdx: Int, seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = Files.createTempDirectory(s"graft-fuzz-$seqIdx").toString
    val store = new SnapshotStore(spark, s"$dir/store", compactEvery = 3)
    val m = new Model
    var seqCtr = 1L
    var cloneCtr = 0
    val target = s"FZT$seqIdx"
    ddl(s"CREATE TABLE $target (ID BIGINT PRIMARY KEY, VAL VARCHAR(200))")

    def nextSeq(): Long = { val s = seqCtr; seqCtr += 1; s }

    def freshVals(): Map[String, String] =
      m.dataCols.map(c => c -> s"${c.toLowerCase}${nextSeq()}").toMap

    def randomEvents(n: Int): Seq[Evt] = (0 until n).map { _ =>
      val pk = rnd.nextInt(12).toLong
      val op =
        if (m.state.contains(pk)) Seq("INSERT", "UPDATE", "UPDATE", "DELETE")(rnd.nextInt(4))
        else Seq("INSERT", "INSERT", "INSERT", "UPDATE", "DELETE")(rnd.nextInt(5))
      Evt(nextSeq(), op, pk, freshVals())
    }

    def doCommit(): Unit = {
      val evts = randomEvents(1 + rnd.nextInt(5))
      store.commitDelta("F", eventsDf(evts, m.dataCols), "ID", "seq",
        m.dataCols)
      m.record(store.currentVersion("F"), m.applySequential(evts), evts)
    }

    def doEvolve(): Unit = {
      m.dataCols = m.dataCols :+ s"V${m.dataCols.length + 1}"
      doCommit() // first commit in the new layout forces the boundary
    }

    def doCompact(): Unit = {
      val pre = store.currentVersion("F")
      store.compact("F") // content-preserving; no-op when already a base
      if (store.currentVersion("F") != pre)
        m.record(store.currentVersion("F"), m.state, Seq.empty)
    }

    def doDeleteWhere(): Unit = {
      val r = rnd.nextInt(3)
      val s = nextSeq()
      val matching = m.state.keySet.filter(_ % 3 == r)
      val n = store.deleteWhere("F", col("ID") % 3 === r, "ID", s)
      assert(n == matching.size.toLong, s"deleteWhere count: $n vs $matching")
      if (matching.nonEmpty) {
        val evts = matching.toSeq.sorted.map(pk => Evt(s, "DELETE", pk, m.state(pk)))
        m.record(store.currentVersion("F"), m.state -- matching, evts)
      }
    }

    def doUpdateWhere(): Unit = {
      val r = rnd.nextInt(4)
      val s = nextSeq()
      val matching = m.state.keySet.filter(_ % 4 == r)
      val n = store.updateWhere("F", col("ID") % 4 === r, "ID", s,
        Map("VAL" -> concat(lit(s"u${s}_"), col("ID").cast("string"))))
      assert(n == matching.size.toLong, s"updateWhere count: $n vs $matching")
      if (matching.nonEmpty) {
        val evts = matching.toSeq.sorted.map { pk =>
          Evt(s, "UPDATE", pk, m.state(pk) + ("VAL" -> s"u${s}_$pk"))
        }
        m.record(store.currentVersion("F"),
          m.state ++ evts.map(e => e.pk -> e.vals), evts)
      }
    }

    def doClone(): Unit = {
      val cur = store.currentVersion("F")
      if (cur >= 1) {
        val v = store.horizon("F") + rnd.nextInt(cur - store.horizon("F") + 1)
        cloneCtr += 1
        val dest = s"FC$cloneCtr"
        store.cloneAt("F", v, dest)
        assertStateEquals(store.snapshot(dest, null), m.states(v),
          s"clone of v$v drifted (seed $seed)")
      }
    }

    def doSync(): Unit = {
      val fromV = graft.sources.Jdbc.syncedVersion(url, target)
      val toV = store.currentVersion("F")
      val h = store.horizon("F")
      if (fromV < toV && h > 1 && fromV < h) {
        // the watermark predates the vacuum horizon: netChanges needs
        // the BEFORE snapshot at the watermark (reconstructable only at
        // ≥ horizon), so the sync MUST refuse, not guess
        intercept[IllegalArgumentException] {
          graft.sources.Jdbc.syncFromStore(store, "F", url, target, s"FZS$seqIdx")
        }
      } else {
        graft.sources.Jdbc.syncFromStore(store, "F", url, target, s"FZS$seqIdx",
          stagingColumnTypes = Some((m.dataCols.map(c => s"$c VARCHAR(200)") :+
            "CHANGE_TYPE VARCHAR(10)").mkString(", ")))
        assertStateEquals(
          graft.sources.Jdbc.read(spark, url, target, new java.util.Properties),
          m.state, s"synced JDBC target drifted (seed $seed)")
      }
    }

    def doVacuum(): Unit = { store.vacuum("F"); () }

    store.clock = () => m.now
    val len = 6 + rnd.nextInt(4)
    (0 until len).foreach { _ =>
      m.now += 1000L // every op (and every version it creates) gets one instant
      rnd.nextInt(12) match {
        case 0 | 1 | 2 | 3 => doCommit()
        case 4             => if (m.dataCols.length < 3) doEvolve() else doCommit()
        case 5             => doCompact()
        case 6             => doDeleteWhere()
        case 7             => doUpdateWhere()
        case 8             => doVacuum()
        case 9             => doClone()
        case _             => doSync()
      }
      // invariant after EVERY op: merge-on-read == the model
      val cur = store.currentVersion("F")
      if (cur == 0) assert(m.state.isEmpty)
      else assertStateEquals(store.snapshot("F", null), m.state,
        s"snapshot drifted after an op (seed $seed)")
    }

    // ---- end-of-sequence range checks --------------------------------
    val cur = store.currentVersion("F")
    val h = store.horizon("F")
    if (cur >= 1) {
      // snapshotAt at every surviving version
      (h to cur).foreach { v =>
        assertStateEquals(store.snapshotAt("F", v), m.states(v),
          s"snapshotAt(v$v) drifted (seed $seed)")
      }
      // changeFeed == recorded events; netChanges == endpoint diff,
      // over random in-horizon ranges. Lower bounds differ by design:
      // the feed reads deltas alone (from ≥ h−1 suffices), while
      // netChanges reconstructs the BEFORE snapshot at `from`, so it
      // needs from ≥ h (or 0 on a never-vacuumed chain).
      (0 until 3).foreach { _ =>
        val iNetLo = if (h == 1) 0 else h
        val i = iNetLo + rnd.nextInt(cur - iNetLo + 1)
        val j = i + rnd.nextInt(cur - i + 1)
        val feed = store.changeFeed("F", i, j)
        val fCols = feed.columns.drop(4).toSeq // commit_version, seq, op, ID
        val gotFeed = feed.collect().map { r =>
          (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3),
            fCols.map(c => Option(r.getAs[String](c))))
        }.toSet
        val wantFeed = (i + 1 to j).flatMap { v =>
          m.events(v).map(e =>
            (v, e.seq, e.op, e.pk, fCols.map(e.vals.get)))
        }.toSet
        assert(gotFeed == wantFeed, s"changeFeed($i,$j) drifted (seed $seed)")

        val net = store.netChanges("F", i, j)
        val nCols = net.columns.drop(2).toSeq
        val gotNet = net.collect().map { r =>
          (r.getLong(0), r.getString(1), nCols.map(c => Option(r.getAs[String](c))))
        }.toSet
        val touched = (i + 1 to j).flatMap(v => m.events(v).map(_.pk)).toSet
        val wantNet = touched.flatMap { pk =>
          (m.states(i).contains(pk), m.states(j).contains(pk)) match {
            case (false, true) =>
              Some((pk, "INSERT", nCols.map(m.states(j)(pk).get)))
            case (true, true) =>
              Some((pk, "UPDATE", nCols.map(m.states(j)(pk).get)))
            case (true, false) =>
              Some((pk, "DELETE", nCols.map(_ => None: Option[String])))
            case _ => None
          }
        }
        assert(gotNet == wantNet, s"netChanges($i,$j) drifted (seed $seed)")
      }
      // timestamp resolution: versionAsOf / snapshotAsOf against the
      // model's recorded commit instants (ties across a forced
      // compaction boundary resolve to the HIGHEST version at that
      // instant — the op's final state)
      (0 until 3).foreach { _ =>
        val v = h + rnd.nextInt(cur - h + 1)
        val ts = m.tss(v) + 500L
        val wantV = (1 to cur).filter(x => m.tss(x) <= ts).max
        assert(store.versionAsOf("F", ts) == wantV,
          s"versionAsOf($ts) drifted (seed $seed)")
        assertStateEquals(store.snapshotAsOf("F", ts), m.states(wantV),
          s"snapshotAsOf($ts) drifted (seed $seed)")
      }
      // below the horizon every read path refuses
      if (h > 1) {
        intercept[Exception](store.snapshotAt("F", h - 1))
        intercept[Exception](store.changeFeed("F", h - 2, cur))
        intercept[IllegalArgumentException](
          store.versionAsOf("F", m.tss(h) - 500L))
      }
    }
  }

  test("50 seeded-random op sequences: snapshot/feed/netChanges/sync/clone all match the model") {
    val n = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(50)
    (0 until n).foreach(i => runSequence(i, seed = 1000L + i))
  }
}
