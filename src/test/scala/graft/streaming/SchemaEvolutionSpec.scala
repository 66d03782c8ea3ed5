package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** The delta chain's schema-evolution contract: a pure add-column
  * change forces a compaction boundary (no chain segment ever mixes
  * layouts; pre-evolution state null-fills the new column), and every
  * other shape of change — drop, rename, retype — is refused loudly at
  * write time instead of silently mis-binding columns at read time.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(compactEvery: Int = 100) = {
    val dir = Files.createTempDirectory("graft-evo").toString
    (new SnapshotStore(spark, dir, compactEvery), dir)
  }

  private def v1(rows: (Long, String, Int, String)*) =
    rows.toDF("seq", "operation", "ID", "VAL")
  private def v2(rows: (Long, String, Int, String, Int)*) =
    rows.toDF("seq", "operation", "ID", "VAL", "SCORE")

  test("add-column mid-chain forces a compaction boundary and reconstructs correctly") {
    val (store, dir) = newStore()
    store.commitDelta("T", v1((1L, "INSERT", 1, "a"), (2L, "INSERT", 2, "b")),
      "ID", "seq", Seq("VAL"))
    store.commitDelta("T", v1((3L, "UPDATE", 1, "a2")), "ID", "seq", Seq("VAL"))
    assert(store.currentVersion("T") == 2)

    // layout widens: [VAL] -> [VAL, SCORE]. The old chain must fold
    // into a base (v3) before the new-layout delta lands (v4).
    store.commitDelta("T", v2((4L, "INSERT", 3, "c", 7), (5L, "UPDATE", 2, "b2", 9)),
      "ID", "seq", Seq("VAL", "SCORE"))
    assert(Files.exists(Paths.get(s"$dir/T/v3")),
      "schema change must force a compaction boundary")
    assert(Files.exists(Paths.get(s"$dir/T/d4")))

    val now = store.snapshot("T", null)
      .select("ID", "VAL", "SCORE")
      .as[(Int, String, Option[Int])].collect()
      .map { case (k, v, s) => k -> ((v, s)) }.toMap
    assert(now == Map(
      1 -> ("a2", None),     // pre-evolution row: new column is null
      2 -> ("b2", Some(9)),  // updated post-evolution
      3 -> ("c", Some(7))),  // inserted post-evolution
      s"reconstruction drifted: $now")

    // time travel to a pre-evolution version still works
    assert(store.snapshotAt("T", 2).select("ID", "VAL")
      .as[(Int, String)].collect().toMap == Map(1 -> "a2", 2 -> "b"))

    // membership reads stay correct across the boundary
    val pks = store.existingPks("T", store.snapshot("T", null).schema, "ID")
      .as[Int].collect().toSet
    assert(pks == Set(1, 2, 3))

    // and the widened chain keeps committing without further boundaries
    store.commitDelta("T", v2((6L, "DELETE", 1, "a2", 0)), "ID", "seq",
      Seq("VAL", "SCORE"))
    assert(!Files.exists(Paths.get(s"$dir/T/v5")),
      "same-layout commits must not force more boundaries")
    assert(store.snapshot("T", null).select("ID").as[Int].collect().toSet ==
      Set(2, 3))
  }

  test("changeFeed and netChanges across the evolution boundary carry the new column") {
    val (store, _) = newStore()
    store.commitDelta("T", v1((1L, "INSERT", 1, "a"), (2L, "INSERT", 2, "b")),
      "ID", "seq", Seq("VAL"))
    store.commitDelta("T", v2((3L, "UPDATE", 1, "a2", 7), (4L, "INSERT", 3, "c", 9)),
      "ID", "seq", Seq("VAL", "SCORE"))
    // the range spans old-layout d1 and new-layout deltas: the merged
    // feed must KEEP the new column (single-footer inference could
    // silently drop it when an old file's footer wins) with nulls on
    // pre-evolution rows
    val feed = store.changeFeed("T", 0, store.currentVersion("T"))
    assert(feed.columns.contains("SCORE"),
      s"mixed-range feed lost the evolved column: ${feed.columns.mkString(", ")}")
    val rows = feed.select("operation", "ID", "SCORE")
      .as[(String, Int, Option[Int])].collect().toSet
    assert(rows == Set(("INSERT", 1, None), ("INSERT", 2, None),
      ("UPDATE", 1, Some(7)), ("INSERT", 3, Some(9))))
    // and the net classification folds the whole range with the
    // reconciled before image (the changedImages null-fill)
    val net = store.netChanges("T", 0, store.currentVersion("T"))
      .select("ID", "change_type", "SCORE")
      .as[(Int, String, Option[Int])].collect().toSet
    assert(net == Set((1, "INSERT", Some(7)), (2, "INSERT", None),
      (3, "INSERT", Some(9))))
  }

  test("dropping or renaming a column is refused loudly") {
    val (store, _) = newStore()
    store.commitDelta("T", v2((1L, "INSERT", 1, "a", 5)), "ID", "seq",
      Seq("VAL", "SCORE"))
    // rename SCORE -> POINTS against the live chain
    val renamed = Seq((2L, "UPDATE", 1, "a2", 6))
      .toDF("seq", "operation", "ID", "VAL", "POINTS")
    val e1 = intercept[IllegalStateException] {
      store.commitDelta("T", renamed, "ID", "seq", Seq("VAL", "POINTS"))
    }
    assert(e1.getMessage.contains("'T'") && e1.getMessage.contains("add-column"))
    // drop VAL against the live chain
    val dropped = Seq((2L, "UPDATE", 1, 6)).toDF("seq", "operation", "ID", "SCORE")
    val e2 = intercept[IllegalStateException] {
      store.commitDelta("T", dropped, "ID", "seq", Seq("SCORE"))
    }
    assert(e2.getMessage.contains("add-column"))
  }

  test("a delta layout that loses a base column is refused after compaction too") {
    val (store, _) = newStore(compactEvery = 2)
    store.commitDelta("T", v2((1L, "INSERT", 1, "a", 5)), "ID", "seq",
      Seq("VAL", "SCORE"))
    store.commitDelta("T", v2((2L, "INSERT", 2, "b", 6)), "ID", "seq",
      Seq("VAL", "SCORE")) // 2nd commit ⇒ auto-compaction: chain is empty
    // the chain has no outstanding deltas, so only the base can catch this
    val dropped = Seq((3L, "UPDATE", 1, "a2")).toDF("seq", "operation", "ID", "VAL")
    val e = intercept[IllegalStateException] {
      store.commitDelta("T", dropped, "ID", "seq", Seq("VAL"))
    }
    assert(e.getMessage.contains("loses base column"))
  }

  test("retyping a column is refused") {
    val (store, _) = newStore()
    store.commitDelta("T", v1((1L, "INSERT", 1, "a")), "ID", "seq", Seq("VAL"))
    val retyped = Seq((2L, "UPDATE", 1, 42)).toDF("seq", "operation", "ID", "VAL")
    val e = intercept[IllegalStateException] {
      store.commitDelta("T", retyped, "ID", "seq", Seq("VAL"))
    }
    assert(e.getMessage.contains("add-column"))
  }
}
