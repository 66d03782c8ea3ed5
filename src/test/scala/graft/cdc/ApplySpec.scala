package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApplySpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "one", "A"), (2L, "two", "B"), (3L, "three", "C"))
    .toDF("id", "name", "grp")

  private def apply(changes: Seq[(Long, Long, String, String, String)]) = {
    val ch = changes.toDF("seq", "id", "operation", "name", "grp")
    Apply.applyBatch(base, ch, "id", "seq", Seq("name", "grp"))
  }

  test("C-01/02/03: insert, update, delete propagate") {
    val r = apply(Seq(
      (1L, 4L, "INSERT", "four", "D"),
      (2L, 2L, "UPDATE", "two2", "B"),
      (3L, 3L, "DELETE", "three", "C")))
    val t = r.target.orderBy("id").collect()
    assert(t.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    assert(t(1).getString(1) == "two2")
    assert(r.audit.filter($"status" === "SUCCESS").count() == 3)
  }

  test("ST6 upsert conversion: INSERT on existing pk becomes update") {
    val r = apply(Seq((1L, 1L, "INSERT", "one-re", "A")))
    assert(r.target.filter($"id" === 1).head().getString(1) == "one-re")
    assert(r.target.count() == 3)
    val a = r.audit.head()
    assert(a.getAs[String]("status") == "SUCCESS")
    assert(a.getAs[Boolean]("upsert_converted"))
  }

  test("ST7 missing target: UPDATE/DELETE on absent pk → TARGET_NOT_FOUND, skipped") {
    val r = apply(Seq(
      (1L, 9L, "UPDATE", "ghost", "X"),
      (2L, 8L, "DELETE", "ghost", "X")))
    assert(r.target.count() == 3) // base untouched
    assert(r.audit.filter($"status" === "TARGET_NOT_FOUND").count() == 2)
  }

  test("O4 ordered apply: late UPDATE after INSERT wins; UPDATE-then-INSERT keeps insert") {
    val r = apply(Seq(
      (1L, 5L, "UPDATE", "u-first", "X"), // skipped: not found yet
      (2L, 5L, "INSERT", "i-second", "X"),
      (3L, 5L, "UPDATE", "u-third", "X"))) // applies after insert
    val row = r.target.filter($"id" === 5).head()
    assert(row.getString(1) == "u-third")
    val st = r.audit.orderBy("cdc_seq").as[(Long, String, String, String, Boolean)].collect()
    assert(st.map(_._4).toSeq == Seq("TARGET_NOT_FOUND", "SUCCESS", "SUCCESS"))
  }

  test("delete then re-insert within one batch survives with new values") {
    val r = apply(Seq(
      (1L, 2L, "DELETE", "x", "x"),
      (2L, 2L, "INSERT", "two-new", "B2"),
      (3L, 1L, "DELETE", "x", "x")))
    val t = r.target.orderBy("id").collect()
    assert(t.map(_.getLong(0)).toSeq == Seq(2L, 3L))
    assert(t(0).getString(1) == "two-new")
  }

  test("update after in-batch delete is skipped, key stays dead") {
    val r = apply(Seq(
      (1L, 3L, "DELETE", "x", "x"),
      (2L, 3L, "UPDATE", "zombie", "x")))
    assert(!r.target.collect().map(_.getLong(0)).contains(3L))
    assert(r.audit.filter($"status" === "TARGET_NOT_FOUND").count() == 1)
  }

  test("ST8 error isolation splits invalid rows with reason") {
    val df = Seq((1L, "ok"), (2L, null.asInstanceOf[String])).toDF("id", "v")
    val (valid, dead) = Apply.errorIsolate(df, $"v".isNotNull, lit("null value"))
    assert(valid.count() == 1 && dead.count() == 1)
    assert(dead.head().getAs[String]("error_msg") == "null value")
  }

  test("audit-only consumption prunes the base scan to the pk column") {
    // the micro-batch audit's one O(|table|) touch is the existence
    // check; Catalyst must prune the base read to the pk — a regression
    // here silently reads every payload column per trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    Seq((1L, "a", "b", "c")).toDF("id", "c1", "c2", "c3")
      .write.parquet(s"$dir/base")
    val base = spark.read.parquet(s"$dir/base")
    val changes = Seq((1L, 1L, "UPDATE", "x", "y", "z"))
      .toDF("seq", "id", "operation", "c1", "c2", "c3")
    val audit = Apply.applyBatch(base, changes, "id", "seq",
      Seq("c1", "c2", "c3")).audit
    val exec = audit.queryExecution.executedPlan
    val inner = exec match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val readSchemas = inner.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.requiredSchema
    }
    assert(readSchemas.nonEmpty)
    readSchemas.foreach(sch =>
      assert(sch.fieldNames.toSeq == Seq("id"),
        s"base scan should read only the pk, got ${sch.fieldNames.mkString(",")}"))
  }
}
