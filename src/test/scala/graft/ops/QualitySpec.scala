package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Data-quality expectations: exact violation counts on hand data,
  * including the null edge cases each check must own.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val d = Seq(
    (1, Some(10.0), "A"),
    (2, Some(99.0), "X"),  // out of range + out of set
    (3, None, "N"),        // null value
    (3, Some(20.0), "R"),  // duplicate id
    (4, Some(20.0), "R")).toDF("id", "v", "flag")

  test("one-pass report: exact violation counts, nulls owned by the right check") {
    val got = Quality.report(d, Seq(
        Quality.notNull("v"),
        Quality.inRange("v", 0.0, 50.0),
        Quality.inSet("flag", Seq("A", "N", "R")),
        Quality.unique("id")))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("not_null(v)") == ((1L, false)))
    assert(got("in_range(v)") == ((2L, false)), "null AND 99.0 both violate the bound")
    assert(got("in_set(flag)") == ((1L, false)))
    assert(got("unique(id)") == ((1L, false)), "one duplicate beyond the first")
    // and a clean table passes everything
    val clean = Quality.report(d.filter(col("id") === 4),
      Seq(Quality.notNull("v"), Quality.unique("id")))
      .as[(String, Long, Boolean)].collect()
    assert(clean.forall(r => r._2 == 0L && r._3))
  }

  test("fkOrphans counts rows with no dimension partner") {
    val dim = Seq(1, 3).toDF("pk")
    val got = Quality.fkOrphans(d, "id", dim, "pk")
      .as[(String, Long, Boolean)].collect().head
    assert(got == (("fk(id)", 2L, false)), s"ids 2 and 4 are orphans, got $got")
  }
}
