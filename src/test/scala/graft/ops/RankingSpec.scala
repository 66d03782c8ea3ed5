package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Correctness + plan-shape assertions for the distributed exact
  * ranking operator. The plan claims matter as much as the values: a
  * regression back to `Window.orderBy(...)` without a partitionBy would
  * still return correct rows at test scale and only explode at 100 TB,
  * so the "no unpartitioned window" property is pinned here the same
  * way TemporalPlanSpec pins the as-of join shape.
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  // 997 rows (prime, never divides evenly), with duplicate v values so
  // the tie-break is actually exercised
  private lazy val fixture = (1 to 997).map(i => ((i * 7919) % 250, i.toLong))
    .toDF("v", "id")

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.except(b).isEmpty && b.except(a).isEmpty

  test("withGlobalRank equals single-partition row_number (asc)") {
    val got = Ranking.withGlobalRank(fixture, "rk", Seq(col("v").asc, col("id").asc))
    val want = fixture.withColumn("rk",
      row_number().over(Window.orderBy(col("v").asc, col("id").asc)).cast("long"))
    assert(sameRows(got, want))
  }

  test("withGlobalRank equals single-partition row_number (desc sort)") {
    val got = Ranking.withGlobalRank(fixture, "rk", Seq(col("v").desc, col("id").asc))
    val want = fixture.withColumn("rk",
      row_number().over(Window.orderBy(col("v").desc, col("id").asc)).cast("long"))
    assert(sameRows(got, want))
  }

  test("withNtile equals SQL NTILE for n = 4, 7, 10 (uneven remainders)") {
    for (n <- Seq(4, 7, 10)) {
      val got = Ranking.withNtile(fixture, n, "t", Seq(col("v").asc, col("id").asc))
      val want = fixture.withColumn("t",
        ntile(n).over(Window.orderBy(col("v").asc, col("id").asc)).cast("long"))
      assert(sameRows(got, want), s"ntile($n) mismatch")
    }
  }

  test("withNtile: n larger than the row count (each row its own tile)") {
    val tiny = Seq((3, 1L), (1, 2L), (2, 3L)).toDF("v", "id")
    val got = Ranking.withNtile(tiny, 10, "t", Seq(col("v").asc, col("id").asc))
    val want = tiny.withColumn("t",
      ntile(10).over(Window.orderBy(col("v").asc, col("id").asc)).cast("long"))
    assert(sameRows(got, want))
  }

  private def unpartitionedWindows(df: DataFrame): Seq[LogicalWindow] =
    df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty => w
    }

  test("Ranking itself plans no unpartitioned window") {
    val got = Ranking.withNtile(fixture, 4, "t", Seq(col("v").asc, col("id").asc))
    assert(unpartitionedWindows(got).isEmpty)
  }

  test("withBoundedRank equals withGlobalRank on a bounded input and keeps a partition key") {
    val bounded = fixture.orderBy(col("v").asc, col("id").asc).limit(37)
    val got = Ranking.withBoundedRank(bounded, "rk", Seq(col("v").asc, col("id").asc))
    val want = Ranking.withGlobalRank(bounded, "rk", Seq(col("v").asc, col("id").asc))
      .withColumn("rk", col("rk").cast("int"))
    assert(sameRows(got, want))
    // the fast path must not reintroduce the unpartitioned-window shape
    assert(unpartitionedWindows(got).isEmpty)
  }

  test("vb1/bp1 (bounded-rank consumers) plan no unpartitioned window") {
    for (q <- Seq("vb1_vocab_topk", "bp1_bpe_pairs")) {
      val df = graft.SparkEntry.queries(q)(spark, sfSmoke)
      assert(unpartitionedWindows(df).isEmpty, s"$q has an unpartitioned window")
    }
  }

  test("withGroupedRank equals per-group row_number and plans no unpartitioned window") {
    // 3 groups of very different sizes (g0 dominates), dup v values
    val grouped = (1 to 997)
      .map(i => (s"g${(i * i) % 7 % (1 + i % 3)}", (i * 7919) % 250, i.toLong))
      .toDF("g", "v", "id")
    val got = Ranking.withGroupedRank(grouped, "g", "rk",
      Seq(col("v").asc, col("id").asc))
    val want = grouped.withColumn("rk",
      row_number().over(Window.partitionBy(col("g"))
        .orderBy(col("v").asc, col("id").asc)).cast("long"))
    assert(sameRows(got, want))
    assert(unpartitionedWindows(got).isEmpty)
  }

  test("withGroupedPrefixSum equals the per-group window running sum; no unpartitioned window") {
    // 3 groups of very different sizes (g0 dominates), dup sort values
    val grouped = (1 to 997)
      .map(i => (s"g${(i * i) % 7 % (1 + i % 3)}", (i * 7919) % 250, i.toLong,
        (i % 13 + 1).toLong))
      .toDF("g", "v", "id", "n")
    val got = Ranking.withGroupedPrefixSum(grouped, "g", col("n"), "ps",
      Seq(col("v").asc, col("id").asc))
    val want = grouped.withColumn("ps",
      coalesce(sum(col("n")).over(Window.partitionBy(col("g"))
        .orderBy(col("v").asc, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    assert(sameRows(got, want))
    assert(unpartitionedWindows(got).isEmpty)
  }

  test("tokenBudgetCut keeps exactly the prefix that fits; truncation is monotone") {
    // one dominant source: budget 20 over docs of 7 tokens each in id
    // order keeps ids 1-2 (before 0, 7), drops id 3 (before 14, 14+7>20)
    // and everything after; source b (budget 20, docs 9+9+9) keeps 2
    val rows = (1 to 500).map(i => ("a", i.toLong, 7L)) ++
      (1 to 3).map(i => ("b", i.toLong, 9L))
    val budgets = Seq(("a", 20L), ("b", 20L)).toDF("src", "budget")
    val kept = Packing.tokenBudgetCut(rows.toDF("src", "id", "n"),
        "src", "n", Seq(col("id")), budgets)
      .select(col("src"), col("id"), col("tokens_before"))
      .orderBy(col("src"), col("id"))
      .as[(String, Long, Long)].collect().toSeq
    assert(kept == Seq(("a", 1L, 0L), ("a", 2L, 7L), ("b", 1L, 0L), ("b", 2L, 9L)))
  }

  test("epochUpsample: full repeats, hash-selected fraction, and both clamps") {
    // a: budget 25 over 10 tokens -> epochs6 = 2.5e6 (2 full + 50% frac)
    // b: budget 100 over 10     -> caps at 4 epochs exactly
    // c: budget 3 over 10       -> floors at 1 (cutting is tb1's job)
    val rows = Seq(("a", 1L, 4L), ("a", 2L, 6L),
      ("b", 3L, 10L), ("c", 4L, 10L))
    val budgets = Seq(("a", 25L), ("b", 100L), ("c", 3L))
      .toDF("src", "budget")
    val out = Packing.epochUpsample(rows.toDF("src", "id", "n"),
        "src", "id", "n", budgets)
      .select(col("src"), col("id"), col("epochs6"), col("epoch_idx"))
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    assert(out.filter(_._1 == "b").map(_._4).sorted == Seq(1L, 2L, 3L, 4L),
      "budget 10x unique tokens must cap at exactly 4 epochs")
    assert(out.filter(_._1 == "c") == Seq(("c", 4L, 1000000L, 1L)),
      "a below-one budget floors at one epoch, never zero")
    val a = out.filter(_._1 == "a")
    assert(a.forall(_._3 == 2500000L))
    // every a-doc repeats 2 or 3 times; the 3rd copy is the doc hash's
    // call (deterministic — recompute it the gate's way)
    def h(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"up|$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % 1000000L
    }
    Seq(1L, 2L).foreach { id =>
      val want = 2L + (if (h(id) < 500000L) 1L else 0L)
      assert(a.count(_._2 == id).toLong == want,
        s"doc $id repeat count drifted from the hash-Bernoulli model")
    }
    // determinism: a re-run materializes the identical corpus
    val again = Packing.epochUpsample(rows.toDF("src", "id", "n"),
        "src", "id", "n", budgets)
      .select(col("src"), col("id"), col("epochs6"), col("epoch_idx"))
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    assert(again == out)
  }

  test("interleaveByWeight prefixes hold sources in weight proportion") {
    // a:600, b:300, c:100 rows with weights 6:3:1 -> any aligned prefix
    // of the vt order holds them 6:3:1 (fair queueing's invariant)
    val rows = (1 to 600).map(i => ("a", i.toLong)) ++
      (1 to 300).map(i => ("b", i.toLong)) ++
      (1 to 100).map(i => ("c", i.toLong))
    val w = Seq(("a", 6000000L), ("b", 3000000L), ("c", 1000000L))
      .toDF("src", "w6")
    val out = Packing.interleaveByWeight(rows.toDF("src", "id"), "src",
        Seq(col("id")), w)
      .orderBy(col("vt"), col("src"), col("src_rank"))
      .limit(100)
      .groupBy(col("src")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 60L, "b" -> 30L, "c" -> 10L))
  }

  test("rfm1_segments plans no unpartitioned window") {
    val df = graft.SparkEntry.queries("rfm1_segments")(spark, sfSmoke)
    assert(unpartitionedWindows(df).isEmpty)
  }

  test("nt1_ntile_deciles plans no unpartitioned window") {
    val df = graft.SparkEntry.queries("nt1_ntile_deciles")(spark, sfSmoke)
    assert(unpartitionedWindows(df).isEmpty)
  }
}
