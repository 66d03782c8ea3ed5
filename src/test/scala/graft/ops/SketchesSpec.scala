package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hll estimate is within ~10% of truth at 10k distinct (m=256 -> ~6.5% rse)") {
    val d = (1 to 10000).map(_.toLong).toDF("v")
    val row = Sketches.hllDistinct(d, col("v")).collect().head
    val est = row.getAs[Double]("hll_estimate")
    assert(math.abs(est - 10000.0) / 10000.0 < 0.10, s"estimate $est")
    assert(row.getAs[Long]("buckets_used") == 256L)
  }

  test("hll is insensitive to duplicates") {
    val once = (1 to 500).map(_.toLong).toDF("v")
    val thrice = ((1 to 500) ++ (1 to 500) ++ (1 to 500)).map(_.toLong).toDF("v")
    val a = Sketches.hllDistinct(once, col("v")).collect().head.getDouble(0)
    val b = Sketches.hllDistinct(thrice, col("v")).collect().head.getDouble(0)
    assert(a == b)
  }

  test("count-min estimate upper-bounds exact counts and is exact sans collisions") {
    val d = (Seq.fill(50)("hot") ++ (1 to 30).map(i => s"cold$i")).toDF("v")
    val table = Sketches.countMinTable(d, col("v"), d = 4, w = 1024)
    val probes = Seq("hot", "cold1").toDF("v")
    val est = Sketches.countMinEstimate(table, probes, "v", d = 4, w = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // w=1024 over 31 distinct values: collision-free with overwhelming
    // probability, so the min-over-rows recovers the exact counts
    assert(est("hot") == 50L)
    assert(est("cold1") == 1L)
  }

  test("bloom filter has no false negatives and bounded false positives") {
    val members = (1 to 200).map(_.toLong).toDF("v")
    val filter = Sketches.bloomBuild(members, col("v"), mBits = 16384, k = 3)
    val probes = (1 to 2000).map(_.toLong).toDF("v")
    val flags = Sketches.bloomProbe(filter, probes, "v", mBits = 16384, k = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert((1 to 200).forall(i => flags(i.toLong)), "false negative!")
    val fps = (201 to 2000).count(i => flags(i.toLong))
    // load 200*3/16384 ≈ 0.037 -> fp ≈ (1-e^-0.037)^3 ≈ 5e-5; 1800 probes
    assert(fps <= 5, s"$fps false positives out of 1800")
  }

  test("zOutliers flags a planted extreme value and not a tight cluster") {
    val d = ((1 to 99).map(i => ("a", 10.0 + (i % 3))) :+ (("a", 1000.0)))
      .toDF("g", "v")
    val out = Stats.zOutliers(d, "g", "v", zThresh = 3.0).collect().head
    assert(out.getAs[Long]("n") == 100L)
    assert(out.getAs[Long]("n_outliers") == 1L)
    assert(out.getAs[Double]("max_absz6") > 3.0)
  }

  test("zOutliers reports zero outliers for a constant group (sd = 0)") {
    val d = Seq(("c", 5.0), ("c", 5.0), ("c", 5.0)).toDF("g", "v")
    val out = Stats.zOutliers(d, "g", "v", 3.0).collect().head
    assert(out.getAs[Long]("n_outliers") == 0L)
    assert(out.getAs[Double]("max_absz6") == 0.0)
  }

  test("zOutliers at high group cardinality: no forced broadcast in the plan") {
    // group = per-row id: as many groups as rows. The stats side is as
    // large as the input — a broadcast hint here would build a
    // driver-sized hash table at corpus scale. The plan must be free to
    // shuffle (no BroadcastHashJoin forced by a hint on stats).
    val d = (1 to 5000).map(i => (i.toLong, (i % 7).toDouble)).toDF("g", "v")
    val q = Stats.zOutliers(d, "g", "v", 3.0)
    val hinted = q.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.hint.leftHint.exists(_.strategy.isDefined) ||
            j.hint.rightHint.exists(_.strategy.isDefined) => j
    }
    assert(hinted.isEmpty, "zOutliers must not force a join strategy")
    assert(q.count() == 5000L) // still completes and yields one row per group
  }

  test("profile: null and distinct counts per column in one pass") {
    val d = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "a"), (null, "b"),
      (3L, null), (3L, "b")).toDF("id", "tag")
    val got = Profile.profile(d, Seq("id", "tag")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("id") == ((5L, 1L, 3L)))  // 5 rows, 1 null, distinct {1,2,3}
    assert(got("tag") == ((5L, 1L, 2L))) // distinct {a,b}
  }

  test("profileApprox: sketch-based distincts land within the error band") {
    val d = (1 to 5000).map(i => (i.toLong, (i % 50).toString)).toDF("id", "tag")
    val got = Profile.profileApprox(d, Seq("id", "tag")).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(got("id") - 5000L) <= 500L, s"id approx ${got("id")}")
    assert(math.abs(got("tag") - 50L) <= 5L, s"tag approx ${got("tag")}")
  }

  test("histogram: bins partition all rows; max value lands in the last bin") {
    val d = (0 to 100).map(_.toDouble).toDF("v")
    val h = Profile.histogram(d, "v", 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h.values.sum == 101L)
    assert(h.keySet.max == 9L && h.keySet.min == 0L)
    assert(h(9L) == 11L) // 90..99 plus v=100 closed into the top bin
    // degenerate: constant column -> everything in bin 0
    val c = Seq(5.0, 5.0, 5.0).toDF("v")
    val hc = Profile.histogram(c, "v", 10).collect()
    assert(hc.length == 1 && hc.head.getLong(0) == 0L && hc.head.getLong(1) == 3L)
  }

  test("histogram: null values are excluded, not binned into the top bin") {
    val d = Seq[java.lang.Double](0.0, 1.0, 2.0, null, null).toDF("v")
    val h = Profile.histogram(d, "v", 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // pre-fix, least(null, bins-1) silently put both nulls in bin 1;
    // bins over [0,2]: 0 -> bin 0, 1 and 2 (closed top edge) -> bin 1
    assert(h.values.sum == 3L)
    assert(h == Map(0L -> 1L, 1L -> 2L))
  }

  test("weightedHashSample: fractional weights keep their probability; null weights drop") {
    val d = (0 until 2000).map(i => (i.toLong, 0.5)).toDF("id", "w")
    // p(keep) = 0.5·500000/10⁶ = 0.25 — the pre-fix long-cast truncated
    // the weight to 0 and kept NOTHING
    val kept = Stats.weightedHashSample(d, "id", "w", scale = 500000L).count()
    assert(kept > 2000 * 0.20 && kept < 2000 * 0.30, s"kept $kept of 2000")
    val withNulls = Seq[(java.lang.Long, java.lang.Double)]((1L, null), (2L, 1.0))
      .toDF("id", "w")
    // null weight must not default to always-kept
    val keptIds = Stats.weightedHashSample(withNulls, "id", "w", scale = 1000000L)
      .collect().map(_.getLong(0)).toSet
    assert(keptIds == Set(2L))
  }

  test("quantizeInt8 digest: max-magnitude element maps to ±127") {
    val d = Seq((1L, Array(0.5f, -1.0f, 0.25f)), (2L, Array(0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.quantizeInt8(d, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // q = round(127 * v / 1.0) = (64, -127, 32): sum -31, min -127, max 64
    assert(out(1L) == ((1.0, -31L, -127L, 64L)))
    assert(out(2L) == ((0.0, 0L, 0L, 0L))) // zero vector -> all zeros
  }

  test("dimStats computes fixed-point mean and variance per dimension") {
    val d = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.dimStats(d, "embedding").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) == ((2L, 2.0, 1.0)))  // mean 2, var ((1-2)²+(3-2)²)/2 = 1
    assert(out(2L) == ((2L, 2.0, 0.0)))
  }

  test("kmv: estimate lands in the 1/sqrt(k) band; duplicates change nothing") {
    val k = 64
    val d = (1 to 5000).map(v => ("g", v.toLong)).toDF("g", "v")
    val sk = Sketches.kmvGroupedSketch(d, col("g"), col("v"), k)
    val est = sk.select(Sketches.kmvEstimate(col("kmv"), k)).head().getDouble(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.40, s"estimate $est") // 3·rse ≈ 0.375
    val dup = (d.union(d)).union(d)
    val sk3 = Sketches.kmvGroupedSketch(dup, col("g"), col("v"), k)
    assert(sk3.select(col("kmv")).head().getSeq[Long](0)
      == sk.select(col("kmv")).head().getSeq[Long](0))
  }

  test("kmv: small sets are carried exactly (sketch IS the distinct set)") {
    val d = (1 to 40).map(v => ("g", v.toLong)).toDF("g", "v")
    val sk = Sketches.kmvGroupedSketch(d, col("g"), col("v"), 256)
    val row = sk.select(size(col("kmv")), Sketches.kmvEstimate(col("kmv"), 256)).head()
    assert(row.getInt(0) == 40)
    assert(row.getDouble(1) == 40.0)
  }

  test("kmv merge of per-slice sketches equals the direct union sketch") {
    val k = 32
    val a = (1 to 3000).map(v => ("a", v.toLong)).toDF("g", "v")
    val b = (2000 to 6000).map(v => ("b", v.toLong)).toDF("g", "v")
    val perSlice = Sketches.kmvGroupedSketch(a.union(b), col("g"), col("v"), k)
    val merged = Sketches.kmvMergeAll(perSlice, k)
      .select(col("kmv")).head().getSeq[Long](0)
    val direct = Sketches.kmvGroupedSketch(
        a.union(b).withColumn("g", lit("all")), col("g"), col("v"), k)
      .select(col("kmv")).head().getSeq[Long](0)
    assert(merged == direct)
  }

  test("theta intersection: exact when both sides fit, banded estimate beyond") {
    // small sets: theta = 2^60 → the estimate IS the exact intersection
    val sa = (1 to 100).map(v => ("a", v.toLong)).toDF("g", "v")
    val sb = (51 to 150).map(v => ("b", v.toLong)).toDF("g", "v")
    def inter(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame,
        k: Int): Double = {
      val sk = Sketches.kmvGroupedSketch(x.union(y), col("g"), col("v"), k)
      val ka = sk.filter(col("g") === "a").select(col("kmv").as("ka"))
      val kb = sk.filter(col("g") === "b").select(col("kmv").as("kb"))
      ka.crossJoin(kb).select(Sketches.thetaIntersect(col("ka"), col("kb"), k))
        .head().getDouble(0)
    }
    assert(inter(sa, sb, 256) == 50.0)
    // big sets with known 2000-element overlap: estimate within 3 rse-ish
    val ba = (1 to 6000).map(v => ("a", v.toLong)).toDF("g", "v")
    val bb = (4001 to 10000).map(v => ("b", v.toLong)).toDF("g", "v")
    val est = inter(ba, bb, 256)
    assert(math.abs(est - 2000.0) / 2000.0 < 0.5, s"estimate $est")
  }

  test("chiSquareIndependence: zero under independence, n under perfect association") {
    // independent 2×2 (all cells equal) → every O = E → chi2 = 0
    val indep = (Seq.fill(25)(("x", 0)) ++ Seq.fill(25)(("x", 1)) ++
      Seq.fill(25)(("y", 0)) ++ Seq.fill(25)(("y", 1))).toDF("a", "b")
    val r0 = Stats.chiSquareIndependence(indep, col("a"), col("b"))
      .as[(Long, Long, Double)].collect().head
    assert(r0 == ((100L, 1L, 0.0)), s"got $r0")
    // perfect diagonal association in a balanced 2×2 → chi2 = n
    val dep = (Seq.fill(30)(("x", 0)) ++ Seq.fill(30)(("y", 1))).toDF("a", "b")
    val r1 = Stats.chiSquareIndependence(dep, col("a"), col("b"))
      .as[(Long, Long, Double)].collect().head
    assert(r1 == ((60L, 1L, 60.0)), s"got $r1")
  }

  test("countMinJoinSize upper-bounds the exact join size; exact sans collisions") {
    // 20 distinct keys in a 1024-bucket table: collisions practically
    // impossible, the inner product IS the exact bag-join size
    val a = (1 to 20).flatMap(k => Seq.fill(k % 3 + 1)(k.toLong)).toDF("k")
    val b = (11 to 30).map(_.toLong).toDF("k")
    val exact = a.join(b, "k").count()
    def est(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      Sketches.countMinJoinSize(
        Sketches.countMinTable(x, col("k"), d = 4, w = 1024),
        Sketches.countMinTable(y, col("k"), d = 4, w = 1024))
        .head().getLong(0)
    assert(est(a, b) == exact, "no-collision estimate must be exact")
    // tiny table forces collisions: the estimate stays an UPPER bound
    def estW(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame, w: Int) =
      Sketches.countMinJoinSize(
        Sketches.countMinTable(x, col("k"), d = 4, w = w),
        Sketches.countMinTable(y, col("k"), d = 4, w = w))
        .head().getLong(0)
    assert(estW(a, b, 4) >= exact, "inner-product estimate must upper-bound")
    // mergeability carries over: per-slice tables merged == direct
    val a1 = a.filter(col("k") <= 10)
    val a2 = a.filter(col("k") > 10)
    val merged = Sketches.countMinMerge(
      Sketches.countMinTable(a1, col("k"), d = 4, w = 1024),
      Sketches.countMinTable(a2, col("k"), d = 4, w = 1024))
    val direct = Sketches.countMinTable(a, col("k"), d = 4, w = 1024)
    assert(Sketches.countMinJoinSize(merged,
      Sketches.countMinTable(b, col("k"), d = 4, w = 1024)).head().getLong(0)
      == Sketches.countMinJoinSize(direct,
      Sketches.countMinTable(b, col("k"), d = 4, w = 1024)).head().getLong(0))
  }

  test("covarianceMatrix: hand-computed 2-dim case; diagonal equals dimStats variance") {
    // rows (1,0), (0,1), (1,1): var(d1)=var(d2)=2/9, cov(d1,d2)=1/3-4/9=-1/9
    val d = Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Seq(1.0f, 1.0f)).toDF("embedding")
    val cov = Embeddings.covarianceMatrix(d, "embedding")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(cov == Map((1L, 1L) -> 0.222222, (1L, 2L) -> -0.111111, (2L, 2L) -> 0.222222))
    val vars = Embeddings.dimStats(d, "embedding")
      .select(col("dim"), col("var6")).as[(Long, Double)].collect().toMap
    assert(vars(1L) == cov((1L, 1L)) && vars(2L) == cov((2L, 2L)),
      "covariance diagonal must agree with dimStats variance")
  }

  test("power iteration recovers a planted spike direction as a unit vector") {
    // corpus = s·u + small deterministic noise, u = (3,4)/5: the top PC
    // must align with u, the returned direction must be unit-norm, and
    // the eigenvalue estimate must dominate every single-dim variance
    // (λmax ≥ Cᵢᵢ for symmetric PSD matrices)
    val rows = (0 until 400).map { i =>
      val s = (i % 21 - 10) / 10.0f // spike coefficient in [-1, 1]
      val n1 = ((i * 7) % 11 - 5) / 100.0f
      val n2 = ((i * 13) % 11 - 5) / 100.0f
      Seq(0.6f * s + n1, 0.8f * s + n2)
    }.toDF("embedding")
    val pc = Embeddings.topPcPowerIteration(rows, "embedding", dims = 2)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val v = pc.map(_._2)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"direction not unit: $norm")
    val cos = math.abs(v(0) * 0.6 + v(1) * 0.8)
    assert(cos > 0.999, s"did not recover the planted spike: cos=$cos")
    val lambda = pc.head._3
    val vars = Embeddings.dimStats(rows, "embedding")
      .select(col("var6")).as[Double].collect()
    assert(vars.forall(lambda >= _ - 1e-6),
      s"eigenvalue estimate $lambda below a diagonal entry ${vars.toSeq}")
  }

  test("misra-gries: bounded summary keeps every value above n/(k+1), any order") {
    // 2000 rows: 'hot' 300×, 'warm' 150×, 180 cold values ~8-9× each.
    // k=12 → guarantee floor n/13 ≈ 154: hot MUST survive; stored
    // weights never exceed truth and the summary never exceeds k.
    val base = Seq.fill(300)("hot") ++ Seq.fill(150)("warm") ++
      (1 to 1550).map(i => s"cold${i % 180}")
    val orders = Seq(
      base.sorted,                    // adversarial: heavy values clustered
      base.sorted.reverse,
      base.indices.sortBy(i => (i * 2654435761L) % base.size).map(base)) // scattered
    for (data <- orders) {
      val mg = data.toDF("v")
        .agg(graft.functions.FreqSketch.misraGries(12)(col("v")).as("mg"))
        .select(explode(col("mg")).as("e"))
        .select(col("e._1").as("v"), col("e._2").as("w"))
        .as[(String, Long)].collect().toMap
      assert(mg.size <= 12, s"summary overflowed k: ${mg.size}")
      assert(mg.contains("hot"), s"lost a guaranteed heavy hitter in $mg")
      assert(mg("hot") <= 300L && mg("hot") >= 300L - base.size / 13,
        s"hot weight ${mg("hot")} outside the deficit bound")
      val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
      mg.foreach { case (v, w) =>
        assert(w <= truth(v), s"$v stored $w above true ${truth(v)}") }
    }
  }

  test("heavyHittersExact == direct GROUP BY + HAVING, counts exact") {
    val data = (Seq.fill(200)("a") ++ Seq.fill(90)("b") ++
      (1 to 710).map(i => s"c${i % 300}")).toDF("v")
    val got = Sketches.heavyHittersExact(data, col("v"), phiBp = 500, k = 64)
      .orderBy(col("cnt").desc, col("v"))
      .as[(String, Long)].collect().toSeq
    // n=1000, φ=5%: a (200) and b (90) qualify; every c value ≤ 3 rows
    assert(got == Seq(("a", 200L), ("b", 90L)))
    // guard: a k too small for the guarantee is refused loudly
    val ex = intercept[IllegalArgumentException] {
      Sketches.heavyHittersExact(data, col("v"), phiBp = 10, k = 64)
    }
    assert(ex.getMessage.contains("superset guarantee"))
  }

  test("heavyHittersExact excludes nulls instead of crashing on a nullable column") {
    // nulls in the value column: previously an NPE inside MG's prune
    // sort; now nulls are outside the frequency domain (both in the
    // sketch and in n), so thresholds apply to non-null rows only
    val data = (Seq.fill(60)(Some("a")) ++ Seq.fill(30)(Option.empty[String]) ++
      (1 to 40).map(i => Some(s"t$i"))).toDF("v")
    val got = Sketches.heavyHittersExact(data, col("v"), phiBp = 2000, k = 16)
      .as[(String, Long)].collect().toSeq
    // non-null n = 100, φ = 20% → only "a" (60) qualifies; with nulls
    // counted in n (130) it would still qualify, but the point is the
    // query completes and never emits a null row
    assert(got == Seq(("a", 60L)))
  }

  test("cusumDrift matches the recursive S_i = max(0, S_{i-1} + dev) definition") {
    val rnd = new scala.util.Random(7)
    // three interleaved series; g1 gets a planted +150 level shift on
    // its last ~20 points so the alarm path is exercised. The shift is
    // late and large ON PURPOSE: k derives from the whole-series mean,
    // so a long contamination window raises k by half the shift and
    // cancels the very drift it should detect — the classic reason
    // production CUSUM trains k on a reference period
    val series = (1 to 600).map { i =>
      val g = s"g${i % 3}"
      val v = math.floor(rnd.nextDouble() * 10000) / 100.0
      (g, i.toLong, if (g == "g1" && i > 540) v + 150.0 else v)
    }
    val got = graft.ops.Stats.cusumDrift(series.toDF("g", "i", "v"),
        "g", "v", Seq("i"), allowance = 15.0, h = 250.0)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // driver-side reference: the textbook recursion, same fixed point
    val scale = 1000000L
    val byG = series.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => math.floor(t._3 * scale + 0.5).toLong))
      .toMap
    byG.foreach { case (g, qs) =>
      val k = math.floor(qs.sum.toDouble / qs.size + 0.5).toLong +
        math.floor(15.0 * scale + 0.5).toLong
      val hQ = math.floor(250.0 * scale + 0.5).toLong
      var s = 0L; var alarms = 0L; var maxS = 0L
      qs.foreach { q =>
        s = math.max(0L, s + (q - k))
        if (s > hQ) alarms += 1
        maxS = math.max(maxS, s)
      }
      assert(got(g) == ((qs.size.toLong, alarms, maxS.toDouble / scale)),
        s"group $g drifted from the recursive definition: ${got(g)}")
    }
    assert(got("g1")._2 > 0, "the planted level shift must alarm")
    assert(got("g0")._2 == 0 && got("g2")._2 == 0,
      "undrifted series must stay under the threshold")
  }
}
