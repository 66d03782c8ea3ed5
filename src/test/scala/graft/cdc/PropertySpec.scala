package graft.cdc

import graft.SparkSpec
import graft.functions.DebeziumDecimalDecode
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen

/** Property tests from the SURVEY §5 plan: decimal round trips, epoch
  * boundaries, code-map bidirectionality, hash canonicalization.
  */
class PropertySpec extends SparkSpec {

  /** Deterministic sampling from raw ScalaCheck generators (the
    * scalatest bridge isn't on the offline classpath).
    */
  private def samples[T](g: Gen[T], n: Int = 60): Seq[T] = {
    val p = Gen.Parameters.default
    Iterator.from(0)
      .map(i => g(p, org.scalacheck.rng.Seed(42L + i)))
      .flatten.take(n).toSeq
  }

  test("property: VariableScaleDecimal round-trips unscaled/scale") {
    samples(Gen.zip(Gen.chooseNum(-1000000000000L, 1000000000000L),
      Gen.chooseNum(0, 9))).foreach { case (unscaled, scale) =>
      val b64 = java.util.Base64.getEncoder.encodeToString(
        java.math.BigInteger.valueOf(unscaled).toByteArray)
      val json = s"""{"scale":$scale,"value":"$b64"}"""
      val got = DebeziumDecimalDecode.decode(UTF8String.fromString(json))
      val expected = new java.math.BigDecimal(
        java.math.BigInteger.valueOf(unscaled), scale)
      assert(got.toBigDecimal.underlying().compareTo(expected) == 0)
    }
  }

  test("property: epoch heuristic boundaries (10^5 days, 10^14 micros)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cases = Seq(
      99999L -> "1970-01-01",          // just below 10^5 ⇒ days (overflowing date range clamps)
      100000L -> "1970-01-01",         // at 10^5 ⇒ millis
      99999999999999L -> "",           // just below 10^14 ⇒ millis
      100000000000000L -> "")          // at 10^14 ⇒ micros
    val df = cases.map(_._1).toDF("v")
      .select(col("v"), Envelope.epochAuto(col("v")).as("ts"))
    val got = df.collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    // 99999 days ≈ year 2243; 100000 ms = 1970-01-01T00:01:40
    assert(got(99999L).toInstant.toString.startsWith("2243"))
    assert(got(100000L).toInstant.toString.startsWith("1970-01-01T00:01:40"))
    // 99999999999999 ms ≈ year 5138; 1e14 µs ≈ 1973
    assert(got(99999999999999L).toInstant.toString.startsWith("5138"))
    assert(got(100000000000000L).toInstant.toString.startsWith("1973"))
  }

  test("property: code-map round-trips on every mapped value") {
    val rows = CodeMapping.defaultRows
    rows.filter(_.SOURCE_SYSTEM == "ASIS").foreach { r =>
      val back = rows.find(b => b.SOURCE_SYSTEM == "TOBE" &&
        b.MAP_GROUP == r.MAP_GROUP && b.SOURCE_VALUE == r.TARGET_VALUE)
      assert(back.exists(_.TARGET_VALUE == r.SOURCE_VALUE),
        s"${r.MAP_GROUP}:${r.SOURCE_VALUE} does not round trip")
    }
  }

  test("property: change hash is column-order independent") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    samples(Gen.zip(Gen.alphaStr, Gen.alphaStr, Gen.chooseNum(0L, 1000L)), 10)
      .foreach { case (a, b, n) =>
      val df = Seq((a, b, n)).toDF("x", "y", "z")
      val h1 = df.select(Hashing.changeHash(Seq(
        "x" -> col("x"), "y" -> col("y"), "z" -> col("z"))).as("h")).head.getString(0)
      val h2 = df.select(Hashing.changeHash(Seq(
        "z" -> col("z"), "x" -> col("x"), "y" -> col("y"))).as("h")).head.getString(0)
      assert(h1 == h2)
    }
  }

  test("property: sorted jaccard equals naive set jaccard") {
    import graft.functions.ArrayHashes
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    samples(Gen.zip(Gen.listOf(Gen.chooseNum(0L, 50L)), Gen.listOf(Gen.chooseNum(0L, 50L))))
      .foreach { case (a, b) =>
      if (a.nonEmpty || b.nonEmpty) {
        val sa = a.distinct.sorted
        val sb = b.distinct.sorted
        val got = ArrayHashes.jaccardSortedLongs(
          new GenericArrayData(sa.toArray), new GenericArrayData(sb.toArray))
        val inter = sa.toSet.intersect(sb.toSet).size
        val union = sa.toSet.union(sb.toSet).size
        val expected = if (union == 0) 0.0 else inter.toDouble / union
        assert(math.abs(got - expected) < 1e-12)
      }
    }
  }
}
