package graft.functions

import graft.SparkSpec

class FunctionsSpec extends SparkSpec {

  test("native expressions are SQL-callable after registration") {
    GraftFunctions.registerAll(spark)
    val r1 = spark.sql(
      """SELECT debezium_decimal('{"scale":2,"value":"MDk="}') AS d""").head()
    assert(r1.getDecimal(0).doubleValue() == 123.45) // 0x3039=12345, scale 2

    val r2 = spark.sql(
      "SELECT jaccard_sorted(array(1L,2L,3L), array(2L,3L,4L)) AS j").head()
    assert(math.abs(r2.getDouble(0) - 0.5) < 1e-9)

    val r3 = spark.sql(
      "SELECT shingle_hash_set(array('a','b','c'), 2) AS s").head()
    assert(r3.getSeq[Long](0).length == 2) // 'a b', 'b c'

    val r4 = spark.sql(
      "SELECT minhash_band_keys(array('x','y'), 8, 2) AS b").head()
    assert(r4.getSeq[Long](0).length == 2)
    assert(r4.getSeq[Long](0).forall(_ >= 0)) // 60-bit keys stay positive

    val r5 = spark.sql("SELECT simhash32(array('hello')) AS s").head()
    assert(r5.getLong(0) >= 0)

    val r6 = spark.sql(
      "SELECT prefix_any_equal(array(1L,2L,3L), array(9L,2L,8L), 3) AS p," +
        " prefix_any_equal(array(1L,2L,3L), array(9L,2L,8L), 1) AS q").head()
    assert(r6.getBoolean(0) && !r6.getBoolean(1))
  }

  test("extensions class injects the same builders") {
    // smoke: the injector registers without throwing
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }

  test("simhash32 of a doc equals the bitwise-majority definition") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val words = Seq("alpha", "beta", "gamma")
    val got = ArrayHashes.simHash32FromWords(
      new GenericArrayData(words.map(UTF8String.fromString).toArray))
    val d = java.security.MessageDigest.getInstance("MD5")
    val hs = words.map(w => ArrayHashes.md5Head32(d, UTF8String.fromString(w)))
    val expected = (0 until 32).map { j =>
      val s = hs.map(h => if (((h >> j) & 1L) == 1L) 1 else -1).sum
      if (s > 0) 1L << j else 0L
    }.sum
    assert(got == expected)
  }

  test("first_common_equals matches the array_intersect formulation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // distinct long arrays, as the prefix join produces
    val rows = Seq(
      (Seq(5L, 3L, 9L), Seq(7L, 3L, 5L), 5L),  // first common in pa order = 5
      (Seq(5L, 3L, 9L), Seq(7L, 3L, 5L), 3L),  // 3 is common but not first
      (Seq(1L, 2L), Seq(2L, 4L), 2L),
      (Seq(1L, 2L), Seq(2L, 4L), 1L),
      (Seq(8L), Seq(8L), 8L))
      .toDF("pa", "pb", "tok")
    val got = rows.select(
      ArrayHashes.first_common_equals(col("pa"), col("pb"), col("tok")),
      element_at(array_intersect(col("pa"), col("pb")), 1) === col("tok"))
      .collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r.toString))
    assert(got.map(_.getBoolean(0)).toSeq == Seq(true, false, true, false, true))
  }

  test("hash60 equivalence: md5Head60 matches the hex-prefix definition") {
    import org.apache.spark.unsafe.types.UTF8String
    val d = java.security.MessageDigest.getInstance("MD5")
    val s = "spark engine"
    val viaBytes = ArrayHashes.md5Head60(d, UTF8String.fromString(s))
    val hex = d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    assert(viaBytes == java.lang.Long.parseLong(hex, 16))
  }

  test("dot_product is bit-identical to the interpreted zip_with/aggregate fold") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // deterministic pseudo-random float vectors, incl. negatives and
    // magnitudes that make double-summation order observable
    val vecs = (0 until 50).map { i =>
      (i.toLong,
        Array.tabulate(64)(j => (((i * 131 + j * 17) % 997) - 498) / 37.0f),
        Array.tabulate(64)(j => (((i * 37 + j * 113) % 997) - 498) / 53.0f))
    }.toDF("id", "a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = vecs.select(
      VectorOps.dot_product(col("a"), col("b")).as("native"), hof.as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact, not approx
  }

  test("srp_bucket is bit-identical to the per-plane zip_with/aggregate form") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val planes = 8
    val dims = 32
    val ws = VectorOps.planeWeights(planes, dims)
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(dims)(j => (((i * 53 + j * 29) % 601) - 300) / 19.0f))
    }.toDF("id", "e")
    val dslBits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(col("e"), typedlit(ws(p).toSeq), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1), p)).otherwise(0)
    }.reduce(_ + _)
    val rows = vecs.select(
      VectorOps.srp_bucket(col("e"), planes, dims).as("native"),
      dslBits.as("dsl")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("vector kernels accept array<double> and reject non-numeric arrays at analysis") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // double input goes through the double accessor — same buckets and
    // dot products as the float path on the same values
    val df = Seq((Array(1.0f, -2.0f, 3.0f), Array(1.0, -2.0, 3.0)))
      .toDF("ef", "ed")
    val r = df.select(
      VectorOps.dot_product(col("ef"), col("ef")).as("ff"),
      VectorOps.dot_product(col("ed"), col("ed")).as("dd"),
      VectorOps.srp_bucket(col("ef"), 4, 3).as("bf"),
      VectorOps.srp_bucket(col("ed"), 4, 3).as("bd")).head()
    assert(r.getDouble(0) == r.getDouble(1))
    assert(r.getInt(2) == r.getInt(3))

    val bad = Seq(Tuple1(Array(1, 2, 3))).toDF("e")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(VectorOps.srp_bucket(col("e"), 4, 3)).head()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(VectorOps.dot_product(col("e"), col("e"))).head()
    }
  }

  test("srp_bucket rejects planes outside [1, 31] at analysis") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(Tuple1(Array(1.0f, 2.0f))).toDF("e")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorOps.srp_bucket(col("e"), 32, 2)).head()
    }
    // 31 planes is the top of the int bitmask range and must plan fine
    assert(df.select(VectorOps.srp_bucket(col("e"), 31, 2)).head().getInt(0) >= 0)
  }

  test("nfc_normalize: composes decomposed sequences, idempotent, null-safe, codegen == interpreted") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.NfcNormalize.nfc_normalize
    val df = Seq(
      ("e\u0301 plain ascii", 1L), // decomposed e + COMBINING ACUTE
      ("\u00E9 already composed", 2L),
      (null.asInstanceOf[String], 3L)).toDF("t", "id")
    val out = df.select(col("id"), nfc_normalize(col("t")).as("n"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).get.startsWith("\u00E9"), "must compose to U+00E9")
    assert(out(1L).get.length == "e\u0301 plain ascii".length - 1)
    assert(out(2L).get == "\u00E9 already composed", "already-NFC input unchanged")
    assert(out(3L).isEmpty, "null in, null out")
    // idempotence + interpreted path agrees with codegen
    val twice = df.filter(col("id") === 1L)
      .select(nfc_normalize(nfc_normalize(col("t")))).head().getString(0)
    assert(twice == out(1L).get)
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val interp = graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString("e\u0301x"), org.apache.spark.sql.types.StringType))
      .eval(InternalRow.empty)
    assert(interp.toString == "\u00E9x")
  }
}
