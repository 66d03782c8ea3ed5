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

  test("hash60 equivalence: md5Head60 matches the hex-prefix definition") {
    import org.apache.spark.unsafe.types.UTF8String
    val d = java.security.MessageDigest.getInstance("MD5")
    val s = "spark engine"
    val viaBytes = ArrayHashes.md5Head60(d, UTF8String.fromString(s))
    val hex = d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    assert(viaBytes == java.lang.Long.parseLong(hex, 16))
  }
}
