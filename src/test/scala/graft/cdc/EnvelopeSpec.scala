package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private val side = Registry.book.asis

  // base64("AQ==") = BigInteger 1; {"scale":0,"value":"AQ=="} → 1
  private val fixtures = Seq(
    // u with schema-less envelope, decimal struct, epoch millis + micros
    """{"payload":{"op":"u",
      |"before":{"BOOK_ID":{"scale":0,"value":"AQ=="},"BOOK_TITLE":"old","AUTHOR":"a","CATEGORY":"01","STATUS":"Y","REG_DATE":1768279886846,"MOD_DATE":null},
      |"after":{"BOOK_ID":{"scale":0,"value":"AQ=="},"BOOK_TITLE":"new","AUTHOR":"a","CATEGORY":"01","STATUS":"Y","REG_DATE":1768279886846,"MOD_DATE":1768284010000123},
      |"source":{"schema":"ASIS_USER","table":"BOOK_INFO"},"ts_ms":1768284013301}}""".stripMargin.replaceAll("\n", ""),
    // c with plain-string decimal (decimal.handling.mode=string), epoch days
    """{"op":"c","before":null,
      |"after":{"BOOK_ID":"2","BOOK_TITLE":"t2","AUTHOR":"b","CATEGORY":"99","STATUS":"N","REG_DATE":19723,"MOD_DATE":null},
      |"source":{"schema":"ASIS_USER","table":"BOOK_INFO"},"ts_ms":1768284013301}""".stripMargin.replaceAll("\n", ""),
    // d: before-image only
    """{"payload":{"op":"d",
      |"before":{"BOOK_ID":"3","BOOK_TITLE":"t3","AUTHOR":"c","CATEGORY":"02","STATUS":"Y","REG_DATE":1768279886846,"MOD_DATE":null},
      |"after":null,"source":{"schema":"ASIS_USER","table":"BOOK_INFO"},"ts_ms":1768284013302}}""".stripMargin.replaceAll("\n", ""),
    // r: snapshot read → INSERT
    """{"payload":{"op":"r",
      |"after":{"BOOK_ID":"4","BOOK_TITLE":"t4","AUTHOR":"d","CATEGORY":"03","STATUS":"Y","REG_DATE":1768279886846,"MOD_DATE":null},
      |"before":null,"source":{"schema":"ASIS_USER","table":"BOOK_INFO"},"ts_ms":1768284013303}}""".stripMargin.replaceAll("\n", ""),
    // corrupt JSON → dropped
    """not json at all""")

  private lazy val parsed =
    Envelope.parse(fixtures.toDF("value"), side).cache()

  test("op decode + image coalesce + corrupt drop") {
    val rows = parsed.orderBy("BOOK_ID").collect()
    assert(rows.length == 4) // corrupt record dropped
    assert(rows.map(_.getAs[String]("operation")).toSeq ==
      Seq("UPDATE", "INSERT", "DELETE", "INSERT"))
    // DELETE read the before image
    assert(rows(2).getAs[String]("BOOK_TITLE") == "t3")
  }

  test("decimal decode: struct and plain-string variants agree in type") {
    val ids = parsed.orderBy("BOOK_ID")
      .select(col("BOOK_ID").cast("long")).as[Long].collect()
    assert(ids.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("epoch variants: micros / millis / days by magnitude") {
    val r1 = parsed.filter(col("BOOK_ID") === 1).head()
    // millis: 1768279886846 → 2026-01-13T…
    assert(r1.getAs[java.sql.Timestamp]("REG_DATE").toInstant.toString
      .startsWith("2026-01-13"))
    // micros: 1768284010000123
    assert(r1.getAs[java.sql.Timestamp]("MOD_DATE").toInstant.toString
      .startsWith("2026-01-13"))
    val r2 = parsed.filter(col("BOOK_ID") === 2).head()
    // epoch days 19723 = 2024-01-01
    assert(r2.getAs[java.sql.Timestamp]("REG_DATE").toInstant.toString
      .startsWith("2024-01-01"))
  }

  test("schema-ful and schema-less envelopes both parse") {
    // fixture 2 has no payload wrapper, still parsed (BOOK_ID=2 present)
    assert(parsed.filter(col("BOOK_ID") === 2).count() == 1)
  }

  test("schemaless path: unregistered topic parses to an uppercased map image") {
    // a table shape no registry entry knows about; lowercase wire keys
    val raw = Seq(
      // wrapped, update
      """{"payload":{"op":"u","ts_ms":1768284013301,
        |"source":{"schema":"ASIS_USER","table":"MYSTERY_TBL"},
        |"before":null,
        |"after":{"mystery_id":"7","note":"hello","last_mod_date":1768279886846,"synced_at":19723}}}"""
        .stripMargin.replaceAll("\n", ""),
      // bare, delete → before image
      """{"op":"d","ts_ms":1768284013302,
        |"source":{"schema":"ASIS_USER","table":"MYSTERY_TBL"},
        |"before":{"mystery_id":"8","note":"bye","last_mod_date":1768279886846,"synced_at":19723},
        |"after":null}""".stripMargin.replaceAll("\n", ""),
      "corrupt {{{").toDF("value")
    val out = Envelope.parseSchemaless(raw).orderBy("operation").collect()
    assert(out.length == 2) // corrupt dropped
    val del = out(0); val upd = out(1)
    assert(del.getAs[String]("operation") == "DELETE")
    assert(upd.getAs[String]("operation") == "UPDATE")
    assert(del.getAs[String]("source_table") == "MYSTERY_TBL")
    val img = upd.getAs[Map[String, String]]("image")
    assert(img.keySet == Set("MYSTERY_ID", "NOTE", "LAST_MOD_DATE", "SYNCED_AT"))
    assert(img("MYSTERY_ID") == "7")
    // DELETE coalesced to the before image
    assert(del.getAs[Map[String, String]]("image")("NOTE") == "bye")
    // temporal heuristic: *_DATE and *_AT decode, NOTE/MYSTERY_ID don't
    val ts = upd.getAs[Map[String, java.sql.Timestamp]]("image_ts")
    assert(ts.keySet == Set("LAST_MOD_DATE", "SYNCED_AT"))
    assert(ts("LAST_MOD_DATE").toInstant.toString.startsWith("2026-01-13")) // millis
    assert(ts("SYNCED_AT").toInstant.toString.startsWith("2024-01-01")) // epoch days
  }

  test("debezium_decimal handles negative scale-2 and null") {
    import graft.functions.DebeziumDecimalDecode
    val d = DebeziumDecimalDecode.decode(
      org.apache.spark.unsafe.types.UTF8String.fromString("""{"scale":2,"value":"MDk="}"""))
    // 0x3039 = 12345, scale 2 → 123.45
    assert(d.toBigDecimal == BigDecimal("123.45"))
    assert(DebeziumDecimalDecode.decode(null) == null)
    assert(DebeziumDecimalDecode.decode(
      org.apache.spark.unsafe.types.UTF8String.fromString("garbage")) == null)
  }
}
