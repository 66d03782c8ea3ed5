package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.ops.Multimodal
import graft.functions.DebeziumDecimalDecode.debezium_decimal

/** Coverage extras: multimodal plumbing, the custom decimal Expression
  * certified against independent arithmetic, JSON extraction, and
  * event-time windowed aggregations.
  */
object Extras extends QueryPack {

  // ---- MM1: media metadata over binary payloads --------------------------
  private def mm1MediaMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaMeta(Multimodal.mediaTable(Tables.load(s, dir, "documents")))
      .orderBy(col("doc_id"))

  private val mm1Sql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |       WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
      |  octet_length(encode(text)) AS size_bytes,
      |  CASE WHEN doc_id % 3 = 0 THEN 64 + octet_length(encode(text)) % 512 END AS width,
      |  CASE WHEN doc_id % 3 = 0 THEN 64 + (octet_length(encode(text)) * 7) % 512 END AS height,
      |  CASE WHEN doc_id % 3 <> 0 THEN octet_length(encode(text)) * 10 END AS duration_ms
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- MM2: frame sampling (binary-native substring + hash) --------------
  private def mm2FrameHashes(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(Multimodal.mediaTable(Tables.load(s, dir, "documents")),
        frameSize = 64, maxFrames = 4)
      .select(col("doc_id"), col("frame_idx"), col("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))

  private val mm2Sql =
    """SELECT doc_id, frame_idx, md5(substr(text, frame_idx * 64 + 1, 64)) AS frame_md5
      |FROM documents,
      |  (SELECT range AS frame_idx FROM range(0, 4))
      |WHERE frame_idx < least(CAST(ceil(length(text) / 64.0) AS INTEGER), 4)
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ---- P7: VariableScaleDecimal decode (custom Catalyst Expression) -----
  // The oracle recomputes BigInteger(ascii-bytes)/10^scale from first
  // principles — a hash match certifies DebeziumDecimalDecode incl. its
  // codegen path, since Verify runs with whole-stage codegen on.
  private def p7DebeziumDecimal(s: SparkSession, dir: String): DataFrame = {
    val v = col("o_orderkey").cast("string")
    val json = concat(lit("{\"scale\":2,\"value\":\""),
      base64(v.cast("binary")), lit("\"}"))
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), debezium_decimal(json).cast("double").as("decoded"))
      .orderBy(col("o_orderkey"))
  }

  private val p7Sql =
    """SELECT o_orderkey,
      |  CAST(list_sum([ascii(substr(v, i + 1, 1)) * (256.0 ** (length(v) - 1 - i))
      |                 for i in range(0, length(v))]) AS BIGINT) / 100.0 AS decoded
      |FROM (SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS v FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  // ---- JS1: JSON extraction from the props column ------------------------
  private def js1JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("k_sum"))
      .orderBy(col("k_mod"))

  private val js1Sql =
    """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
      |  COUNT(*) AS cnt,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum
      |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin

  // ---- W3: tumbling event-time window ------------------------------------
  private def w3TumblingHourly(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy(col("hour_start"))

  private val w3Sql =
    """SELECT date_trunc('hour', ts) AS hour_start, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY hour_start""".stripMargin

  // ---- W4: sliding event-time window (2 h, slide 1 h) --------------------
  private def w4Sliding2h(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour").getField("start").as("win_start"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("win_start"))

  private val w4Sql =
    """SELECT win_start, COUNT(*) AS n_events FROM (
      |  SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
      |                 date_trunc('hour', ts)]) AS win_start
      |  FROM events)
      |GROUP BY 1 ORDER BY win_start""".stripMargin

  override val all: Seq[Q] = Seq(
    Q("mm1_media_meta", "multimodal: typed metadata over binary payloads", mm1MediaMeta, Some(mm1Sql)),
    Q("mm2_frame_hashes", "multimodal: fixed-size frame sampling", mm2FrameHashes, Some(mm2Sql)),
    Q("p7_debezium_decimal", "P7 VariableScaleDecimal custom Expression", p7DebeziumDecimal, Some(p7Sql)),
    Q("js1_json_extract", "JSON field extraction + aggregation", js1JsonExtract, Some(js1Sql)),
    Q("w3_tumbling_hourly", "tumbling event-time window aggregation", w3TumblingHourly, Some(w3Sql)),
    Q("w4_sliding_2h", "sliding event-time window aggregation", w4Sliding2h, Some(w4Sql)),
  )
}
