package graft.cdc

import org.apache.spark.sql.types._

/** Config-driven table/column mapping registry.
  *
  * The reference hard-codes these transforms per table in PL/SQL workers
  * (`poc/asis-oracle/init/04_create_procedures.sql:108-121`,
  * `poc/tobe-oracle/init/04_create_procedures.sql:159-172`) and declares the
  * table registry in YAML (`application.yml:87-192`); its design docs
  * specify the generalization (`docs/02-설계/01_동기화_설계.md:167-224`:
  * DIRECT / CODE_MAP / EXPRESSION / DEFAULT / drop). This is that
  * generalization as typed Scala config, from which the engine derives
  * per-table `StructType`s and generated transform plans.
  */
object Direction extends Enumeration {
  val AsisToTobe, TobeToAsis = Value
  /** SOURCE_SYSTEM value in the code-map dimension for this direction. */
  def sourceSystem(d: Value): String = d match {
    case AsisToTobe => "ASIS"
    case TobeToAsis => "TOBE"
  }
}

/** Wire-level kind of a source column inside a Debezium image. */
sealed trait WireType
object WireType {
  /** Oracle NUMBER: arrives as plain string (decimal.handling.mode=string,
    * register-connectors.sh:103) or as VariableScaleDecimal
    * {scale, value: base64} (CdcSyncService.java:267-297). */
  case object Num extends WireType
  /** DATE/TIMESTAMP: raw epoch integer in micro/milli/day encoding
    * (CdcSyncService.java:236-265). */
  case object Temporal extends WireType
  case object Str extends WireType
}

/** How one target column is produced from the (normalized) source image.
  * Mirrors the reference transform taxonomy; a column not listed in any
  * spec is dropped (T6).
  */
sealed trait ColumnSpec
object ColumnSpec {
  /** T1/T7: rename / PK passthrough. */
  final case class Direct(src: String) extends ColumnSpec
  /** T2: code-value lookup against SYNC_CODE_MAPPING, miss ⇒ source value
    * (FN_CONVERT_CODE, asis…03_create_mapping_tables.sql:40-59). */
  final case class CodeMapped(src: String, mapGroup: String) extends ColumnSpec
  /** T3: CASE src WHEN 'Y' THEN 1 ELSE 0 END. */
  final case class YnToBit(src: String) extends ColumnSpec
  /** T3 reverse: CASE src WHEN 1 THEN 'Y' ELSE 'N' END. */
  final case class BitToYn(src: String) extends ColumnSpec
  /** T4: NVL(CAST(src AS TIMESTAMP), now) / plain cast when !defaultNow. */
  final case class CastTimestamp(src: String, defaultNow: Boolean) extends ColumnSpec
  /** Reverse of T4 onto the ASIS DATE columns. */
  final case class CastDate(src: String) extends ColumnSpec
  /** T5: target-only literal default (CREATED_BY='SYNC'). */
  final case class DefaultLit(value: String) extends ColumnSpec
  /** T5: target-only SYSDATE/SYSTIMESTAMP default. */
  case object DefaultNow extends ColumnSpec
}

/** One physical table on one side of the sync. */
final case class TableSide(
    table: String,
    pk: String,
    /** column name → wire type, in DDL order */
    columns: Seq[(String, WireType)]) {
  def columnNames: Seq[String] = columns.map(_._1)
}

/** One synced entity: both sides + both transform plans. */
final case class TableMapping(
    entity: String,
    direction: String, // BIDIRECTIONAL | ASIS_TO_TOBE | TOBE_TO_ASIS
    asis: TableSide,
    tobe: TableSide,
    /** target column (TOBE side) → spec over ASIS image */
    asisToTobe: Seq[(String, ColumnSpec)],
    /** target column (ASIS side) → spec over TOBE image */
    tobeToAsis: Seq[(String, ColumnSpec)]) {

  def sideFor(d: Direction.Value): TableSide =
    if (d == Direction.AsisToTobe) asis else tobe
  def targetFor(d: Direction.Value): TableSide =
    if (d == Direction.AsisToTobe) tobe else asis
  def specsFor(d: Direction.Value): Seq[(String, ColumnSpec)] =
    if (d == Direction.AsisToTobe) asisToTobe else tobeToAsis
}

object Registry {
  import ColumnSpec._
  import WireType._

  // FIXTURES.md §2 / application.yml:87-192 / 01_create_tables.sql DDL.
  val book: TableMapping = TableMapping(
    entity = "BOOK",
    direction = "BIDIRECTIONAL",
    asis = TableSide("BOOK_INFO", "BOOK_ID", Seq(
      "BOOK_ID" -> Num, "BOOK_TITLE" -> Str, "AUTHOR" -> Str,
      "CATEGORY" -> Str, "STATUS" -> Str,
      "REG_DATE" -> Temporal, "MOD_DATE" -> Temporal)),
    tobe = TableSide("TB_BOOK", "BOOK_ID", Seq(
      "BOOK_ID" -> Num, "TITLE" -> Str, "AUTHOR_NAME" -> Str,
      "CATEGORY_CD" -> Str, "IS_ACTIVE" -> Num,
      "CREATED_AT" -> Temporal, "UPDATED_AT" -> Temporal,
      "CREATED_BY" -> Str, "UPDATED_BY" -> Str)),
    asisToTobe = Seq(
      "BOOK_ID" -> Direct("BOOK_ID"),
      "TITLE" -> Direct("BOOK_TITLE"),
      "AUTHOR_NAME" -> Direct("AUTHOR"),
      "CATEGORY_CD" -> CodeMapped("CATEGORY", "CATEGORY_MAP"),
      "IS_ACTIVE" -> YnToBit("STATUS"),
      "CREATED_AT" -> CastTimestamp("REG_DATE", defaultNow = true),
      "UPDATED_AT" -> CastTimestamp("MOD_DATE", defaultNow = false),
      "CREATED_BY" -> DefaultLit("SYNC"),
      "UPDATED_BY" -> DefaultLit("SYNC")),
    tobeToAsis = Seq(
      "BOOK_ID" -> Direct("BOOK_ID"),
      "BOOK_TITLE" -> Direct("TITLE"),
      "AUTHOR" -> Direct("AUTHOR_NAME"),
      "CATEGORY" -> CodeMapped("CATEGORY_CD", "CATEGORY_MAP"),
      "STATUS" -> BitToYn("IS_ACTIVE"),
      "REG_DATE" -> CastDate("CREATED_AT"),
      "MOD_DATE" -> CastDate("UPDATED_AT")))

  val member: TableMapping = TableMapping(
    entity = "MEMBER",
    direction = "BIDIRECTIONAL",
    asis = TableSide("MEMBER_INFO", "MEMBER_ID", Seq(
      "MEMBER_ID" -> Num, "MEMBER_NAME" -> Str, "EMAIL" -> Str,
      "MEMBER_TYPE" -> Str, "STATUS" -> Str, "REG_DATE" -> Temporal)),
    tobe = TableSide("TB_MEMBER", "MEMBER_ID", Seq(
      "MEMBER_ID" -> Num, "MEMBER_NAME" -> Str, "EMAIL_ADDR" -> Str,
      "MEMBER_TYPE_CD" -> Str, "IS_ACTIVE" -> Num,
      "CREATED_AT" -> Temporal, "UPDATED_AT" -> Temporal)),
    asisToTobe = Seq(
      "MEMBER_ID" -> Direct("MEMBER_ID"),
      "MEMBER_NAME" -> Direct("MEMBER_NAME"),
      "EMAIL_ADDR" -> Direct("EMAIL"),
      "MEMBER_TYPE_CD" -> CodeMapped("MEMBER_TYPE", "MEMBER_TYPE_MAP"),
      "IS_ACTIVE" -> YnToBit("STATUS"),
      "CREATED_AT" -> CastTimestamp("REG_DATE", defaultNow = true),
      "UPDATED_AT" -> DefaultNow),
    tobeToAsis = Seq(
      "MEMBER_ID" -> Direct("MEMBER_ID"),
      "MEMBER_NAME" -> Direct("MEMBER_NAME"),
      "EMAIL" -> Direct("EMAIL_ADDR"),
      "MEMBER_TYPE" -> CodeMapped("MEMBER_TYPE_CD", "MEMBER_TYPE_MAP"),
      "STATUS" -> BitToYn("IS_ACTIVE"),
      "REG_DATE" -> CastDate("CREATED_AT")))

  val legacyCode: TableMapping = TableMapping(
    entity = "LEGACY_CODE",
    direction = "ASIS_TO_TOBE",
    asis = TableSide("LEGACY_CODE", "CODE_ID", Seq(
      "CODE_ID" -> Str, "CODE_NAME" -> Str, "USE_YN" -> Str,
      "REG_DATE" -> Temporal)),
    tobe = TableSide("TB_LEGACY_CODE", "CODE_ID", Seq(
      "CODE_ID" -> Str, "CODE_NAME" -> Str, "IS_ACTIVE" -> Num,
      "CREATED_AT" -> Temporal, "CREATED_BY" -> Str)),
    asisToTobe = Seq(
      "CODE_ID" -> Direct("CODE_ID"),
      "CODE_NAME" -> Direct("CODE_NAME"),
      "IS_ACTIVE" -> YnToBit("USE_YN"),
      "CREATED_AT" -> CastTimestamp("REG_DATE", defaultNow = true),
      "CREATED_BY" -> DefaultLit("SYNC")),
    tobeToAsis = Seq.empty)

  val newService: TableMapping = TableMapping(
    entity = "NEW_SERVICE",
    direction = "TOBE_TO_ASIS",
    asis = TableSide("NEW_SERVICE_RECV", "SERVICE_ID", Seq(
      "SERVICE_ID" -> Num, "SERVICE_NM" -> Str, "SVC_TYPE" -> Str,
      "USE_YN" -> Str, "REG_DATE" -> Temporal)),
    tobe = TableSide("TB_NEW_SERVICE", "SERVICE_ID", Seq(
      "SERVICE_ID" -> Num, "SERVICE_NAME" -> Str, "SERVICE_TYPE_CD" -> Str,
      "IS_ACTIVE" -> Num, "CREATED_AT" -> Temporal)),
    asisToTobe = Seq.empty,
    tobeToAsis = Seq(
      "SERVICE_ID" -> Direct("SERVICE_ID"),
      "SERVICE_NM" -> Direct("SERVICE_NAME"),
      "SVC_TYPE" -> Direct("SERVICE_TYPE_CD"),
      "USE_YN" -> BitToYn("IS_ACTIVE"),
      "REG_DATE" -> CastDate("CREATED_AT")))

  val all: Seq[TableMapping] = Seq(book, member, legacyCode, newService)

  /** Kafka-topic → mapping routing (application.yml:64-82). */
  def topicFor(d: Direction.Value, m: TableMapping): String = d match {
    case Direction.AsisToTobe => s"asis.ASIS_USER.${m.asis.table}"
    case Direction.TobeToAsis => s"tobe.TOBE_USER.${m.tobe.table}"
  }

  def byTopic: Map[String, (TableMapping, Direction.Value)] =
    (all.filter(_.direction != "TOBE_TO_ASIS").map(m => topicFor(Direction.AsisToTobe, m) -> (m, Direction.AsisToTobe)) ++
      all.filter(_.direction != "ASIS_TO_TOBE").map(m => topicFor(Direction.TobeToAsis, m) -> (m, Direction.TobeToAsis))).toMap

  /** Spark-side target schema for one table side (normalized types). */
  def targetSchema(side: TableSide): StructType =
    StructType(side.columns.map {
      case (n, WireType.Num) => StructField(n, DecimalType(38, 10))
      case (n, WireType.Temporal) => StructField(n, TimestampType)
      case (n, WireType.Str) => StructField(n, StringType)
    })
}
