package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven schema transformation (SURVEY.md §2.3, T1–T7).
  *
  * The reference implements these per table in PL/SQL stage-1 workers
  * (`tobe-oracle/init/04_create_procedures.sql:159-172` etc.); here one
  * generated `select` per TableMapping covers every kind:
  * Direct=rename, CodeMapped=broadcast join + COALESCE fallback,
  * YnToBit/BitToYn=CASE, CastTimestamp/CastDate=cast+NVL, DefaultLit /
  * DefaultNow=literals, drop=absence. Code-map lookups become one
  * broadcast hash join per (source column, map group) — the dimension is
  * ≤ 25 rows, so at scale this is shuffle-free map-side work.
  */
object Transform {

  /** Deterministic "now" injection point; tests pass a fixed literal,
    * production uses current_timestamp(). The reference's SYSDATE
    * defaults are equally nondeterministic (`tobe…04:95-96`).
    */
  def apply(
      events: DataFrame,
      mapping: TableMapping,
      direction: Direction.Value,
      codeDim: DataFrame,
      now: Column = current_timestamp()): DataFrame = {

    val specs = mapping.specsFor(direction)
    require(specs.nonEmpty, s"${mapping.entity} does not sync in $direction")
    val sys = Direction.sourceSystem(direction)

    // one broadcast lookup per distinct (src, mapGroup)
    val lookups: Seq[(String, String)] = specs.collect {
      case (_, ColumnSpec.CodeMapped(src, group)) => (src, group)
    }.distinct

    val joined = lookups.zipWithIndex.foldLeft(events) {
      case (df, ((src, group), i)) =>
        val dim = codeDim
          .filter(col("MAP_GROUP") === group && col("SOURCE_SYSTEM") === sys)
          .select(
            col("SOURCE_VALUE").as(s"__cm_key_$i"),
            col("TARGET_VALUE").as(s"__cm_val_$i"))
        df.join(broadcast(dim), df(src) === col(s"__cm_key_$i"), "left")
    }

    def resolve(spec: ColumnSpec): Column = spec match {
      case ColumnSpec.Direct(src) => col(src)
      case ColumnSpec.CodeMapped(src, group) =>
        val i = lookups.indexOf((src, group))
        // miss ⇒ pass source value through (FN_CONVERT_CODE fallback,
        // asis…03_create_mapping_tables.sql:56-57)
        coalesce(col(s"__cm_val_$i"), col(src))
      case ColumnSpec.YnToBit(src) =>
        when(col(src) === "Y", lit(1)).otherwise(lit(0)).cast("decimal(38,10)")
      case ColumnSpec.BitToYn(src) =>
        when(col(src).cast("int") === 1, "Y").otherwise("N")
      case ColumnSpec.CastTimestamp(src, defaultNow) =>
        if (defaultNow) coalesce(col(src).cast("timestamp"), now)
        else col(src).cast("timestamp")
      case ColumnSpec.CastDate(src) =>
        // Oracle DATE keeps date+time at SECOND precision — truncate
        // fractional seconds only. (Day-truncation would break loop
        // prevention: the ASIS→TOBE→ASIS round trip must preserve
        // values so the echo's post-transform hash matches.)
        date_trunc("SECOND", col(src)).cast("timestamp")
      case ColumnSpec.DefaultLit(v) => lit(v)
      case ColumnSpec.DefaultNow => now
    }

    val targetCols = specs.map { case (name, spec) => resolve(spec).as(name) }
    val meta = Seq("operation", "source_ts").filter(joined.columns.contains)
      .map(col)
    joined.select(meta ++ targetCols: _*)
  }
}
