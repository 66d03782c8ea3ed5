package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * first transform a text-curation pipeline applies, because every
  * downstream hash-keyed operator (exact dedup, MinHash shingles,
  * vocabulary, tokenizer ids) treats byte-distinct strings as
  * distinct: a decomposed "é" (e + U+0301) and the composed U+00E9
  * are the SAME text but different keys, so un-normalized corpora
  * under-deduplicate and split vocabulary mass across encodings of
  * one word.
  *
  * Spark has no normalization builtin; a Scala UDF would black-box the
  * hot path, so this is a codegen'd `UnaryExpression` over
  * `java.text.Normalizer` (the JDK's NFC is the same Unicode
  * normalization DuckDB's `nfc_normalize` implements, which is what
  * lets an oracle hash-match the normalized output). Null in → null
  * out; the common already-normalized case is detected first
  * (`Normalizer.isNormalized` — one scan, no allocation) so ASCII-only
  * corpora pay nearly nothing.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.normalize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Shared by the interpreted and generated paths. */
  def normalize(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfc_normalize(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
  }

  /** Register as a SQL-callable function on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
}
