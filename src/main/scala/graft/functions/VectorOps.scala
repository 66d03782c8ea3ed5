package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot loops.
  *
  * The Column-DSL equivalents (`aggregate(zip_with(a, b, _*_), ...)`)
  * run interpreted: every candidate pair allocates a zipped array and
  * walks it through lambda closures — the same pitfall already measured
  * and fixed for Jaccard in [[ArrayHashes]] (PLANS.md lessons #3/#5).
  * These kernels are one JVM pass with no allocation, and `doGenCode`
  * emits a static call so the surrounding projection stays inside
  * whole-stage codegen.
  *
  * Arithmetic is bit-identical to the HOF form: a strict left fold
  * (((0 + x₀y₀) + x₁y₁) + …) over doubles in index order, so every
  * existing oracle restatement keeps hash-matching.
  */
object VectorOps {

  /** Sequential-order dot product; flags select float vs double element
    * accessors at plan time. Inputs are same-length by construction
    * (embedding columns have fixed dims).
    */
  def dotSeq(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = Math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Both kernels select float vs double accessors at plan time, so any
    * other element type must be an ANALYSIS error — without this check
    * the SQL-registered forms would read garbage through the wrong
    * accessor (e.g. array<int> via getFloat).
    */
  private def checkNumericArray(name: String, e: Expression): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<float> or array<double> input, got ${other.sql}")
    }

  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = left.nullable || right.nullable
    override def prettyName: String = "dot_product"
    override def checkInputDataTypes(): TypeCheckResult =
      Seq(left, right).map(checkNumericArray(prettyName, _))
        .find(!_.isSuccess).getOrElse(TypeCheckResult.TypeCheckSuccess)
    override def nullSafeEval(a: Any, b: Any): Any =
      dotSeq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        elemIsFloat(left), elemIsFloat(right))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = "graft.functions.VectorOps$.MODULE$"
      val (af, bf) = (elemIsFloat(left), elemIsFloat(right))
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $m.dotSeq($a, $b, $af, $bf);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def dot_product(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  // ---- sign-random-projection bucket --------------------------------------

  /** Deterministic pseudo-random hyperplane weights in [-1, 1]: derived
    * from md5("p_i") prefixes so any engine (or the DuckDB oracle) can
    * regenerate identical planes. Cached per (planes, dims).
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]

  def planeWeights(planes: Int, dims: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((planes, dims), _ => {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(planes) { p =>
        Array.tabulate(dims) { i =>
          val hex = md.digest(s"${p}_$i".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(8)
          ((java.lang.Long.parseLong(hex, 16) % 2001) - 1000).toDouble / 1000.0
        }
      }
    })

  /** All `planes` projections in ONE pass over the vector (the HOF form
    * re-walked the embedding once per plane, allocating a zipped array
    * each time). Per-plane sums keep strict index order, so signs — and
    * therefore buckets — are bit-identical to the DSL form.
    */
  def srpBucket(emb: ArrayData, planes: Int, dims: Int, isFloat: Boolean): Int = {
    val ws = planeWeights(planes, dims)
    val accs = new Array[Double](planes)
    val n = Math.min(emb.numElements(), dims)
    var i = 0
    while (i < n) {
      val x = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      var p = 0
      while (p < planes) { accs(p) += x * ws(p)(i); p += 1 }
      i += 1
    }
    var bits = 0
    var p = 0
    while (p < planes) { if (accs(p) >= 0.0) bits |= (1 << p); p += 1 }
    bits
  }

  case class SrpBucket(child: Expression, planes: Int, dims: Int) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "srp_bucket"
    override def checkInputDataTypes(): TypeCheckResult =
      if (planes < 1 || planes > 31)
        // the bucket is an int bitmask: plane p sets bit (1 << p), so
        // p > 30 silently overflows — reject at analysis, not runtime
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires 1 <= planes <= 31, got $planes")
      else checkNumericArray(prettyName, child)
    override def nullSafeEval(in: Any): Any =
      srpBucket(in.asInstanceOf[ArrayData], planes, dims, elemIsFloat(child))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = "graft.functions.VectorOps$.MODULE$"
      val f = elemIsFloat(child)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $m.srpBucket($c, $planes, $dims, $f);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def srp_bucket(emb: Column, planes: Int, dims: Int): Column =
    GraftBridge.column(SrpBucket(GraftBridge.expression(emb), planes, dims))
}
