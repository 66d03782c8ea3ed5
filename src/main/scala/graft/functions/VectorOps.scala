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

  // ---- nearest-centroid argmin over a broadcast centroid array ------------

  /** `round(x, 6)` exactly as Spark's `Round` evaluates it on DOUBLE
    * (scala BigDecimal(d) == java BigDecimal.valueOf(d), HALF_UP), so
    * the kernel's scores are bit-identical to the
    * `round(dot_product(...), 6)` column the min_by formulation scored
    * with — and therefore to every oracle restatement.
    */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Top-`n` centroids of `emb` from the packed centroid array, sorted
    * by (−score, cent_id) ascending — the exact ordering the min_by /
    * row_number formulations used, including the quantize-BEFORE-compare
    * rule that makes ties engine-reproducible.
    *
    *  - `fixedPoint = false`: score = round(dot, 6) (cosine on
    *    L2-normalized inputs); output struct (ns = −s, cent_id, s).
    *  - `fixedPoint = true`: score = floor(dot·10⁶ + 0.5) as long (the
    *    PQ `d6` quantization); output struct (nd = −d6, cent_id).
    *
    * One pass, no allocation beyond the ≤ n result rows: replaces the
    * explode → corpus×C rows → partial-SortAggregate(min_by) shape with
    * a single whole-stage-codegen projection — no per-partition sort of
    * the ×C scored rows, no aggregate, no exchange (see
    * [[graft.ops.Similarity.assignToCentroidsWithSim]]).
    */
  def nearestCentroids(
      emb: ArrayData, cents: ArrayData, n: Int,
      embFloat: Boolean, centFloat: Boolean, fixedPoint: Boolean): ArrayData = {
    val c = cents.numElements()
    val m = Math.min(n, c)
    // parallel top-m buffers, insertion-sorted by (key1, id) ascending
    val ks = new Array[Double](m) // round6 path: ns = −s
    val kl = new Array[Long](m)   // fixedPoint path: nd = −d6
    val ids = new Array[Long](m)
    var filled = 0
    var i = 0
    while (i < c) {
      val row = cents.getStruct(i, 2)
      val id = row.getLong(0)
      val d = dotSeq(emb, row.getArray(1), embFloat, centFloat)
      if (fixedPoint) {
        val nd = -Math.floor(d * 1000000.0 + 0.5).toLong
        // find insertion position from the end (buffers are tiny)
        var p = filled
        while (p > 0 && (kl(p - 1) > nd || (kl(p - 1) == nd && ids(p - 1) > id))) p -= 1
        if (p < m) {
          val last = Math.min(filled, m - 1)
          var q = last
          while (q > p) { kl(q) = kl(q - 1); ids(q) = ids(q - 1); q -= 1 }
          kl(p) = nd; ids(p) = id
          if (filled < m) filled += 1
        }
      } else {
        val ns = 0.0 - round6(d)
        var p = filled
        while (p > 0 && (ks(p - 1) > ns || (ks(p - 1) == ns && ids(p - 1) > id))) p -= 1
        if (p < m) {
          val last = Math.min(filled, m - 1)
          var q = last
          while (q > p) { ks(q) = ks(q - 1); ids(q) = ids(q - 1); q -= 1 }
          ks(p) = ns; ids(p) = id
          if (filled < m) filled += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](filled)
    var j = 0
    while (j < filled) {
      out(j) =
        if (fixedPoint)
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](kl(j), ids(j)))
        else
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](ks(j), ids(j), 0.0 - ks(j)))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  case class NearestCentroids(
      left: Expression, right: Expression, n: Int, fixedPoint: Boolean)
      extends BinaryExpression {
    override def dataType: DataType =
      if (fixedPoint) ArrayType(StructType(Seq(
        StructField("nd", LongType, nullable = false),
        StructField("cent_id", LongType, nullable = false))), containsNull = false)
      else ArrayType(StructType(Seq(
        StructField("ns", DoubleType, nullable = false),
        StructField("cent_id", LongType, nullable = false),
        StructField("s", DoubleType, nullable = false))), containsNull = false)
    override def prettyName: String = "nearest_centroids"
    private def centElemFloat: Boolean = right.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 2 => fs(1).dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult = {
      if (n < 1) return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires n >= 1, got $n")
      checkNumericArray(prettyName, left) match {
        case TypeCheckResult.TypeCheckSuccess => right.dataType match {
          case ArrayType(StructType(fs), _)
              if fs.length == 2 && fs(0).dataType == LongType &&
                (fs(1).dataType match {
                  case ArrayType(FloatType | DoubleType, _) => true
                  case _ => false
                }) =>
            TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires array<struct<bigint, array<float|double>>> centroids, got ${other.sql}")
        }
        case f => f
      }
    }
    override def nullSafeEval(a: Any, b: Any): Any =
      nearestCentroids(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], n,
        elemIsFloat(left), centElemFloat, fixedPoint)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = "graft.functions.VectorOps$.MODULE$"
      val (ef, cf) = (elemIsFloat(left), centElemFloat)
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = $m.nearestCentroids($a, $b, $n, $ef, $cf, $fixedPoint);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Top-n nearest centroids by rounded cosine — element type
    * struct(ns, cent_id, s), sorted (ns, cent_id) ascending.
    */
  def nearest_centroids(emb: Column, cents: Column, n: Int): Column =
    GraftBridge.column(NearestCentroids(
      GraftBridge.expression(emb), GraftBridge.expression(cents), n, fixedPoint = false))

  /** Top-n nearest centroids by the PQ fixed-point dot (d6) — element
    * type struct(nd, cent_id), sorted (nd, cent_id) ascending.
    */
  def nearest_centroids_q(emb: Column, cents: Column, n: Int): Column =
    GraftBridge.column(NearestCentroids(
      GraftBridge.expression(emb), GraftBridge.expression(cents), n, fixedPoint = true))
}
