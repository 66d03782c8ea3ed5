package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot inner loops of the dedup
  * operators. These exist because their Column-DSL equivalents
  * (higher-order lambdas, array_intersect/array_union per pair) run
  * interpreted with per-call allocations — measured ~50µs per candidate
  * pair, which dominates near-dup verification at scale. Each expression
  * is a single JVM pass with codegen (static-call `doGenCode`), so the
  * surrounding projection stays inside whole-stage codegen.
  *
  * All hash math mirrors the engine-portable md5-prefix scheme
  * (`Dedup.hash32`/`hash60`) so the DuckDB oracle can restate results
  * independently.
  */
object ArrayHashes {

  /** Thread-local reused digest: `MessageDigest.getInstance` does a
    * provider lookup + allocation per call, and several kernels here
    * (md5HeadHex above all — hash32/hash60's per-TOKEN hot paths) used
    * to pay it once per ROW evaluation. One instance per executor
    * thread, reset on fetch; every use below is sequential within one
    * expression evaluation, so sharing per thread is safe.
    */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private def md5: java.security.MessageDigest = {
    val d = md5Local.get()
    d.reset()
    d
  }

  /** First 32 bits of md5(bytes) as unsigned-in-long — equals
    * `('0x' || substr(md5(s),1,8))::BIGINT`.
    */
  def md5Head32(d: java.security.MessageDigest, s: UTF8String): Long = {
    val b = d.digest(s.getBytes)
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) | ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  // ---- sorted-set Jaccard ------------------------------------------------

  /** One-pass merge Jaccard over two SORTED distinct long arrays. */
  def jaccardSortedLongs(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var common = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { common += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - common
    if (union == 0) 0.0 else common.toDouble / union
  }

  case class SortedJaccard(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = left.nullable || right.nullable
    override def prettyName: String = "jaccard_sorted"
    override def nullSafeEval(a: Any, b: Any): Any =
      jaccardSortedLongs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = "graft.functions.ArrayHashes$.MODULE$"
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $m.jaccardSortedLongs($a, $b);")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  def jaccard_sorted(a: Column, b: Column): Column =
    GraftBridge.column(SortedJaccard(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Per-edge triangle contributions, one pass: apexes = N⁺(b) ∩ N⁺(c)
    * (sorted-merge over the sorted adjacency arrays); emits
    * (apex, 1) for every apex plus (b, |apexes|) and (c, |apexes|), or
    * an EMPTY array when the edge closes nothing (explode then drops
    * the row). Summing `n` per id downstream yields exact per-node
    * triangle counts — each triangle contributes exactly once at each
    * of its three corners, by the orientation argument in
    * [[graft.ops.Graph.triangleCounts]].
    */
  def triangleContribs(b: Long, c: Long, nb: ArrayData, nc: ArrayData): ArrayData = {
    val na = nb.numElements()
    val nbn = nc.numElements()
    val apex = new Array[Long](Math.min(na, nbn))
    var i = 0; var j = 0; var w = 0
    while (i < na && j < nbn) {
      val x = nb.getLong(i); val y = nc.getLong(j)
      if (x == y) { apex(w) = x; w += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (w == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](w + 2)
    var k = 0
    while (k < w) {
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](apex(k), 1L))
      k += 1
    }
    out(w) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](b, w.toLong))
    out(w + 1) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](c, w.toLong))
    new GenericArrayData(out)
  }

  case class TriangleContribs(
      first: Expression, second: Expression, third: Expression, fourth: Expression)
      extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean =
      first.nullable || second.nullable || third.nullable || fourth.nullable
    override def prettyName: String = "triangle_contribs"
    override def nullSafeEval(b: Any, c: Any, nb: Any, nc: Any): Any =
      triangleContribs(b.asInstanceOf[Long], c.asInstanceOf[Long],
        nb.asInstanceOf[ArrayData], nc.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = "graft.functions.ArrayHashes$.MODULE$"
      nullSafeCodeGen(ctx, ev, (b, c, nb, nc) =>
        s"${ev.value} = $m.triangleContribs($b, $c, $nb, $nc);")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression, q: Expression): Expression =
      copy(first = f, second = s, third = t, fourth = q)
  }

  def triangle_contribs(b: Column, c: Column, nb: Column, nc: Column): Column =
    GraftBridge.column(TriangleContribs(GraftBridge.expression(b),
      GraftBridge.expression(c), GraftBridge.expression(nb), GraftBridge.expression(nc)))

  // ---- shingle min-md5 fingerprint ----------------------------------------

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = hexDigits((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** unsigned lexicographic compare — the byte order that matches
    * lowercase-hex STRING ordering (hex digits are ascii-monotone in
    * the nibble value), so the min digest IS the min hex string.
    */
  private def ltUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** `list_min([md5(shingle) for shingle in n-grams(toks)])` in ONE
    * native pass: each n-gram is streamed word-by-word into a reused
    * MD5 (space-joined, concat_ws semantics), digests compared as
    * unsigned bytes, the winner hex-encoded once at the end. Fewer
    * than n tokens ⇒ the whole token list is the single shingle —
    * shinglesOf's `otherwise` branch. Replaces the interpreted
    * transform(shingles)+md5+array_min chain whose lambda re-evaluated
    * the inlined `split` per element reference (O(len²) per document —
    * tx3_fingerprint measured 24 s of the sf0.1 noop bench on it).
    */
  def shingleMinMd5(toks: ArrayData, n: Int): UTF8String = {
    val m = toks.numElements()
    val d = md5
    def digestOf(start: Int, len: Int): Array[Byte] = {
      d.reset()
      var j = 0
      while (j < len) {
        if (j > 0) d.update(' '.toByte)
        val w = toks.getUTF8String(start + j)
        if (w != null) d.update(w.getBytes)
        j += 1
      }
      d.digest()
    }
    if (m < n) return UTF8String.fromString(hex(digestOf(0, m)))
    var best: Array[Byte] = null
    var i = 0
    while (i + n <= m) {
      val dig = digestOf(i, n)
      if (best == null || ltUnsigned(dig, best)) best = dig
      i += 1
    }
    UTF8String.fromString(hex(best))
  }

  case class ShingleMinMd5(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "shingle_min_md5"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> tokens and n >= 1, got ${other.sql} / n=$n")
    }
    override def nullSafeEval(t: Any): Any =
      shingleMinMd5(t.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = "graft.functions.ArrayHashes$.MODULE$"
      nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $m.shingleMinMd5($t, $n);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def shingle_min_md5(toks: Column, n: Int): Column =
    GraftBridge.column(ShingleMinMd5(GraftBridge.expression(toks), n))

  // ---- md5 hex-prefix hashes as one native pass ---------------------------

  /** First `hexChars` hex digits of md5(s) as a long — bit-identical to
    * `conv(substring(md5(s), 1, hexChars), 16, 10)` (the engine's
    * portable hash32/hash60) without materializing the 32-char hex
    * string, substringing it, and re-parsing it base-16: the value is
    * read straight off the digest bytes (each hex char is one nibble,
    * big-endian). hexChars ≤ 15 keeps the value positive in int64.
    */
  def md5HeadHex(s: UTF8String, hexChars: Int): Long = {
    val b = md5.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < hexChars) {
      val nib =
        if ((i & 1) == 0) (b(i >> 1) >> 4) & 0xf
        else b(i >> 1) & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  case class Md5HeadHex(child: Expression, hexChars: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "md5_head_hex"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType if hexChars >= 1 && hexChars <= 15 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string and 1 <= hexChars <= 15, got ${other.sql} / $hexChars")
    }
    override def nullSafeEval(s: Any): Any =
      md5HeadHex(s.asInstanceOf[UTF8String], hexChars)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = "graft.functions.ArrayHashes$.MODULE$"
      nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $m.md5HeadHex($s, $hexChars);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def md5_head_hex(s: Column, hexChars: Int): Column =
    GraftBridge.column(Md5HeadHex(GraftBridge.expression(s), hexChars))

  // ---- stopword-list language ID, one token pass ---------------------------

  /** The engine's language-ID stopword lists, ALPHABETICAL lang order —
    * the single source of truth ([[graft.ops.TextAnalysis.stopwords]]
    * re-exports this map; the oracle SQL hardcodes the same lists).
    * Order is semantics-bearing: the argmax encodes hits·4 + index, so
    * ties resolve to the alphabetically-LAST language.
    */
  val stopwordLangs: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "and", "of", "is", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  private val stopU: Array[Array[UTF8String]] =
    stopwordLangs.map(_._2.map(UTF8String.fromString).toArray).toArray
  private val langU: Array[UTF8String] =
    (stopwordLangs.map(_._1) :+ "und").map(UTF8String.fromString).toArray

  /** All four languages' stopword-hit counts in ONE pass over the
    * token array, argmax-encoded and decoded to the language string
    * (hits·4 + langIndex, max wins, <4 total ⇒ zero hits everywhere ⇒
    * "und") — bit-identical to the greatest(...)/when-chain DSL form,
    * which re-evaluated the inlined `split` and an interpreted filter
    * lambda once per language (5 full passes per row on tx2).
    */
  def langBest(toks: ArrayData): UTF8String = {
    val hits = new Array[Int](4)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val w = toks.getUTF8String(i)
      if (w != null) {
        var l = 0
        while (l < 4) {
          val lst = stopU(l)
          var k = 0
          while (k < lst.length) {
            if (lst(k).equals(w)) { hits(l) += 1; k = lst.length }
            else k += 1
          }
          l += 1
        }
      }
      i += 1
    }
    var best = 0
    var l = 0
    while (l < 4) { val e = hits(l) * 4 + l; if (e > best) best = e; l += 1 }
    if (best >= 4) langU(best % 4) else langU(4)
  }

  /** One language's stopword-hit count (same single token pass). */
  def stopwordHitCount(toks: ArrayData, lang: Int): Int = {
    val lst = stopU(lang)
    val n = toks.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      val w = toks.getUTF8String(i)
      if (w != null) {
        var k = 0
        while (k < lst.length) {
          if (lst(k).equals(w)) { hits += 1; k = lst.length }
          else k += 1
        }
      }
      i += 1
    }
    hits
  }

  case class LangBest(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "lang_best"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> tokens, got ${other.sql}")
    }
    override def nullSafeEval(t: Any): Any = langBest(t.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = "graft.functions.ArrayHashes$.MODULE$"
      nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $m.langBest($t);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class StopwordHitsExpr(child: Expression, lang: Int) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "stopword_hits"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) if lang >= 0 && lang < stopU.length =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> tokens and a valid lang index, got ${other.sql} / $lang")
    }
    override def nullSafeEval(t: Any): Any =
      stopwordHitCount(t.asInstanceOf[ArrayData], lang)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = "graft.functions.ArrayHashes$.MODULE$"
      nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $m.stopwordHitCount($t, $lang);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def lang_best(toks: Column): Column =
    GraftBridge.column(LangBest(GraftBridge.expression(toks)))

  def stopword_hits(toks: Column, lang: Int): Column =
    GraftBridge.column(StopwordHitsExpr(GraftBridge.expression(toks), lang))

  // ---- positional prefix equality (LSH first-colliding-band) -------------

  /** True iff any of the first `n` positions of the two long arrays are
    * equal. Used as the "an earlier band already collided" test in the
    * LSH first-colliding-band join — it runs once per joined candidate
    * row, where the HOF form (`exists(zip_with(slice...))`) is
    * interpreted with per-row array allocations (measured 5× slower on
    * the whole dd2 query).
    */
  def prefixAnyEqual(a: ArrayData, b: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) return true
      i += 1
    }
    false
  }

  case class PrefixAnyEqual(left: Expression, right: Expression, len: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    override def first: Expression = left
    override def second: Expression = right
    override def third: Expression = len
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = left.nullable || right.nullable || len.nullable
    override def prettyName: String = "prefix_any_equal"
    override def nullSafeEval(a: Any, b: Any, n: Any): Any =
      prefixAnyEqual(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        n.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = "graft.functions.ArrayHashes$.MODULE$"
      nullSafeCodeGen(ctx, ev, (a, b, n) => s"${ev.value} = $m.prefixAnyEqual($a, $b, $n);")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(left = f, right = s, len = t)
  }

  def prefix_any_equal(a: Column, b: Column, n: Column): Column =
    GraftBridge.column(PrefixAnyEqual(
      GraftBridge.expression(a), GraftBridge.expression(b), GraftBridge.expression(n)))

  // ---- first-common-element test (prefix-filter pair dedup) ---------------

  /** True iff the FIRST element of `pa` (in array order) that occurs
    * anywhere in `pb` equals `tok` — i.e.
    * `element_at(array_intersect(pa, pb), 1) === tok` for distinct
    * arrays, without array_intersect's per-row hash-set + result-array
    * allocation. Runs once per joined candidate row in the AllPairs
    * prefix join, where the prefixes are short by construction
    * (⌈(1−t)·|d|⌉+1 elements), so the nested scan with early exit is a
    * handful of long compares.
    */
  def firstCommonEquals(pa: ArrayData, pb: ArrayData, tok: Long): Boolean = {
    val na = pa.numElements()
    val nb = pb.numElements()
    var i = 0
    while (i < na) {
      val x = pa.getLong(i)
      var j = 0
      while (j < nb) {
        if (pb.getLong(j) == x) return x == tok
        j += 1
      }
      i += 1
    }
    false
  }

  case class FirstCommonEquals(left: Expression, right: Expression, tok: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    override def first: Expression = left
    override def second: Expression = right
    override def third: Expression = tok
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = left.nullable || right.nullable || tok.nullable
    override def prettyName: String = "first_common_equals"
    override def nullSafeEval(a: Any, b: Any, t: Any): Any =
      firstCommonEquals(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        t.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = "graft.functions.ArrayHashes$.MODULE$"
      nullSafeCodeGen(ctx, ev, (a, b, t) =>
        s"${ev.value} = $m.firstCommonEquals($a, $b, $t);")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(left = f, right = s, tok = t)
  }

  def first_common_equals(a: Column, b: Column, tok: Column): Column =
    GraftBridge.column(FirstCommonEquals(
      GraftBridge.expression(a), GraftBridge.expression(b), GraftBridge.expression(tok)))

  // ---- greedy BPE pair merge (tokenizer trainer inner loop) ---------------

  private val bpeSpace = UTF8String.fromString(" ")

  /** Greedy left-to-right merge of adjacent (a, b) token pairs: the
    * merged token is `a + " " + b` (word-level BPE keeps an internal
    * space, which also guarantees a merged token never equals a plain
    * whitespace-split token, so re-merging can't cascade within one
    * pass). One linear array pass per document — the Column-DSL fold
    * this replaces re-ran two regexes and an O(len) string copy per
    * token (O(len²) per document, interpreted).
    */
  def bpeMergePair(words: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = words.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (!out.isEmpty && out.get(out.size - 1).equals(a) && w.equals(b))
        out.set(out.size - 1, UTF8String.concat(a, bpeSpace, b))
      else out.add(w)
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size)))
  }

  case class BpeMergePair(arr: Expression, pa: Expression, pb: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    override def first: Expression = arr
    override def second: Expression = pa
    override def third: Expression = pb
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = arr.nullable || pa.nullable || pb.nullable
    override def prettyName: String = "bpe_merge_pair"
    override def nullSafeEval(w: Any, a: Any, b: Any): Any =
      bpeMergePair(w.asInstanceOf[ArrayData],
        a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = "graft.functions.ArrayHashes$.MODULE$"
      nullSafeCodeGen(ctx, ev, (w, a, b) => s"${ev.value} = $m.bpeMergePair($w, $a, $b);")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(arr = f, pa = s, pb = t)
  }

  def bpe_merge_pair(words: Column, a: Column, b: Column): Column =
    GraftBridge.column(BpeMergePair(
      GraftBridge.expression(words), GraftBridge.expression(a), GraftBridge.expression(b)))

  // ---- optimizer barrier ---------------------------------------------------

  /** Identity expression flagged non-deterministic: an optimizer
    * barrier. Project-collapse refuses to inline it and the
    * GetStructField(JsonToStructs) pruning rule can't see through it,
    * so an expensive child (a wide `from_json`, notably) is evaluated
    * exactly ONCE per row instead of once per field reference — the
    * envelope parse was measured evaluating 27× per row without this.
    * Codegen passes the child's code straight through (zero cost).
    */
  case class Opaque(child: Expression) extends UnaryExpression {
    override def dataType: DataType = child.dataType
    override def nullable: Boolean = child.nullable
    override lazy val deterministic: Boolean = false
    override def prettyName: String = "opaque"
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      child.eval(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      ev.copy(code = c.code, isNull = c.isNull, value = c.value)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def opaque(c: Column): Column = GraftBridge.column(Opaque(GraftBridge.expression(c)))

  // ---- MinHash signature -------------------------------------------------

  /** Largest prime below 2^32 — the modulus of the affine permutation
    * family. With a < 2^20 and h < 2^32 the product stays under 2^52,
    * so the arithmetic is exact in a signed 64-bit value in ANY engine
    * (DuckDB raises on int64 overflow; Spark would silently wrap — both
    * are avoided by construction).
    */
  val MinHashP = 4294967291L

  /** Deterministic affine coefficients for permutation i, derived from
    * md5 so the oracle can restate them: a = first 5 hex chars of
    * md5("a|i") forced odd (nonzero), b = first 8 hex chars of
    * md5("b|i") mod P.
    */
  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]
  def minHashPerms(k: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(k, _ => {
      val d = md5
      val as = new Array[Long](k)
      val bs = new Array[Long](k)
      var i = 0
      while (i < k) {
        val da = d.digest(s"a|$i".getBytes("UTF-8"))
        // first 5 hex chars = 20 bits
        as(i) = (((da(0) & 0xffL) << 12) | ((da(1) & 0xffL) << 4) |
          ((da(2) & 0xf0L) >> 4)) | 1L
        bs(i) = md5Head32(d, UTF8String.fromString(s"b|$i")) % MinHashP
        i += 1
      }
      (as, bs)
    })

  /** K-permutation MinHash over a distinct word array in one pass:
    * sig[i] = min over words of (a_i · md5Head32(word) + b_i) mod P —
    * ONE md5 digest per word plus k integer affine maps, instead of the
    * naive k digests per word (measured ~10× cheaper signatures at
    * k=32; same S-curve guarantees, universal-hash family).
    */
  def minHashSig(words: ArrayData, k: Int): ArrayData = {
    val (as, bs) = minHashPerms(k)
    val d = md5
    val sig = Array.fill(k)(Long.MaxValue)
    val n = words.numElements()
    var w = 0
    while (w < n) {
      val h = md5Head32(d, words.getUTF8String(w))
      var i = 0
      while (i < k) {
        val v = (as(i) * h + bs(i)) % MinHashP
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      w += 1
    }
    new GenericArrayData(sig)
  }

  case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"
    override def nullSafeEval(in: Any): Any =
      minHashSig(in.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = "graft.functions.ArrayHashes$.MODULE$"
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $m.minHashSig($c, $k);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def minhash_signature(words: Column, k: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(words), k))

  /** MinHash signature + LSH band keys fused in one pass. Returns
    * `bands` 60-bit longs; band b is md5Head60("b|sig[b·r]|…|sig[b·r+r-1]")
    * — longs, not hex strings, so the exploded band join shuffles and
    * compares 8 bytes per key instead of a 32-char string, and the
    * key arrays riding along for the first-colliding-band filter cost
    * 64 bytes per side instead of ~300.
    *
    * Fused deliberately: expressed as `explode(band_keys(element_at(sig,…)
    * × k))`, project-collapse duplicates the signature computation into
    * every element_at reference (measured 32× blowup). One opaque
    * expression evaluates the signature exactly once per row.
    */
  def minHashBandKeys(words: ArrayData, k: Int, bands: Int): ArrayData = {
    val sigArr = minHashSig(words, k)
    val r = k / bands
    val d = md5
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder
      sb.append(b)
      var j = 0
      while (j < r) { sb.append('|').append(sigArr.getLong(b * r + j)); j += 1 }
      out(b) = md5Head60(d, UTF8String.fromString(sb.toString))
      b += 1
    }
    new GenericArrayData(out)
  }

  case class MinHashBandKeys(child: Expression, k: Int, bands: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_band_keys"
    override def nullSafeEval(in: Any): Any =
      minHashBandKeys(in.asInstanceOf[ArrayData], k, bands)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = "graft.functions.ArrayHashes$.MODULE$"
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $m.minHashBandKeys($c, $k, $bands);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def minhash_band_keys(words: Column, k: Int, bands: Int): Column =
    GraftBridge.column(MinHashBandKeys(GraftBridge.expression(words), k, bands))

  /** First 60 bits of md5 as non-negative long — equals
    * `('0x' || substr(md5(s),1,15))::BIGINT` (Dedup.hash60).
    */
  def md5Head60(d: java.security.MessageDigest, s: UTF8String): Long = {
    val b = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Sorted distinct 60-bit hash set of word n-gram shingles, one pass.
    * Replaces `array_sort(transform(array_distinct(shingles(text,n)),
    * hash60))` whose interpreted lambdas re-evaluate the token split per
    * element (measured as the dominant cost of n-gram dedup). Matches
    * TextAnalysis.shingles semantics incl. the short-doc fallback
    * (fewer than n words ⇒ one shingle of the whole token list).
    */
  def shingleHashSet(words: ArrayData, n: Int): ArrayData = {
    val d = md5
    val count = words.numElements() - (n - 1)
    val sep = UTF8String.fromString(" ")
    val hashes: Array[Long] =
      if (count <= 0) {
        val parts = new Array[UTF8String](words.numElements())
        var i = 0
        while (i < parts.length) { parts(i) = words.getUTF8String(i); i += 1 }
        Array(md5Head60(d, UTF8String.concatWs(sep, parts: _*)))
      } else {
        val out = new Array[Long](count)
        var i = 0
        while (i < count) {
          val parts = new Array[UTF8String](n)
          var j = 0
          while (j < n) { parts(j) = words.getUTF8String(i + j); j += 1 }
          out(i) = md5Head60(d, UTF8String.concatWs(sep, parts: _*))
          i += 1
        }
        out
      }
    java.util.Arrays.sort(hashes)
    // in-place dedup of the sorted array
    var w = 0
    var i = 1
    while (i < hashes.length) {
      if (hashes(i) != hashes(w)) { w += 1; hashes(w) = hashes(i) }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w + 1))
  }

  case class ShingleHashSet(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hash_set"
    override def nullSafeEval(in: Any): Any =
      shingleHashSet(in.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = "graft.functions.ArrayHashes$.MODULE$"
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $m.shingleHashSet($c, $n);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def shingle_hash_set(words: Column, n: Int): Column =
    GraftBridge.column(ShingleHashSet(GraftBridge.expression(words), n))

  // ---- SimHash -----------------------------------------------------------

  /** 32-bit SimHash from a distinct word array in one pass: bit j is the
    * sign of Σ over words of ±1 per md5Head32(word) bit j.
    */
  def simHash32FromWords(words: ArrayData): Long = {
    val d = md5
    val sums = new Array[Int](32)
    val n = words.numElements()
    var w = 0
    while (w < n) {
      val h = md5Head32(d, words.getUTF8String(w))
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
      w += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) { if (sums(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  case class SimHash32(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash32"
    override def nullSafeEval(in: Any): Any =
      simHash32FromWords(in.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = "graft.functions.ArrayHashes$.MODULE$"
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $m.simHash32FromWords($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def simhash32(words: Column): Column =
    GraftBridge.column(SimHash32(GraftBridge.expression(words)))
}
