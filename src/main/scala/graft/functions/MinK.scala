package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoder

/** Bounded k-minimum-values buffer — the aggregation core of the
  * KMV/theta distinct sketch (Bar-Yossef et al. '02; theta sketches:
  * Dasgupta et al., "Theta sketch framework").
  *
  * Same scale contract as [[TopK]]: every partial buffer holds at most
  * 2k entries, so sketching a 100 TB column shuffles k·partials — never
  * the distinct set itself (the `collect_set` failure mode). The output
  * is the k smallest DISTINCT hash values in ascending order; dedup
  * happens in the prune (merge/finish always prune), so feeding the
  * same element twice cannot occupy two slots.
  */
object MinK {

  final class MinKDistinct(k: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    private def prune(b: Seq[Long]): Seq[Long] = b.distinct.sorted.take(k)
    override def zero: Seq[Long] = Nil
    override def reduce(b: Seq[Long], a: Long): Seq[Long] = {
      // amortized: append unsorted, prune at 2k (duplicates may sit in
      // the buffer between prunes — they collapse at the next prune,
      // so the bound and the final distinctness both hold)
      val grown = a +: b
      if (grown.length > 2 * k) prune(grown) else grown
    }
    override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = prune(x ++ y)
    override def finish(r: Seq[Long]): Seq[Long] = prune(r)
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Column-API form: `min_k_distinct(256)($"hash60")`. */
  def minKDistinct(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MinKDistinct(k))
}
