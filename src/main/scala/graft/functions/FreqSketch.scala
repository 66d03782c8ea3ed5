package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoder

/** Bounded frequent-items summary — Misra-Gries '82 in the mergeable
  * form of Agarwal et al., "Mergeable Summaries" (PODS '12): each
  * partial holds ≤ 4k (value, weight) entries between prunes and ≤ k
  * after, so sketching a 100 TB column exchanges k·partials — never the
  * value set. The merged summary's deficit is bounded: every item's
  * stored weight underestimates its true count by at most n/(k+1)
  * TOTAL, over ANY insertion order and ANY merge topology — so any
  * value with true frequency above n/(k+1) is GUARANTEED present in
  * the final summary. That superset guarantee is what makes the 2-pass
  * exact heavy-hitter query ([[graft.ops.Sketches.heavyHittersExact]])
  * exact: pass 1 cannot lose a qualifying value, pass 2 counts the
  * ≤ k candidates exactly.
  */
object FreqSketch {

  final class MisraGries(k: Int)
      extends Aggregator[String, Seq[(String, Long)], Seq[(String, Long)]] {
    require(k >= 1, "misra_gries: k must be >= 1")

    /** Combine duplicate values; if more than k survive, subtract the
      * (k+1)-th largest weight from every counter and drop the ≤ 0 —
      * the Misra-Gries decrement, batched. Stored entries are sorted by
      * value so the summary's representation is deterministic.
      */
    private def prune(b: Seq[(String, Long)]): Seq[(String, Long)] = {
      val combined = b.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toSeq
      val out =
        if (combined.size <= k) combined
        else {
          val cut = combined.map(_._2).sorted(Ordering[Long].reverse)(k)
          combined.collect { case (v, c) if c > cut => (v, c - cut) }
        }
      out.sortBy(_._1)
    }

    override def zero: Seq[(String, Long)] = Nil
    override def reduce(b: Seq[(String, Long)], v: String): Seq[(String, Long)] = {
      // nulls are excluded from the frequency domain (prune's sort and
      // the downstream candidate join are both null-hostile); callers
      // that need them counted must map to a sentinel first
      if (v == null) b
      else {
        // amortized: append unsorted, prune at 4k (duplicates between
        // prunes collapse at the next prune; bound and guarantee hold)
        val grown = (v, 1L) +: b
        if (grown.length > 4 * k) prune(grown) else grown
      }
    }
    override def merge(x: Seq[(String, Long)], y: Seq[(String, Long)]): Seq[(String, Long)] =
      prune(x ++ y)
    override def finish(r: Seq[(String, Long)]): Seq[(String, Long)] = prune(r)
    override def bufferEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Column-API form: `misra_gries(256)($"value")` → array of
    * (value, lower-bound weight) structs, ≤ k entries.
    */
  def misraGries(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGries(k))
}
