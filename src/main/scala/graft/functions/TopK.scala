package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoder

/** Bounded per-key top-k as a typed Aggregator (SURVEY.md §2.10, the
  * RingBuffer pattern): every partial buffer holds at most k entries,
  * so a per-query top-k SHUFFLES ≤ k rows per map partition instead of
  * sorting the full candidate set through the exchange the way a
  * `row_number` window does. At 100 TB ANN scale (millions of
  * candidates per query across partitions) the exchange carries
  * k·partials, not candidates — the aggregation-not-window trade the
  * IVF assignment already makes for top-1.
  */
object TopK {

  /** Keep the k best (score desc, id asc) pairs; emit (id, score, rank)
    * rank-ascending — identical ordering to the window formulation
    * `row_number() OVER (ORDER BY score DESC, id)`.
    *
    * `reduce` appends unsorted and only sorts/truncates once the buffer
    * exceeds 2k — the classic amortized-heap trick: O(log k) amortized
    * per row instead of the O(k log k) full re-sort a prune-per-row
    * pays. The map-side buffer (what the exchange serializes) is
    * therefore ≤ 2k entries rather than exactly k — same asymptotics,
    * and `merge`/`finish` prune to k so the result is hash-identical.
    */
  final class TopKByScore(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Long, Double, Int)]] {
    private def prune(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      b.sortBy(x => (-x._1, x._2)).take(k)
    override def zero: Seq[(Double, Long)] = Nil
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
      val grown = a +: b
      if (grown.length > 2 * k) prune(grown) else grown
    }
    override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      prune(x ++ y)
    override def finish(r: Seq[(Double, Long)]): Seq[(Long, Double, Int)] =
      prune(r).zipWithIndex.map { case ((s, id), i) => (id, s, i + 1) }
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Double, Int)]] =
      ExpressionEncoder[Seq[(Long, Double, Int)]]()
  }

  /** Column-API form: `top_k_by_score(10)($"score", $"neighbor_id")`. */
  def topKByScore(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKByScore(k))
}
