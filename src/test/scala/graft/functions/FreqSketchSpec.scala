package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Property tests for the Misra-Gries summary, run directly against
  * the aggregator (no Spark needed): the mergeable-summaries
  * guarantees must hold for ANY insertion order and ANY merge
  * topology, so random multisets fold through random partition splits.
  */
class FreqSketchSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val p = Gen.Parameters.default
    Iterator.from(0)
      .map(i => g(p, org.scalacheck.rng.Seed(7L + i)))
      .flatten.take(n).toSeq
  }

  // skewed multisets: a few heavy values + a long tail, then shuffled
  private val dataGen: Gen[Seq[String]] = for {
    heavy <- Gen.chooseNum(1, 3)
    heavyReps <- Gen.chooseNum(50, 200)
    tail <- Gen.chooseNum(50, 400)
    shuffleSeed <- Gen.chooseNum(0L, Long.MaxValue)
  } yield {
    val base = (1 to heavy).flatMap(h => Seq.fill(heavyReps)(s"hot$h")) ++
      (1 to tail).map(i => s"cold${i % 97}")
    base.indices.sortBy(i => (i * 2654435761L + shuffleSeed) % base.size)
      .map(base)
  }

  test("property: MG summary bounds hold under random orders and merge splits") {
    for ((data, idx) <- samples(dataGen, 25).zipWithIndex; k <- Seq(5, 24)) {
      val mg = new FreqSketch.MisraGries(k)
      // random merge topology: fold each chunk independently, merge
      val chunks = data.grouped(math.max(1, data.size / (idx % 4 + 1))).toSeq
      val merged = chunks
        .map(c => c.foldLeft(mg.zero)(mg.reduce))
        .reduce(mg.merge)
      val out = mg.finish(merged).toMap
      val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = data.size.toLong
      val floor = n / (k + 1)
      assert(out.size <= k, s"summary exceeded k: ${out.size} > $k")
      out.foreach { case (v, w) =>
        assert(w <= truth(v), s"$v stored $w above true ${truth(v)}")
        assert(w >= truth(v) - floor,
          s"$v deficit ${truth(v) - w} above bound $floor")
      }
      truth.foreach { case (v, c) =>
        if (c > floor)
          assert(out.contains(v),
            s"lost guaranteed value $v (count $c > floor $floor, k=$k)")
      }
    }
  }

  test("nulls are skipped by reduce — excluded from the frequency domain") {
    val mg = new FreqSketch.MisraGries(4)
    val buf = Seq("a", null, "a", null, "b").foldLeft(mg.zero)(mg.reduce)
    assert(mg.finish(buf).toMap == Map("a" -> 2L, "b" -> 1L))
  }

  test("property: duplicates between prunes collapse — a value never occupies two slots") {
    val mg = new FreqSketch.MisraGries(8)
    val buf = (1 to 200).foldLeft(mg.zero)((b, i) => mg.reduce(b, s"v${i % 5}"))
    val out = mg.finish(buf)
    assert(out.map(_._1).distinct.size == out.size)
    assert(out.size <= 8)
  }
}
