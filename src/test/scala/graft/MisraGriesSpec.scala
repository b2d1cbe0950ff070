package graft

import graft.functions.MisraGriesAggregator
import org.scalatest.funsuite.AnyFunSuite

/** The Misra–Gries no-misses guarantee, exercised WITHOUT Spark so we can
  * drive adversarial partitionings and merge orders directly: for any
  * stream split into any partitions merged in any order, every item with
  * true frequency > n/k must survive as a summary key. */
class MisraGriesSpec extends AnyFunSuite {

  private def runPartitioned(agg: MisraGriesAggregator,
      parts: Seq[Seq[String]], leftFold: Boolean): Map[String, Long] = {
    val summaries = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    if (leftFold) summaries.foldLeft(agg.zero)(agg.merge)
    else summaries.reduceRight(agg.merge)
  }

  private def exactHH(stream: Seq[String], k: Int): Set[String] = {
    val n = stream.length
    stream.groupBy(identity).collect {
      case (t, xs) if xs.length.toLong * k > n => t
    }.toSet
  }

  test("summary size never exceeds k-1 through reduces and merges") {
    val agg = new MisraGriesAggregator(8)
    val stream = (1 to 5000).map(i => s"t${i % 100}")
    val summary = runPartitioned(agg, stream.grouped(37).toSeq, leftFold = true)
    assert(summary.size <= 7)
  }

  test("no-misses guarantee holds under random skewed streams × partitionings") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 30) {
      val k = 2 + rnd.nextInt(15)
      val agg = new MisraGriesAggregator(k)
      // zipf-ish skew: item i with weight ~ 1/(i+1)
      val stream = scala.util.Random.javaRandomToRandom(
        new java.util.Random(trial)).shuffle(
        (0 until 40).flatMap(i => Seq.fill(400 / (i + 1))(s"w$i")))
      val partSize = 1 + rnd.nextInt(stream.length)
      val parts = stream.grouped(partSize).toSeq
      val summary = runPartitioned(agg, parts, leftFold = trial % 2 == 0)
      val hh = exactHH(stream, k)
      assert(hh.subsetOf(summary.keySet),
        s"trial $trial k=$k missed ${hh -- summary.keySet}")
      assert(summary.size <= k - 1)
      // undercount bound: counter ≥ exact − n/k for every tracked item
      val exact = stream.groupBy(identity).view.mapValues(_.length.toLong)
      summary.foreach { case (t, c) =>
        assert(c <= exact(t), s"counter for $t overcounts")
        assert(c >= exact(t) - stream.length / k,
          s"counter for $t undercounts past n/k")
      }
    }
  }

  test("single-partition degenerate and all-singleton partitions agree on HH") {
    val agg = new MisraGriesAggregator(4)
    val stream = Seq.fill(60)("hot") ++ (1 to 90).map(i => s"cold$i")
    val one = runPartitioned(agg, Seq(stream), leftFold = true)
    val shredded = runPartitioned(agg, stream.map(Seq(_)), leftFold = false)
    val hh = exactHH(stream, 4)
    assert(hh.subsetOf(one.keySet) && hh.subsetOf(shredded.keySet))
  }
}
