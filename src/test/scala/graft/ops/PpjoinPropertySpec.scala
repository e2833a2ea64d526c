package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property: the PPJoin candidate filters (canonical-order
  * prefix, length, positional overlap) are LOSSLESS — on random corpora
  * drawn from a small vocabulary (maximizing shingle collisions, shared
  * prefixes, and at-threshold boundary pairs), the filtered pair set
  * with exact values equals the unfiltered inverted-index join at every
  * threshold. Raw ScalaCheck runner (no scalatestplus bridge in the
  * offline dependency set); sample count kept low because every sample
  * runs two distributed joins. */
class PpjoinPropertySpec extends SparkSpec {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")

  private val docGen: Gen[String] =
    Gen.chooseNum(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))

  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(4, 24).flatMap(n => Gen.listOfN(n, docGen))

  private val thresholdGen: Gen[Double] =
    Gen.oneOf(0.15, 1.0 / 3.0, 0.5, 0.75, 0.9)

  test("PPJoin == unfiltered on random small-vocabulary corpora at random thresholds") {
    import spark.implicits._
    val prop = Prop.forAll(corpusGen, thresholdGen) { (texts, t) =>
      val docs = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      val full = TextHashing.jaccardPairs(docs, t).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toMap
      val pp = TextHashing.jaccardPairsPPJoin(docs, t).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toMap
      Prop(pp == full) :| s"t=$t full=${full.size} pp=${pp.size} " +
        s"missing=${(full.keySet -- pp.keySet).take(3)} extra=${(pp.keySet -- full.keySet).take(3)}"
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(result.passed, s"ppjoin losslessness: $result")
  }
}
