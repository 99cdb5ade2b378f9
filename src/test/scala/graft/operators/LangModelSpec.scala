package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bigram-LM perplexity filtering: the numbers are pinned by a
  * plain-Scala recomputation (independent of BOTH query engines — the
  * defense against shared-formula errors that an engine-vs-engine
  * oracle can't catch), plus the semantic property that makes the
  * filter useful: reference-like text scores lower than gibberish. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private val ref = Seq(
    (1L, "ref", "the cat sat on the mat"),
    (2L, "ref", "the dog sat on the rug"))
  private val eval = Seq(
    (10L, "eval", "the cat sat"),          // pure reference phrasing
    (11L, "eval", "zx qv pl mn"),          // gibberish: every bigram unseen
    (12L, "eval", "one"))                  // single token: no bigrams, no row
  private lazy val docs = (ref ++ eval).toDF("doc_id", "source", "text")

  private def scored: Map[Long, (Long, Double)] = {
    val (counts, ctx, vocab) = LangModel.train(docs, "doc_id", "text",
      col("source") === "ref")
    LangModel.crossEntropy(docs, "doc_id", "text", counts, ctx, vocab)
      .select("doc_id", "m", "xent").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("cross-entropy matches an independent plain-Scala recomputation") {
    // independent model: bigram/context counts + vocab from the ref rows
    val refTokens = ref.map(_._3.split(" ").toSeq)
    val refBigrams = refTokens.flatMap(t => t.zip(t.tail))
    val c = refBigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = refBigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = refTokens.flatten.distinct.size.toLong
    def expected(text: String): (Long, Double) = {
      val t = text.split(" ").toSeq
      val bg = t.zip(t.tail)
      val sum = bg.map { b =>
        math.log((c.getOrElse(b, 0L) + 1).toDouble /
          (n.getOrElse(b._1, 0L) + v))
      }.sum
      (bg.size.toLong,
        BigDecimal(-sum / bg.size).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
    val got = scored
    (ref ++ eval).filter(_._3.split(" ").length >= 2).foreach { case (id, _, text) =>
      val (em, ex) = expected(text)
      assert(got(id)._1 === em, s"doc $id bigram count")
      assert(math.abs(got(id)._2 - ex) < 2e-4, s"doc $id: got ${got(id)._2}, want $ex")
    }
  }

  test("reference-like text scores lower cross-entropy than gibberish") {
    val got = scored
    assert(got(10L)._2 < got(11L)._2,
      s"in-domain ${got(10L)._2} should beat gibberish ${got(11L)._2}")
    assert(!got.contains(12L), "a 1-token doc has no bigrams and no row")
  }

  test("scoring scales: model joins stay keyed (no product)") {
    val (counts, ctx, vocab) = LangModel.train(docs, "doc_id", "text",
      col("source") === "ref")
    val plan = LangModel.crossEntropy(docs, "doc_id", "text", counts, ctx, vocab)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("CartesianProduct"), plan.take(600))
  }
}
