package graft.operators

import graft.SparkSpec

/** Behavior of [[Dedup.substringSpans]] (d09) on planted data: span
  * recovery, alignment offsets, the gap-split rule, and the boilerplate
  * occurrence cap. Random text is 26-letter uniform — 16-byte windows
  * collide with probability ~26^-16, so any shared fingerprint here is a
  * genuinely planted substring.
  */
class SubstringSpanSpec extends SparkSpec {
  import spark.implicits._

  private def randText(rng: scala.util.Random, n: Int): String =
    (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString

  test("a planted 100-char shared substring yields one aligned span inside it") {
    val rng = new scala.util.Random(7)
    val shared = randText(rng, 100)
    val a = randText(rng, 200) + shared + randText(rng, 150) // at 200 in doc 1
    val b = randText(rng, 50) + shared + randText(rng, 300) // at 50 in doc 2
    val docs = Seq((1L, a), (2L, b), (3L, randText(rng, 400)))
      .toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs).collect()
    assert(spans.length === 1, s"expected one span, got ${spans.toSeq}")
    val r = spans.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    val (si, sj, len) = (r.getLong(2), r.getLong(3), r.getLong(4))
    // alignment offset is exact: the shared substring sits 150 bytes later
    // in doc 1 than in doc 2
    assert(si - sj === 150L)
    // the span lies inside the planted region and covers its interior
    // (winnowing only guarantees selections ≥ stride windows from edges)
    assert(si >= 200L && si + len <= 300L)
    assert(len >= 50L, s"span should cover most of the region, got $len")
  }

  test("unrelated random documents yield no spans") {
    val rng = new scala.util.Random(11)
    val docs = (1L to 5L).map(i => (i, randText(rng, 500)))
      .toDF("doc_id", "text")
    assert(Dedup.substringSpans(docs).count() === 0L)
  }

  test("two distant shared substrings split into two spans") {
    val rng = new scala.util.Random(13)
    val s1 = randText(rng, 100)
    val s2 = randText(rng, 100)
    // different filler lengths → different alignment offsets per substring
    val a = randText(rng, 100) + s1 + randText(rng, 120) + s2 + randText(rng, 80)
    val b = randText(rng, 40) + s1 + randText(rng, 200) + s2 + randText(rng, 60)
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs).collect()
    assert(spans.length === 2, s"expected two spans, got ${spans.toSeq}")
    val offs = spans.map(r => r.getLong(2) - r.getLong(3)).sorted
    // s1: 100 vs 40 → off 60; s2: 320 vs 340... off = a_pos - b_pos
    assert(offs === Array(100L + 100 + 120 - (40 + 100 + 200), 60L).sorted)
  }

  test("boilerplate shared by many documents is capped out (no span explosion)") {
    val rng = new scala.util.Random(17)
    val boiler = randText(rng, 120)
    // 70 docs all carry the same 120-char boilerplate: every one of its
    // fingerprints occurs ~70 > maxOcc=64 times, so the cap drops them
    // BEFORE pairing — otherwise this would emit ~70²/2 span pairs
    val docs = (1L to 70L)
      .map(i => (i, randText(rng, 80) + boiler + randText(rng, 80)))
      .toDF("doc_id", "text")
    assert(Dedup.substringSpans(docs).count() === 0L)
    // the same corpus under a higher cap DOES pair up
    assert(Dedup.substringSpans(docs, maxOcc = 100000).count() > 0L)
  }
}
