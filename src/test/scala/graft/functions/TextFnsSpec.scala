package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.RollingFingerprint.rolling_fingerprint

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint is word-order invariant, distinct for different vocab") {
    val fps = Seq(
      (1L, "alpha beta gamma"), (2L, "gamma alpha beta"), (3L, "alpha beta delta"))
      .toDF("id", "text")
      .select($"id", TextFns.fingerprint($"text").as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("rolling fingerprint: shared long substring ⇒ shared hashes; disjoint texts ⇒ none") {
    val common = "the quick brown fox jumps over the lazy dog"
    val rows = Seq(
      (1L, s"prefix one $common suffix aa"),
      (2L, s"other start $common different end"),
      (3L, "completely unrelated content with no overlap at all here"))
      .toDF("id", "text")
      .select($"id", rolling_fingerprint($"text").as("fp"))
    val fps = rows.as[(Long, Seq[Long])].collect().toMap
    val shared12 = fps(1L).toSet intersect fps(2L).toSet
    val shared13 = fps(1L).toSet intersect fps(3L).toSet
    assert(shared12.nonEmpty, "documents sharing a 44-char substring must share fingerprints")
    assert(shared13.isEmpty, "unrelated documents should not collide")
  }

  test("rolling fingerprint of short text (< window) is empty") {
    val fp = Seq((1L, "tiny")).toDF("id", "text")
      .select(rolling_fingerprint($"text").as("fp"))
      .as[Seq[Long]].head()
    assert(fp.isEmpty)
  }

  test("rolling fingerprint is deterministic") {
    val t = "some reasonably long text for fingerprint determinism checking purposes"
    val f1 = Seq(Tuple1(t)).toDF("text").select(rolling_fingerprint($"text")).as[Seq[Long]].head()
    val f2 = Seq(Tuple1(t)).toDF("text").select(rolling_fingerprint($"text")).as[Seq[Long]].head()
    assert(f1 === f2)
  }

  test("rolling_fingerprint_pos: fp set equals the set form; positions hash back to their fp") {
    import graft.functions.expressions.RollingFingerprint.rolling_fingerprint_pos
    val t = "the quick brown fox jumps over the lazy dog and then some more text to fingerprint"
    val pairs = Seq(Tuple1(t)).toDF("text")
      .select(rolling_fingerprint_pos($"text").as("sp"))
      .as[Seq[(Long, Int)]].head()
    val plain = Seq(Tuple1(t)).toDF("text")
      .select(rolling_fingerprint($"text")).as[Seq[Long]].head()
    // same winnowing selection, position-annotated
    assert(pairs.map(_._1).toSet === plain.toSet)
    // every position points at the window that hashes to its fp
    val M = (BigInt(1) << 61) - 1
    def hashAt(pos: Int): Long =
      t.substring(pos, pos + 16).getBytes("UTF-8").zipWithIndex
        .map { case (b, j) => BigInt(b & 0xff) * BigInt(257).modPow(BigInt(15 - j), M) }
        .sum.mod(M).toLong
    pairs.foreach { case (fp, pos) => assert(hashAt(pos) === fp) }
  }

  test("rolling_fingerprint_pos of short text is empty") {
    import graft.functions.expressions.RollingFingerprint.rolling_fingerprint_pos
    val sp = Seq(Tuple1("tiny")).toDF("text")
      .select(rolling_fingerprint_pos($"text").as("sp"))
      .as[Seq[(Long, Int)]].head()
    assert(sp.isEmpty)
  }

  test("piiRedact scrubs every email/ip/phone occurrence; counts match") {
    import graft.functions.TextFns._
    val t = "write bob.smith@corp.io or 192.168.0.1 then 555-123-4567 " +
      "again bob.smith@corp.io end"
    val row = Seq(Tuple1(t)).toDF("text").select(
      piiCount($"text", EmailRe).as("e"),
      piiCount($"text", Ipv4Re).as("i"),
      piiCount($"text", PhoneRe).as("p"),
      piiRedact($"text").as("r"))
      .head()
    assert(row.getAs[Long]("e") === 2L)
    assert(row.getAs[Long]("i") === 1L)
    assert(row.getAs[Long]("p") === 1L)
    assert(row.getAs[String]("r") ===
      "write [EMAIL] or [IP] then [PHONE] again [EMAIL] end")
  }

  test("piiRedact leaves clean text untouched") {
    import graft.functions.TextFns._
    val t = "no sensitive content here just plain words and a dot."
    val r = Seq(Tuple1(t)).toDF("text").select(piiRedact($"text")).as[String].head()
    assert(r === t)
  }

  test("repetition metrics: hand-computed fixture values") {
    // "a a a b": top share 3/4; trigrams [a a a, a a b] both distinct → 0.
    // "a a a a": trigrams [a a a, a a a] → 1 distinct of 2 → 0.5 dup frac.
    val df = Seq((1L, "a a a b"), (2L, "a a a a")).toDF("doc_id", "text")
    val m = graft.queries.TextQueries.repetitionMetrics(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(m(1L) === ((4L, 0.75, 0.0)))
    assert(m(2L) === ((4L, 1.0, 0.5)))
  }
}
