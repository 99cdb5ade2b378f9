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
}
