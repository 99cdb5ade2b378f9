package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.BloomFilter.{bloom_build, bloom_might_contain, semiFilter}

/** The Bloom filter must be deterministic under any partitioning
  * (bitwise-OR merge), free of false negatives (every present key
  * answers true — the property the semi-join prefilter's correctness
  * rests on), within the standard false-positive bound on absent keys,
  * and the prefiltered join must equal the plain join exactly. */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private val bits = 1 << 14
  private val k = 5

  private def members = (1 to 2000).map(i => s"m-$i").toDF("key")
  private def absents = (1 to 2000).map(i => s"x-$i").toDF("key")

  test("partitioning-independent: 1, 7, and 32 partitions agree exactly") {
    val filters = Seq(1, 7, 32).map { p =>
      members.repartition(p)
        .agg(bloom_build(col("key"), bits, k)).as[Seq[Long]].head()
    }
    assert(filters.distinct.size === 1,
      "merge order changed the filter — not deterministic")
    assert(filters.head.size === bits / 64)
  }

  test("no false negatives; false positives within the standard bound") {
    val bloom = members.agg(bloom_build(col("key"), bits, k).as("b"))
    def probe(df: org.apache.spark.sql.DataFrame) =
      df.crossJoin(broadcast(bloom))
        .select(bloom_might_contain(col("b"), col("key"), bits, k))
        .as[Boolean].collect()
    assert(probe(members).forall(identity),
      "a present key answered false — false negatives are impossible by construction")
    // n=2000, m=16384, k=5 → fpr ≈ (1-e^(-kn/m))^k ≈ 0.7%; allow 4x
    val fp = probe(absents).count(identity)
    assert(fp <= 2000 * 0.03, s"$fp false positives out of 2000 is above bound")
    assert(fp > 0 || bits > (1 << 20),
      "zero false positives at this load factor would be suspicious")
  }

  test("null keys: never added, never match") {
    val withNull = Seq(Some("a"), None).toDF("key")
    val bloom = withNull.agg(bloom_build(col("key"), bits, k).as("b"))
    val got = Seq("a").toDF("key").crossJoin(broadcast(bloom))
      .select(bloom_might_contain(col("b"), col("key"), bits, k))
      .as[Boolean].head()
    assert(got, "'a' must be present")
    // a null probe key yields null (SQL semantics), not true
    val nullProbe = Seq.empty[String].toDF("ignore")
    val np = withNull.filter(col("key").isNull)
      .crossJoin(broadcast(bloom))
      .select(bloom_might_contain(col("b"), col("key"), bits, k).isNull)
      .as[Boolean].head()
    assert(np, "null probe must be null, not a match")
  }

  test("semi-join prefilter: equal to the plain join, large side unshuffled") {
    val large = (1 to 20000).map(i => (s"m-${i % 3000}", i.toLong))
      .toDF("key", "v")
    val small = (1 to 500).map(i => (s"m-$i", s"dim-$i")).toDF("key", "name")
    val plain = large.join(small, "key")
    val pre = semiFilter(large, "key", small, "key", bits, k).join(small, "key")
    assert(pre.as[(String, Long, String)].collect().sorted.toSeq ===
      plain.as[(String, Long, String)].collect().sorted.toSeq)
    // the prefilter itself dropped most non-matching rows before any join
    val kept = semiFilter(large, "key", small, "key", bits, k).count()
    val matching = large.join(small.select("key").distinct(), "key").count()
    assert(kept >= matching, "prefilter can never drop a matching row")
    assert(kept <= matching + (20000 * 0.03).toLong,
      s"prefilter kept $kept rows vs $matching matching — too many false positives")
  }

  test("bloom_build is callable from SQL and matches the Column API") {
    graft.GraftExtensions.registerFunctions(spark)
    members.createOrReplaceTempView("bloom_in")
    val sqlBits = spark.sql(
      s"SELECT bloom_build(key, $bits, $k) FROM bloom_in")
      .as[Seq[Long]].head()
    val colBits = members.agg(bloom_build(col("key"), bits, k))
      .as[Seq[Long]].head()
    assert(sqlBits === colBits)
  }
}
