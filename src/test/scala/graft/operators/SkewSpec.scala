package graft.operators

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join on skewed data") {
    // 90% of fact rows hit one hot key.
    val facts = (1L to 2000L).map { i =>
      val k = if (i % 10 == 0) (i % 7) + 2 else 1L
      (i, k, i * 0.5)
    }.toDF("row_id", "k", "v")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e"), (7L, "f"), (8L, "g")).toDF("k", "name")

    val plain = facts.join(dim, "k")
      .select("row_id", "name").as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(facts, dim, "k", saltFactor = 8,
      factStableCols = Seq("row_id"))
      .select("row_id", "name").as[(Long, String)].collect().toSet
    assert(salted === plain)
    assert(salted.size === 2000)
  }

  test("salt is deterministic and spreads the hot key") {
    val df = (1L to 1000L).toDF("id")
    val s1 = df.select(Skew.salt(8, $"id").as("s")).as[Long].collect()
    val s2 = df.select(Skew.salt(8, $"id").as("s")).as[Long].collect()
    assert(s1.toSeq === s2.toSeq)
    assert(s1.distinct.length === 8) // every salt bucket used
  }
}
