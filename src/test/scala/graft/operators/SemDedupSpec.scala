package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemDeDup: the engine's kept set must equal an independent
  * plain-Scala tournament over the same clusters, planted duplicate
  * groups that share a cell must collapse to exactly their
  * farthest-from-centroid member, and the kept set must be independent
  * (no two kept cell-mates above the threshold). */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Two tight groups on different axes + separated singletons.
    * Group A = ids 1,2,3 (axis 0 with tiny per-id noise on axis 2),
    * group B = ids 10,11 (axis 1), singletons 20 (axis 2), 21 (axis 3). */
  private lazy val fixture = {
    def v(axis: Int, noiseAxis: Int, noise: Double): Seq[Float] =
      (0 until 64).map(k =>
        (if (k == axis) 1.0 else 0.0) +
          (if (k == noiseAxis) noise else 0.0)).map(_.toFloat)
    Seq(
      (1L, v(0, 2, 0.01)), (2L, v(0, 2, 0.02)), (3L, v(0, 2, 0.03)),
      (10L, v(1, 2, 0.01)), (11L, v(1, 2, 0.02)),
      (20L, v(2, 5, 0.0)), (21L, v(3, 5, 0.0))
    ).toDF("vec_id", "embedding")
  }

  private val threshold = 0.9

  /** Independent reimplementation of the tournament over the SAME
    * clusters (ivfIndex is spec/oracle-proven separately): rank =
    * (rounded centroid cosine asc, id asc); dropped iff some
    * better-ranked cell-mate has cos ≥ threshold. */
  private def expectedKept(nCentroids: Int): Set[Long] = {
    val (refined, cells) = Similarity.ivfIndex(fixture, nCentroids)
    def dot(a: scala.collection.Seq[Double], b: scala.collection.Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val cents = refined.collect().map { r =>
      r.getAs[Long]("cid") ->
        (r.getAs[scala.collection.Seq[Double]]("cv"), r.getAs[Double]("cn"))
    }.toMap
    val members = cells.collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Double]]("cv2")
      val nrm = r.getAs[Double]("cn2")
      val cid = r.getAs[Long]("cid")
      val (cv, cn) = cents(cid)
      (r.getAs[Long]("neighbor_id"), cid, v, nrm,
        BigDecimal(dot(v, cv) / (nrm * cn))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    members.filter { case (i, cid, vi, ni, ci) =>
      !members.exists { case (j, cid2, vj, nj, cj) =>
        cid2 == cid && j != i &&
          (cj < ci || (cj == ci && j < i)) &&
          dot(vi, vj) / (ni * nj) >= threshold
      }
    }.map(_._1).toSet
  }

  test("kept set equals the independent tournament over the same cells") {
    val kept = Similarity.semDedup(fixture, threshold, nCentroids = 2)
      .select("vid").as[Long].collect().toSet
    assert(kept === expectedKept(2))
    // and it is independent: no two kept cell-mates are near-dups
    val k = Similarity.semDedup(fixture, threshold, nCentroids = 2)
      .select("vid", "cid")
    val pairs = Similarity.nearDupPairs(
      fixture.join(k.select(col("vid").as("vec_id")), "vec_id"), threshold)
      .join(k.select(col("vid").as("i"), col("cid").as("ci")), "i")
      .join(k.select(col("vid").as("j"), col("cid").as("cj")), "j")
      .filter(col("ci") === col("cj"))
    assert(pairs.count() === 0L, "two kept cell-mates are near-duplicates")
  }

  test("a co-celled planted group keeps exactly its farthest member") {
    val out = Similarity.semDedup(fixture, threshold, nCentroids = 2)
      .select("vid", "cid", "cent_sim")
      .as[(Long, Long, Double)].collect()
    val cellOf = {
      val (_, cells) = Similarity.ivfIndex(fixture, 2)
      cells.select(col("neighbor_id"), col("cid"))
        .as[(Long, Long)].collect().toMap
    }
    for (group <- Seq(Seq(1L, 2L, 3L), Seq(10L, 11L))) {
      if (group.map(cellOf).distinct.size == 1) {
        val keptInGroup = out.filter(r => group.contains(r._1))
        assert(keptInGroup.length === 1,
          s"group $group kept ${keptInGroup.length} members")
      }
    }
    // separated singletons always survive
    assert(out.map(_._1).toSet.intersect(Set(20L, 21L)) === Set(20L, 21L))
  }
}
