package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("bucketed range join equals the naive inequality join") {
    val points = Seq(
      (1L, 10L, ts("2024-01-01 10:30:00")),
      (2L, 10L, ts("2024-01-01 13:00:00")),  // in no interval
      (3L, 20L, ts("2024-01-02 08:15:00"))
    ).toDF("pid", "k", "pt")
    val intervals = Seq(
      (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "A"),
      (10L, ts("2024-01-01 11:30:00"), ts("2024-01-01 12:00:00"), "B"),
      (20L, ts("2024-01-02 08:00:00"), ts("2024-01-02 09:00:00"), "C")
    ).toDF("k", "start_ts", "end_ts", "tag")

    val bucketed = RangeJoin.pointInInterval(
        points, intervals, Seq("k"), "pt", "start_ts", "end_ts",
        bucketSeconds = 600)
      .select("pid", "tag").as[(Long, String)].collect().toSet
    val naive = points.join(intervals, points("k") === intervals("k")
        && points("pt") >= intervals("start_ts") && points("pt") <= intervals("end_ts"))
      .select("pid", "tag").as[(Long, String)].collect().toSet
    assert(bucketed === naive)
    assert(bucketed === Set((1L, "A"), (3L, "C")))
  }

  test("interval boundaries are inclusive on both ends") {
    val points = Seq((1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 11:00:00"))).toDF("pid", "k", "pt")
    val intervals = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "X"))
      .toDF("k", "start_ts", "end_ts", "tag")
    val out = RangeJoin.pointInInterval(
      points, intervals, Seq("k"), "pt", "start_ts", "end_ts")
    assert(out.count() === 2)
  }
}
