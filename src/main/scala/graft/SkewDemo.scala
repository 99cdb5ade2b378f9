package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Skew

/** Demonstrates/validates the salted skew join on real tables: joins
  * lineitem→part both plain and salted and reports row-count equality
  * plus timings.
  *
  * Usage: runMain graft.SkewDemo [sfDir] [saltFactor]
  */
object SkewDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val saltFactor = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = Tables.t(spark, sfDir, "lineitem")
      .withColumnRenamed("l_partkey", "p_partkey")
    val part = Tables.t(spark, sfDir, "part").select("p_partkey", "p_brand")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (plainN, tPlain) = time(li.join(part, "p_partkey").count())
    val (saltedN, tSalted) = time(Skew.saltedJoin(
      li, part, "p_partkey", saltFactor, Seq("l_orderkey", "l_linenumber")).count())
    println(s"""{"plain_rows":$plainN,"salted_rows":$saltedN,"equal":${plainN == saltedN},"plain_s":$tPlain,"salted_s":$tSalted,"salt_factor":$saltFactor}""")
    spark.stop()
  }
}
