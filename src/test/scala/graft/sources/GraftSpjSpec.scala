package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Storage-partitioned joins: two catalog tables partitioned the same
  * way join WITHOUT a shuffle on either side — the scans report
  * `KeyGroupedPartitioning` over the partition tuple (decoded per file
  * from single-valued footer stats) and Spark's `KeyGroupedShuffleSpec`
  * aligns them. Opt-in via spark.sql.sources.v2.bucketing.enabled +
  * spark.graft.spj.preserveDataGrouping. */
class GraftSpjSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-spj-wh").toString
    spark.conf.set("spark.sql.catalog.graftspj",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftspj.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftspj.s")
    w
  }

  private def sql(s: String): DataFrame = { warehouse; spark.sql(s) }

  /** Run `f` with SPJ active and plan-shape noise (AQE, broadcast)
    * pinned off so exchange assertions are deterministic. */
  private def withSpj[A](f: => A): A = {
    val saved = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.graft.spj.preserveDataGrouping",
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      spark.conf.set("spark.graft.spj.preserveDataGrouping", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      f
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** The JOIN/AGG shuffles only: a global ORDER BY's range exchange is
    * expected, and BroadcastExchange is not a shuffle. Materialize the
    * string EAGERLY (queryExecution is lazy — reading it after a conf
    * scope closes would plan under the restored confs). */
  private def keyShuffles(df: DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    p.contains("Exchange hashpartitioning") ||
      p.contains("Exchange SinglePartition")
  }

  private lazy val tablesReady: Unit = {
    sql("CREATE TABLE graftspj.s.orders (ok BIGINT, nk INT, amt DOUBLE) " +
      "PARTITIONED BY (nk)")
    sql("CREATE TABLE graftspj.s.cust (ck BIGINT, nk INT, seg STRING) " +
      "PARTITIONED BY (nk)")
    (0 until 400).map(i => (i.toLong, i % 5, i * 1.5))
      .toDF("ok", "nk", "amt").createOrReplaceTempView("spj_o")
    (0 until 100).map(i => (i.toLong, i % 5, s"seg${i % 3}"))
      .toDF("ck", "nk", "seg").createOrReplaceTempView("spj_c")
    sql("INSERT INTO graftspj.s.orders SELECT * FROM spj_o")
    // a second commit per side: multiple files per partition tuple
    sql("INSERT INTO graftspj.s.orders SELECT ok + 1000, nk, amt FROM spj_o")
    sql("INSERT INTO graftspj.s.cust SELECT * FROM spj_c")
  }

  test("co-partitioned tables join with NO exchange on either side, " +
      "and the result matches the shuffled join exactly") {
    tablesReady
    val q = """SELECT o.nk AS nk, count(*) AS n, sum(o.amt) AS amt
      |FROM graftspj.s.orders o JOIN graftspj.s.cust c ON o.nk = c.nk
      |GROUP BY o.nk ORDER BY nk""".stripMargin
    val plain = sql(q).collect()
    val (spjRows, plan) = withSpj {
      val df = sql(q)
      (df.collect(), df.queryExecution.executedPlan.toString)
    }
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange SinglePartition") &&
      !plan.contains("BroadcastHashJoin"), plan)
    assert(spjRows.toSeq === plain.toSeq)
  }

  test("GROUP BY the partition column aggregates without an exchange " +
      "(clustered distribution satisfied by the key grouping)") {
    tablesReady
    // a non-partition column in the aggregate keeps this off the
    // metadata-agg pushdown path — the scan itself must serve it
    val q = "SELECT nk, sum(amt) AS s FROM graftspj.s.orders " +
      "GROUP BY nk ORDER BY nk"
    val plain = sql(q).collect()
    val (rows, plan) = withSpj {
      val df = sql(q)
      (df.collect(), df.queryExecution.executedPlan.toString)
    }
    // one Exchange survives for the global ORDER BY (range); the
    // aggregate itself must not re-shuffle
    assert(!keyShufflesStr(plan), plan)
    assert(rows.toSeq === plain.toSeq)
  }

  private def keyShufflesStr(p: String): Boolean =
    p.contains("Exchange hashpartitioning") ||
      p.contains("Exchange SinglePartition")

  test("mismatched partition-value sets stay CORRECT (missing keys " +
      "handled by pushed partition values or a fallback shuffle)") {
    tablesReady
    sql("CREATE TABLE graftspj.s.sparse (ck BIGINT, nk INT) " +
      "PARTITIONED BY (nk)")
    sql("INSERT INTO graftspj.s.sparse VALUES (1, 0), (2, 2), (3, 9)")
    val q = """SELECT o.nk AS nk, count(*) AS n
      |FROM graftspj.s.orders o JOIN graftspj.s.sparse s ON o.nk = s.nk
      |GROUP BY o.nk ORDER BY nk""".stripMargin
    val plain = sql(q).collect()
    val spjRows = withSpj(sql(q).collect())
    assert(spjRows.toSeq === plain.toSeq)
  }

  test("the grouping is conf-gated: without the opt-in the scan plans " +
      "the ordinary packed/split shape and joins shuffle as before") {
    tablesReady
    val q = "SELECT o.ok, c.ck FROM graftspj.s.orders o " +
      "JOIN graftspj.s.cust c ON o.nk = c.nk"
    // same broadcast/AQE pinning, WITHOUT the SPJ opt-in confs: the
    // sort-merge join must shuffle both sides
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    val plan = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      sql(q).queryExecution.executedPlan.toString
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    assert(keyShufflesStr(plan), plan)
    assert(sql(q).count() === withSpj(sql(q).count()))
  }

  test("join keys a SUPERSET of the partition keys align without a " +
      "shuffle when exact co-partition match is waived (Spark's " +
      "requireAllClusterKeysForCoPartition=false)") {
    tablesReady
    val q = """SELECT a.ck, a.nk FROM graftspj.s.cust a
      |JOIN graftspj.s.cust b ON a.ck = b.ck AND a.nk = b.nk""".stripMargin
    val plain = sql(q).collect()
    val (rows, plan) = withSpj {
      val saved = spark.conf
        .getOption("spark.sql.requireAllClusterKeysForCoPartition")
      try {
        spark.conf.set(
          "spark.sql.requireAllClusterKeysForCoPartition", "false")
        val df = sql(q)
        (df.collect(), df.queryExecution.executedPlan.toString)
      } finally saved match {
        case Some(v) => spark.conf.set(
          "spark.sql.requireAllClusterKeysForCoPartition", v)
        case None => spark.conf.unset(
          "spark.sql.requireAllClusterKeysForCoPartition")
      }
    }
    assert(!keyShufflesStr(plan) && !plan.contains("BroadcastHashJoin"),
      plan)
    assert(rows.sortBy(r => (r.getLong(0), r.getInt(1))).toSeq ===
      plain.sortBy(r => (r.getLong(0), r.getInt(1))).toSeq)
  }

  test("filters compose: static pruning narrows the groups and the " +
      "join result stays exact") {
    tablesReady
    val q = """SELECT o.nk AS nk, count(*) AS n
      |FROM graftspj.s.orders o JOIN graftspj.s.cust c ON o.nk = c.nk
      |WHERE o.nk IN (1, 3) AND c.nk IN (1, 3)
      |GROUP BY o.nk ORDER BY nk""".stripMargin
    val plain = sql(q).collect()
    assert(withSpj(sql(q).collect()).toSeq === plain.toSeq)
  }

  test("SKEW: a partition holding far more data than the rest splits " +
      "into multiple byte-bounded keyed tasks under partially-" +
      "clustered distribution — still exchange-free, result exact") {
    sql("CREATE TABLE graftspj.s.skewf (id BIGINT, nk INT, v DOUBLE) " +
      "PARTITIONED BY (nk)")
    sql("CREATE TABLE graftspj.s.skewd (nk INT, tag STRING) " +
      "PARTITIONED BY (nk)")
    // nk=0 holds 100× the rows of nk∈{1,2}, across several files
    (0 until 3).foreach { _ =>
      (0 until 20000).map(i => (i.toLong, 0, i * 1.0))
        .toDF("id", "nk", "v").createOrReplaceTempView("spj_sk")
      sql("INSERT INTO graftspj.s.skewf SELECT * FROM spj_sk")
    }
    (0 until 200).map(i => (i.toLong, 1 + i % 2, i * 1.0))
      .toDF("id", "nk", "v").createOrReplaceTempView("spj_sk2")
    sql("INSERT INTO graftspj.s.skewf SELECT * FROM spj_sk2")
    Seq((0, "hot"), (1, "a"), (2, "b")).toDF("nk", "tag")
      .createOrReplaceTempView("spj_skd")
    sql("INSERT INTO graftspj.s.skewd SELECT * FROM spj_skd")
    val q = """SELECT f.nk AS nk, count(*) AS n, sum(f.v) AS sv
      |FROM graftspj.s.skewf f JOIN graftspj.s.skewd d ON f.nk = d.nk
      |GROUP BY f.nk ORDER BY nk""".stripMargin
    val plain = sql(q).collect().toSeq
    val savedPc = Seq("spark.sql.sources.v2.bucketing" +
      ".partiallyClusteredDistribution.enabled",
      "spark.sql.files.maxPartitionBytes")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing" +
        ".partiallyClusteredDistribution.enabled", "true")
      // tiny task budget: the hot group MUST split into several tasks
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      withSpj {
        val df = sql(q)
        // the JOIN subtree is exchange-free (partially-clustered
        // output legitimately reshuffles for the aggregate ABOVE —
        // that exchange carries 3 aggregated rows, not the fact table)
        val join = df.queryExecution.executedPlan.collectFirst {
          case j: org.apache.spark.sql.execution.joins
              .SortMergeJoinExec => j
        }.getOrElse(fail("expected a sort-merge join"))
        assert(join.collect {
          case e: org.apache.spark.sql.execution.exchange
              .ShuffleExchangeExec => e
        }.isEmpty,
          s"the skewed co-partitioned join must not shuffle:\n$join")
        // the fact side plans MORE keyed partitions than unique keys —
        // the skewed group is split, so the largest task is bounded
        val scans = df.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2
              .BatchScanExec => b
        }
        val factParts = scans.map(_.scan.toBatch.planInputPartitions())
          .filter(_.length > 3).head
        assert(factParts.length > 3,
          s"the hot partition must split: ${factParts.length} tasks " +
            "for 3 keys")
        assert(df.collect().toSeq === plain)
      }
    } finally savedPc.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("BUCKET-transform tables join exchange-free on the raw key " +
      "(hidden partitioning + FunctionCatalog alignment)") {
    sql("CREATE TABLE graftspj.s.bf (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    sql("CREATE TABLE graftspj.s.bd (k BIGINT, tag STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    (0 until 500).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .createOrReplaceTempView("spj_bf")
    (0 until 100).map(i => (i.toLong, s"t${i % 7}")).toDF("k", "tag")
      .createOrReplaceTempView("spj_bd")
    sql("INSERT INTO graftspj.s.bf SELECT * FROM spj_bf")
    sql("INSERT INTO graftspj.s.bf SELECT k + 1000, v FROM spj_bf")
    sql("INSERT INTO graftspj.s.bd SELECT * FROM spj_bd")
    // a HIGH-CARDINALITY key: identity partitioning is impossible
    // here — bucket(4, k) is what makes the co-partitioning bounded
    val q = """SELECT d.tag AS tag, count(*) AS n, sum(f.v) AS sv
      |FROM graftspj.s.bf f JOIN graftspj.s.bd d ON f.k = d.k
      |GROUP BY d.tag ORDER BY tag""".stripMargin
    val plain = sql(q).collect().toSeq
    val (spjRows, joinOk) = withSpj {
      val df = sql(q)
      val join = df.queryExecution.executedPlan.collectFirst {
        case j: org.apache.spark.sql.execution.joins
            .SortMergeJoinExec => j
      }.getOrElse(fail("expected a sort-merge join"))
      val noShuffle = join.collect {
        case e: org.apache.spark.sql.execution.exchange
            .ShuffleExchangeExec => e
      }.isEmpty
      assert(noShuffle,
        s"the bucketed join must not shuffle either side:\n$join")
      (df.collect().toSeq, noShuffle)
    }
    assert(joinOk && spjRows === plain)
  }

  test("bucket transforms of DIFFERENT key types never align") {
    sql("CREATE TABLE graftspj.s.ti (k INT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    sql("CREATE TABLE graftspj.s.tl (k BIGINT, tag STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    (0 until 50).map(i => (i, i * 1.0)).toDF("k", "v")
      .createOrReplaceTempView("spj_ti")
    (0 until 50).map(i => (i.toLong, "t")).toDF("k", "tag")
      .createOrReplaceTempView("spj_tl")
    sql("INSERT INTO graftspj.s.ti SELECT * FROM spj_ti")
    sql("INSERT INTO graftspj.s.tl SELECT * FROM spj_tl")
    // INT and BIGINT murmur3 different byte widths: the canonical
    // names differ, so Spark must NOT treat the partitionings as
    // compatible — correctness over cleverness (a false alignment
    // would join bucket 0 rows whose keys hash differently)
    val q = """SELECT count(*) AS n FROM graftspj.s.ti i
      |JOIN graftspj.s.tl l ON CAST(i.k AS BIGINT) = l.k""".stripMargin
    val plain = sql(q).collect().toSeq
    val spjRows = withSpj { sql(q).collect().toSeq }
    assert(spjRows === plain, "results must match regardless of plan")
  }
}
