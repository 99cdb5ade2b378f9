package graft.queries

import graft.Tables

/** SQL front door: queries expressed as ANSI SQL text and executed by
  * `spark.sql` over registered temp views — the same statement IS the
  * DuckDB oracle (one dialect-neutral text, two engines). Exercises the
  * parser/analyzer path a reference user would hit through dbt models,
  * plus planner features the DataFrame surface doesn't: multi-join
  * reorder under a LIMIT, and correlated scalar subqueries (decorrelated
  * by Catalyst into an aggregate + join — no per-row re-execution).
  */
object SqlQueries {

  /** TPC-H Q3-analog: shipping-priority top-10 — 3-way join, grouped
    * revenue, ordered LIMIT (plans as TakeOrderedAndProject over a
    * partial+final hash agg; the dimension side broadcasts). */
  private val Q27_SQL =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,2)))
      |       AS DOUBLE) AS revenue,
      |  CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '2000-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '2000-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, order_date, l_orderkey
      |LIMIT 10""".stripMargin

  /** Correlated scalar subquery: orders above their customer nation's
    * average order value (exact decimal average, so the threshold is
    * bit-identical across engines). */
  private val Q28_SQL =
    """SELECT n_name, COUNT(*) AS n_above
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE o.o_totalprice > (
      |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |         / COUNT(*)
      |  FROM orders o2 JOIN customer c2 ON o2.o_custkey = c2.c_custkey
      |  WHERE c2.c_nationkey = c.c_nationkey)
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Correlated LATERAL subquery with ORDER BY + LIMIT: top-1 lineitem
    * per order (the per-row "top-N lookup" idiom). Catalyst plans the
    * correlated limited subquery as a LateralJoin — exercising a
    * decorrelation path neither q28's scalar subquery nor the window
    * form touches. */
  private val Q39_SQL =
    """SELECT o_orderkey, top_part, top_qty
      |FROM orders o,
      |LATERAL (
      |  SELECT l_partkey AS top_part, CAST(l_quantity AS BIGINT) AS top_qty
      |  FROM lineitem
      |  WHERE l_orderkey = o.o_orderkey
      |  ORDER BY l_quantity DESC, l_partkey
      |  LIMIT 1) t
      |WHERE o_orderkey <= 100
      |ORDER BY o_orderkey""".stripMargin

  val q27SqlTopRevenue: Q = Q("q27_sql_top_revenue", Q27_SQL) { (s, d) =>
    Tables.registerAll(s, d)
    s.sql(Q27_SQL)
  }

  val q28SqlCorrelated: Q = Q("q28_sql_correlated", Q28_SQL) { (s, d) =>
    Tables.registerAll(s, d)
    s.sql(Q28_SQL)
  }

  val q39SqlLateral: Q = Q("q39_sql_lateral", Q39_SQL) { (s, d) =>
    Tables.registerAll(s, d)
    s.sql(Q39_SQL)
  }

  /** q41: the custom `topk_pairs` aggregate through the SQL front door —
    * the statement a user writes once the extension is installed. The
    * oracle is the semantically-equal ROW_NUMBER form (DuckDB has no
    * topk_pairs), so the custom aggregate's SQL path is hash-gated
    * end-to-end, not just spec-compared. */
  private val Q41_SPARK_SQL =
    """SELECT event_type, p.id AS event_id, p.score AS value,
      |  CAST(pos + 1 AS INT) AS rank
      |FROM (SELECT event_type, topk_pairs(value, event_id, 3) AS tk
      |      FROM events GROUP BY event_type)
      |LATERAL VIEW posexplode(tk) AS pos, p
      |ORDER BY event_type, rank""".stripMargin

  private val Q41_ORACLE_SQL =
    """SELECT event_type, event_id, value, rank FROM (
      |  SELECT event_type, event_id, value,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY value DESC, event_id) AS INT) AS rank
      |  FROM events)
      |WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin

  val q41SqlTopk: Q = Q("q41_sql_topk", Q41_ORACLE_SQL) { (s, d) =>
    graft.GraftExtensions.registerFunctions(s)
    Tables.registerAll(s, d)
    s.sql(Q41_SPARK_SQL)
  }

  val all: Seq[Q] = Seq(q27SqlTopRevenue, q28SqlCorrelated, q39SqlLateral,
    q41SqlTopk)
}
