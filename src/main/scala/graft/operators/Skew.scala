package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SCALE.md "salting for skew").
  *
  * When one join key carries a disproportionate share of the fact side
  * (the classic 100 TB killer: one hot user/partition), AQE's skew-join
  * split handles sort-merge cases, but explicit salting is the portable
  * fix: fact rows get a random-but-deterministic salt in [0, n); the
  * dimension side is replicated n× with every salt value; the join key
  * becomes (key, salt) so the hot key spreads over n reducers.
  *
  * Results are identical to the unsalted join — verified by spec.
  */
object Skew {

  /** Deterministic per-row salt derived from stable columns (NOT rand():
    * re-execution of a task must produce the same salt or shuffles
    * retried under failure produce duplicates). */
  def salt(n: Int, stableCols: Column*): Column =
    pmod(xxhash64(stableCols: _*), lit(n.toLong))

  /** Salted inner equi-join: `facts` (large, possibly skewed) joins
    * `dim` (small enough to replicate saltFactor×). */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int, factStableCols: Seq[String]): DataFrame = {
    val salted = facts.withColumn("_salt",
      salt(saltFactor, factStableCols.map(col): _*))
    val replicated = dim.withColumn("_salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
