package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's private[sql] Column↔Expression converters, needed
  * to expose custom Catalyst expressions (graft.functions.expressions)
  * as user-facing Columns. The pre-4.0 `new Column(expr)` constructor is
  * gone; this is the one sanctioned hop into the classic API.
  */
/** Public face of Spark's `private[sql]` update-as-append marker
  * (`SupportsStreamingUpdateAsAppend`, what Delta's write builder
  * declares): a streaming query in Update output mode writes its
  * changed rows as APPENDS — the engine accepts the mode instead of
  * rejecting it, and the sink's semantics are documented as
  * append-of-updates. */
trait GraftStreamingUpdateAsAppend
  extends org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend

/** Public face of Spark's `private[sql]` V1-streaming-fallback table
  * trait (`V2TableWithV1Fallback` — what Delta's table extends so
  * `readStream.table` / `writeStream.toTable` route through a V1
  * streaming source/sink): a DSv2 table extending this and providing
  * `v1Table` gets the analyzer's fallback resolution verbatim. */
trait GraftV1FallbackTable
  extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame — the resolved child a custom
    * logical operator (graft.plans) composes over. */
  def analyzed(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** DataFrame over a custom LogicalPlan (the pre-4.0 `Dataset.ofRows`). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** DataFrame over an InternalRow RDD with `isStreaming` set — the
    * contract a V1 streaming `Source.getBatch` must satisfy (the engine
    * asserts it); same hop `FileStreamSource` takes internally. */
  def internalCreateDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      isStreaming: Boolean): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming)

  /** Register a SQL function on a LIVE session's function registry —
    * extensions bind at session build; this is the post-hoc path. */
  def registerFunction(spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)

  def registerTableFunction(spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState
      .tableFunctionRegistry.registerFunction(id, info, builder)
}
