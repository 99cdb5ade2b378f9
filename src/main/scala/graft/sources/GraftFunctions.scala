package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Expression, Literal, Murmur3Hash, Pmod, TruncDate, TruncTimestamp}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, Reducer, ReducibleFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** The catalog's V2 partition-transform functions (`bucket`, `days`,
  * `months`, `years`, `hours`) — what lets Spark RESOLVE the transforms
  * a scan reports in its `KeyGroupedPartitioning`: the planner loads
  * the named function from the table's catalog (`FunctionCatalog`),
  * binds it, and compares both join sides' transforms by canonical
  * name — the storage-partitioned-join alignment step (the Iceberg
  * function-catalog architecture, SPARK-37375).
  *
  * Each bound function evaluates EXACTLY the engine's write-side
  * derivation (same catalyst expressions the hidden column is
  * materialized with), so anywhere Spark chooses to evaluate the
  * transform — partially-clustered planning, partition-value pushdown —
  * agrees byte-for-byte with the values the files actually carry.
  * Canonical names embed the input type: `bucket` over INT and BIGINT
  * hash differently (Murmur3 of 4 vs 8 bytes), so they must never
  * align as compatible partitionings.
  */
private[sources] object GraftFunctions {

  val names: Seq[String] =
    Seq("bucket", "truncate", "days", "months", "years", "hours")

  private val TruncateN = """truncate_(\d+)""".r

  def load(name: String): Option[UnboundFunction] =
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "bucket" => Some(BucketUnbound)
      case "truncate" => Some(TruncateUnbound)
      // the width-parameterized ONE-ARG family the SPJ clustering
      // reports (KeyGroupedPartitioning supports only single-argument
      // transforms): truncate_8(col) ≡ truncate(8, col)
      case TruncateN(n) => Some(new TruncateNUnbound(n.toInt))
      case "days" | "months" | "years" | "hours" =>
        Some(new TimeUnbound(name.toLowerCase(java.util.Locale.ROOT)))
      case _ => None
    }

  private def bucketable(dt: DataType): Boolean = dt match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType |
         _: StringType | _: DateType | _: TimestampType |
         _: DecimalType => true
    case _ => false
  }

  /** `bucket(n, col)`: pmod(murmur3(col), n) — identical to the write
    * derivation `pmod(hash(col), n)`. */
  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): stable hash-bucket partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket expects (numBuckets, col), got $inputType")
      val nType = inputType.fields(0).dataType
      require(nType == IntegerType,
        s"bucket count must be INT, got ${nType.sql}")
      val srcType = inputType.fields(1).dataType
      require(bucketable(srcType),
        s"type ${srcType.sql} is not bucketable")
      new BoundBucketFunction(
        s"graft.bucket(${srcType.catalogString})",
        Array(IntegerType, srcType),
        Pmod(new Murmur3Hash(Seq(BoundReference(1, srcType,
          nullable = true))), BoundReference(0, IntegerType,
          nullable = false)))
    }
  }

  /** The bound bucket function is REDUCIBLE (SPARK-44647): two sides
    * bucketed with different counts still storage-partition-join
    * exchange-free when one count divides the other — the finer side's
    * bucket values REDUCE onto the coarser grain (`v % coarse`, exact
    * because `pmod(h, fine) % coarse == pmod(h, coarse)` whenever
    * coarse | fine). Spark applies the reduction under
    * `spark.sql.sources.v2.bucketing.allowCompatibleTransforms
    * .enabled`; canonical-name equality still gates (INT vs BIGINT
    * sources hash differently and must never reduce onto each other).
    * This is what lets a bucket-count evolution migrate lazily while
    * joins against the old count keep their exchange-free plans. */
  private final class BoundBucketFunction(canonical: String,
      inputs: Array[DataType], expr: Expression)
      extends ScalarFunction[Any] with ReducibleFunction[Int, Int] {
    override def name(): String = "bucket"
    override def canonicalName(): String = canonical
    override def inputTypes(): Array[DataType] = inputs
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): Any = expr.eval(input)
    override def toString: String = canonical
    override def reducer(thisNumBuckets: Int,
        otherFn: ReducibleFunction[_, _],
        otherNumBuckets: Int): Reducer[Int, Int] = otherFn match {
      case b: BoundBucketFunction if b.canonicalName() == canonical &&
          otherNumBuckets > 0 && thisNumBuckets > otherNumBuckets &&
          thisNumBuckets % otherNumBuckets == 0 =>
        BucketReducer(otherNumBuckets)
      case _ => null // no reduction from THIS side; Spark asks the other
    }
  }

  /** The bucket reduction, as a named Serializable class: Spark ships
    * it inside StoragePartitionJoinParams to the executors. */
  private final case class BucketReducer(coarse: Int)
      extends Reducer[Int, Int] with Serializable {
    override def reduce(v: Int): Int = v % coarse
  }

  /** `truncate(n, col)`: Iceberg's order-preserving width reduction —
    * strings keep their first n chars, integrals floor to the nearest
    * multiple of n (`v - pmod(v, n)`). Identical to the write
    * derivation; result type = source type, embedded in the canonical
    * name so truncate over INT and BIGINT never falsely align. */
  private object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(n, col): order-preserving width-reduction transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate expects (width, col), got $inputType")
      val nType = inputType.fields(0).dataType
      require(nType == IntegerType,
        s"truncate width must be INT, got ${nType.sql}")
      val srcType = inputType.fields(1).dataType
      val src = BoundReference(1, srcType, nullable = true)
      val width = BoundReference(0, IntegerType, nullable = false)
      new BoundExprFunction("truncate",
        s"graft.truncate(${srcType.catalogString})",
        Array(IntegerType, srcType), srcType,
        truncateExpr(src, srcType, width))
    }
  }

  /** The derivation expression truncate binds, shared by both arities:
    * strings keep their first n chars, integrals floor to the nearest
    * multiple of n. Sources are INT/BIGINT/STRING only (Iceberg's
    * truncate domain) — in narrower integrals this source-typed
    * arithmetic wraps at the type bounds while the SQL write
    * derivation promotes to INT, so the function and the stored hidden
    * column would diverge near the type min/max;
    * Versioned.validatePartitionSpec rejects them at declaration and
    * this bind-time check backstops ad-hoc catalog calls. */
  private def truncateExpr(src: Expression, srcType: DataType,
      width: Expression): Expression = srcType match {
    case _: StringType =>
      org.apache.spark.sql.catalyst.expressions.Substring(src,
        Literal(1), width)
    case _: IntegerType | _: LongType =>
      org.apache.spark.sql.catalyst.expressions.Subtract(src,
        Pmod(src, Cast(width, srcType)))
    case other => throw new IllegalArgumentException(
      s"type ${other.sql} is not truncatable (needs STRING, INT, or " +
        "BIGINT)")
  }

  /** `truncate_<n>(col)` — the SPJ-reported one-arg form. Width AND
    * input type ride the canonical name: truncate_8 over INT never
    * aligns with truncate_8 over BIGINT or truncate_16 over INT. */
  private final class TruncateNUnbound(n: Int) extends UnboundFunction {
    override def name(): String = s"truncate_$n"
    override def description(): String =
      s"truncate_$n(col): width-$n order-preserving reduction"
    override def bind(inputType: StructType): BoundFunction = {
      require(n > 0, s"truncate width must be positive, got $n")
      require(inputType.fields.length == 1,
        s"truncate_$n expects one column, got $inputType")
      val srcType = inputType.fields(0).dataType
      val src = BoundReference(0, srcType, nullable = true)
      new BoundExprFunction(s"truncate_$n",
        s"graft.truncate($n, ${srcType.catalogString})",
        Array(srcType), srcType, truncateExpr(src, srcType, Literal(n)))
    }
  }

  /** `days/months/years(col)` → DATE grain; `hours(col)` → TIMESTAMP
    * grain. Time-zone semantics follow the session (captured at bind),
    * matching the write derivation's CAST/TRUNC. */
  private final class TimeUnbound(fn: String) extends UnboundFunction {
    override def name(): String = fn
    override def description(): String =
      s"$fn(col): time-grain partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"$fn expects one column, got $inputType")
      val srcType = inputType.fields(0).dataType
      require(srcType.isInstanceOf[DateType] ||
        srcType.isInstanceOf[TimestampType],
        s"$fn needs a DATE or TIMESTAMP source, got ${srcType.sql}")
      val tz = Some(SQLConf.get.sessionLocalTimeZone)
      val src = BoundReference(0, srcType, nullable = true)
      val asDate: Expression =
        if (srcType.isInstanceOf[DateType]) src
        else Cast(src, DateType, tz)
      val (expr, resType): (Expression, DataType) = fn match {
        case "days" => (asDate, DateType)
        case "months" => (TruncDate(asDate, Literal("MONTH")), DateType)
        case "years" => (TruncDate(asDate, Literal("YEAR")), DateType)
        case "hours" =>
          require(srcType.isInstanceOf[TimestampType],
            s"hours needs a TIMESTAMP source, got ${srcType.sql}")
          (TruncTimestamp(Literal("HOUR"), src, tz), TimestampType)
        case other => throw new IllegalStateException(
          s"unknown time transform $other")
      }
      new BoundExprFunction(fn, s"graft.$fn(${srcType.catalogString})",
        Array(srcType), resType, expr)
    }
  }

  private final class BoundExprFunction(fnName: String, canonical: String,
      inputs: Array[DataType], result: DataType, expr: Expression)
      extends ScalarFunction[Any] {
    override def name(): String = fnName
    override def canonicalName(): String = canonical
    override def inputTypes(): Array[DataType] = inputs
    override def resultType(): DataType = result
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): Any = expr.eval(input)
    override def toString: String = canonical
  }
}
