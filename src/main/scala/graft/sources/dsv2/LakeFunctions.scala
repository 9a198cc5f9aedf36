package graft.sources.dsv2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StringType, StructType, TimestampNTZType, TimestampType}

/** The partition-transform functions as catalog-resolvable V2
  * functions ([[org.apache.spark.sql.connector.catalog.functions]]) —
  * what Spark's storage-partitioned-join machinery and the write-side
  * clustered distribution resolve `bucket(8, k)` / `days(ts)` /
  * `truncate(4, s)` against (identity needs no function: it is the
  * column itself). The SAME evaluation as the writer's tuple
  * computation ([[LakePartitioning.Bound.eval]]) — one definition,
  * resolved per input type at bind time, so a Spark-side evaluation
  * (e.g. `spark.sql.sources.v2.bucketing.shuffle.enabled` shuffling
  * the un-partitioned side of a join by the partitioned side's
  * transform) can never disagree with the layout on disk.
  *
  * `canonicalName` encodes the SOURCE TYPE: `bucket` over INT and over
  * BIGINT hash differently (Murmur3 of 4 vs 8 bytes), so two scans
  * only count as co-partitioned when their source types match too.
  */
object LakeFunctions {

  val names: Seq[String] =
    Seq("bucket", "truncate", "days", "months", "years", "hours")

  private val dateOrTs: Seq[DataType] =
    Seq(DateType, TimestampType, TimestampNTZType)
  private val tsOnly: Seq[DataType] =
    Seq(TimestampType, TimestampNTZType)

  def load(name: String): Option[UnboundFunction] =
    name.toLowerCase match {
      case "bucket"   => Some(BucketUnbound)
      case "truncate" => Some(TruncateUnbound)
      case "days" =>
        Some(timeUnbound("days", LakePartitioning.PDays, dateOrTs))
      case "months" =>
        Some(timeUnbound("months", LakePartitioning.PMonths, dateOrTs))
      case "years" =>
        Some(timeUnbound("years", LakePartitioning.PYears, dateOrTs))
      case "hours" =>
        Some(timeUnbound("hours", LakePartitioning.PHours, tsOnly))
      case _ => None
    }

  /** A bound transform evaluator: `eval` is exactly the writer's. */
  private final class Evaluator(
      fnName: String, argTypes: Array[DataType], out: DataType,
      bound: LakePartitioning.Bound, valueAt: Int)
      extends ScalarFunction[Any] {
    override def inputTypes(): Array[DataType] = argTypes
    override def resultType(): DataType = out
    override def name(): String = fnName
    override def canonicalName(): String =
      s"graft.$fnName(${argTypes.map(_.simpleString).mkString(",")})"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): Any =
      if (input.isNullAt(valueAt)) null
      else bound.eval(input.get(valueAt, argTypes(valueAt)))
  }

  private def bindable(t: DataType, ok: Seq[DataType],
                       fn: String): Unit =
    require(ok.contains(t),
      s"graft.$fn does not admit source type ${t.simpleString}")

  /** `bucket(numBuckets, value)` — numBuckets must be a literal, which
    * Spark guarantees for transform arguments; at bind time only its
    * TYPE is visible, so the bound function reads it per row (it is
    * the same literal every row).
    */
  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): murmur3-based stable bucket id in [0, n)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 &&
          inputType.fields(0).dataType == IntegerType,
        s"graft.bucket expects (int numBuckets, value), got $inputType")
      val vt = inputType.fields(1).dataType
      bindable(vt, Seq(IntegerType, LongType, StringType, DateType,
        TimestampType, TimestampNTZType), "bucket")
      new ScalarFunction[Any] {
        override def inputTypes(): Array[DataType] =
          Array(IntegerType, vt)
        override def resultType(): DataType = IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String =
          s"graft.bucket(${vt.simpleString})"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): Any =
          if (input.isNullAt(1)) null
          else LakePartitioning
            .Bound(LakePartitioning.PBucket(input.getInt(0), "_"), 0, vt)
            .eval(input.get(1, vt))
      }
    }
  }

  /** `truncate(width, value)` over string/int/long. */
  private object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, col): width-w prefix (string) / floor multiple (int)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2 &&
          inputType.fields(0).dataType == IntegerType,
        s"graft.truncate expects (int width, value), got $inputType")
      val vt = inputType.fields(1).dataType
      bindable(vt, Seq(IntegerType, LongType, StringType), "truncate")
      new ScalarFunction[Any] {
        override def inputTypes(): Array[DataType] =
          Array(IntegerType, vt)
        override def resultType(): DataType = vt
        override def name(): String = "truncate"
        override def canonicalName(): String =
          s"graft.truncate(${vt.simpleString})"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): Any =
          if (input.isNullAt(1)) null
          else LakePartitioning
            .Bound(LakePartitioning.PTruncate(input.getInt(0), "_"), 0, vt)
            .eval(input.get(1, vt))
      }
    }
  }

  private def timeUnbound(
      fn: String, mk: String => LakePartitioning.PTransform,
      admits: Seq[DataType]): UnboundFunction =
    new UnboundFunction {
      override def name(): String = fn
      override def description(): String =
        s"$fn(col): ordinal since epoch"
      override def bind(inputType: StructType): BoundFunction = {
        require(inputType.length == 1,
          s"graft.$fn expects one temporal argument, got $inputType")
        val vt = inputType.fields(0).dataType
        bindable(vt, admits, fn)
        new Evaluator(fn, Array(vt), IntegerType,
          LakePartitioning.Bound(mk("_"), 0, vt), valueAt = 0)
      }
    }
}
