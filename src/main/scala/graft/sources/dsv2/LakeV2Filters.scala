package graft.sources.dsv2

import org.apache.spark.sql.connector.expressions.{Expression => VExpr, Literal => VLiteral, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{AlwaysFalse, AlwaysTrue, And => VAnd, Not => VNot, Or => VOr, Predicate => VPredicate}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** V2 → V1 filter translation for [[LakeScanBuilder.pushPredicates]]:
  * the builder's entire pruning/consumption/proof stack is keyed off
  * V1 [[Filter]]s, and Spark dispatches ONLY the V2 predicate API once
  * a builder implements it — so every V2 predicate that structurally
  * IS a V1 filter converts here and rides the existing machinery
  * unchanged. Anything unconvertible returns None (the predicate stays
  * residual — conservative, never wrong). Spark ships the same
  * conversion as `PredicateUtils.toV1`, but that object is
  * `private[sql]`; this is the public-API re-derivation, restricted to
  * the shapes the V1 path could receive (same names Spark's own
  * V2ExpressionBuilder emits).
  *
  * Literal values arrive in Catalyst INTERNAL form (UTF8String, epoch
  * days/micros, Decimal) and V1 filters carry EXTERNAL values — the
  * java8 datetime externals ([[java.time.LocalDate]]/[[java.time.Instant]]),
  * which every downstream consumer ([[LakePartitioning.liftLiteral]],
  * [[LakeStats.cmp]]) already accepts alongside the legacy classes.
  */
object LakeV2Filters {

  private def column(e: VExpr): Option[String] = e match {
    case fr: NamedReference => Some(fr.fieldNames.mkString("."))
    case _                  => None
  }

  /** Internal → external literal; None for types no V1 consumer here
    * compares (interval, struct, …) — unconvertible keeps residual.
    */
  private def externalize(v: Any, dt: DataType): Option[Any] =
    if (v == null) Some(null)
    else dt match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | BinaryType => Some(v)
      case StringType => Some(v.toString)
      case DateType => v match {
        case d: Int => Some(java.time.LocalDate.ofEpochDay(d.toLong))
        case _      => None
      }
      case TimestampType => v match {
        case micros: Long => Some(java.time.Instant.EPOCH.plusNanos(0)
          .plusSeconds(Math.floorDiv(micros, 1000000L))
          .plusNanos(Math.floorMod(micros, 1000000L) * 1000L))
        case _ => None
      }
      case TimestampNTZType => v match {
        case micros: Long => Some(java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC))
        case _ => None
      }
      case _: DecimalType => v match {
        case d: org.apache.spark.sql.types.Decimal =>
          Some(d.toJavaBigDecimal)
        case _ => None
      }
      case _ => None
    }

  private def literal(e: VExpr): Option[Any] = e match {
    case l: VLiteral[_] => externalize(l.value, l.dataType)
    case _                  => None
  }

  /** (column, external literal) of a binary comparison, in column-first
    * orientation; `flip` reports whether the operands were reversed
    * (literal op column), so the caller mirrors the comparison.
    */
  private def colLit(children: Array[VExpr])
      : Option[(String, Any, Boolean)] = children match {
    case Array(c, l) =>
      column(c).flatMap(cn => literal(l).map((cn, _, false)))
        .orElse(column(l).flatMap(cn => literal(c).map((cn, _, true))))
    case _ => None
  }

  def toV1(p: VPredicate): Option[Filter] = p match {
    case _: AlwaysTrue  => Some(org.apache.spark.sql.sources.AlwaysTrue)
    case _: AlwaysFalse => Some(org.apache.spark.sql.sources.AlwaysFalse)
    case a: VAnd =>
      for (l <- toV1(a.left()); r <- toV1(a.right())) yield And(l, r)
    case o: VOr =>
      for (l <- toV1(o.left()); r <- toV1(o.right())) yield Or(l, r)
    case n: VNot => toV1(n.child()).map(Not)
    case _ => p.name() match {
      case "IS_NULL" => p.children() match {
        case Array(c) => column(c).map(IsNull)
        case _        => None
      }
      case "IS_NOT_NULL" => p.children() match {
        case Array(c) => column(c).map(IsNotNull)
        case _        => None
      }
      case "=" => colLit(p.children()).map { case (c, v, _) =>
        EqualTo(c, v) }
      case "<=>" => colLit(p.children()).map { case (c, v, _) =>
        EqualNullSafe(c, v) }
      case "<>" => colLit(p.children()).map { case (c, v, _) =>
        Not(EqualTo(c, v)) }
      case "<" => colLit(p.children()).map { case (c, v, flip) =>
        if (flip) GreaterThan(c, v) else LessThan(c, v) }
      case "<=" => colLit(p.children()).map { case (c, v, flip) =>
        if (flip) GreaterThanOrEqual(c, v) else LessThanOrEqual(c, v) }
      case ">" => colLit(p.children()).map { case (c, v, flip) =>
        if (flip) LessThan(c, v) else GreaterThan(c, v) }
      case ">=" => colLit(p.children()).map { case (c, v, flip) =>
        if (flip) LessThanOrEqual(c, v) else GreaterThanOrEqual(c, v) }
      case "IN" => p.children() match {
        case arr if arr.length >= 2 =>
          column(arr(0)).flatMap { c =>
            val vs = arr.tail.map(literal)
            if (vs.forall(_.isDefined)) Some(In(c, vs.map(_.get)))
            else None
          }
        case _ => None
      }
      case "STARTS_WITH" => strPair(p).map { case (c, s) =>
        StringStartsWith(c, s) }
      case "ENDS_WITH" => strPair(p).map { case (c, s) =>
        StringEndsWith(c, s) }
      case "CONTAINS" => strPair(p).map { case (c, s) =>
        StringContains(c, s) }
      case _ => None
    }
  }

  private def strPair(p: VPredicate): Option[(String, String)] =
    p.children() match {
      case Array(c, l: VLiteral[_])
          if l.dataType == StringType && l.value != null =>
        column(c).map((_, l.value.toString))
      case _ => None
    }
}
