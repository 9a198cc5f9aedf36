package graft.sources.dsv2

import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Type, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Schema + row codec between Spark's `StructType`/`InternalRow` and the
  * parquet-hadoop example `Group` model, for the file-backed DSv2 lake
  * connector ([[LakeTable]]). Scope is the lake's physical type family
  * (the same set `Tables.assertLakeSchemas` accepts): INT64, INT32,
  * DOUBLE, UTF8 binary, TIMESTAMP(MICROS, adjusted-to-UTC) and DATE —
  * an unsupported column fails loud at schema-conversion time, never
  * silently at row time.
  *
  * Why hand-rolled rather than Spark's own parquet support: the point of
  * the connector is to exercise the CONNECTOR contracts (column pruning,
  * filter-driven split narrowing, copy-on-write row-level operations)
  * against real row groups — parquet-hadoop is the public layer those
  * contracts push into, exactly as an external-store connector would.
  */
object LakeParquet {

  /** Field-id metadata key on StructField — the SAME key Spark's own
    * parquet support uses (`spark.sql.parquet.fieldId.*`), so schemas
    * round-trip between this connector and stock Spark tooling. A
    * field id is the column's IDENTITY across renames: writers stamp
    * it into the parquet footer, readers resolve projections by id
    * when the file carries ids (strictly — never falling back to a
    * name match that could resurrect a dropped-and-re-added name's old
    * values), and only id-less legacy files resolve by name.
    */
  val FieldIdKey = "parquet.field.id"

  /** Prior-names metadata key: every name this column previously had
    * (most recent first). Legacy files written BEFORE field ids exist
    * can only resolve by name — after a rename, their column still
    * carries the old name, so the reader walks current-then-prior
    * names for them. Kept unique across the schema (enforced at ALTER
    * time) so a prior name can never match two columns.
    */
  val PriorNamesKey = "graft.prior.names"

  def fieldId(f: StructField): Option[Int] =
    if (f.metadata.contains(FieldIdKey))
      Some(f.metadata.getLong(FieldIdKey).toInt)
    else None

  def priorNames(f: StructField): Seq[String] =
    if (f.metadata.contains(PriorNamesKey))
      f.metadata.getStringArray(PriorNamesKey).toSeq
    else Seq.empty

  /** Spark → parquet message type (all fields optional, lake naming;
    * field ids from metadata stamped into the footer when present).
    */
  def toMessageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      def named(tb: Types.PrimitiveBuilder[
          org.apache.parquet.schema.PrimitiveType]): Type =
        fieldId(f).fold[Type](tb.named(f.name))(id =>
          tb.id(id).named(f.name))
      val t: Type = f.dataType match {
        case LongType =>
          named(Types.optional(PrimitiveTypeName.INT64))
        case IntegerType =>
          named(Types.optional(PrimitiveTypeName.INT32))
        case DoubleType =>
          named(Types.optional(PrimitiveTypeName.DOUBLE))
        case FloatType =>
          named(Types.optional(PrimitiveTypeName.FLOAT))
        case StringType =>
          named(Types.optional(PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType()))
        case TimestampType =>
          named(Types.optional(PrimitiveTypeName.INT64)
            .as(LogicalTypeAnnotation.timestampType(true,
              LogicalTypeAnnotation.TimeUnit.MICROS)))
        case TimestampNTZType =>
          named(Types.optional(PrimitiveTypeName.INT64)
            .as(LogicalTypeAnnotation.timestampType(false,
              LogicalTypeAnnotation.TimeUnit.MICROS)))
        case DateType =>
          named(Types.optional(PrimitiveTypeName.INT32)
            .as(LogicalTypeAnnotation.dateType()))
        case d: org.apache.spark.sql.types.DecimalType
            if d.precision <= 18 =>
          // money columns: INT64 unscaled (the standard parquet
          // encoding up to precision 18 — covers every realistic
          // currency scale; wider decimals would need FIXED_LEN_BYTE_
          // ARRAY and are rejected loud below)
          named(Types.optional(PrimitiveTypeName.INT64)
            .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision)))
        case other => throw new UnsupportedOperationException(
          s"lake connector: unsupported column type $other (${f.name})")
      }
      b.addField(t)
    }
    b.named("graft_lake")
  }

  /** Parquet message type → Spark schema (inverse of [[toMessageType]]).
    * Fails loud on any physical type outside the lake family.
    */
  def toStructType(message: MessageType): StructType = {
    val fields = message.getFields.toArray(Array.empty[Type]).map { t =>
      require(t.isPrimitive, s"lake connector: nested field ${t.getName}")
      val p = t.asPrimitiveType()
      val dt = (p.getPrimitiveTypeName, p.getLogicalTypeAnnotation) match {
        case (PrimitiveTypeName.INT64, ts: TimestampLogicalTypeAnnotation) =>
          require(ts.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS,
            s"lake connector: non-micros timestamp ${t.getName}")
          if (ts.isAdjustedToUTC) TimestampType else TimestampNTZType
        case (PrimitiveTypeName.INT64,
              dec: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
          org.apache.spark.sql.types.DecimalType(
            dec.getPrecision, dec.getScale)
        case (PrimitiveTypeName.INT64, _)  => LongType
        case (PrimitiveTypeName.INT32, _: DateLogicalTypeAnnotation) =>
          DateType
        case (PrimitiveTypeName.INT32, _)  => IntegerType
        case (PrimitiveTypeName.DOUBLE, _) => DoubleType
        case (PrimitiveTypeName.FLOAT, _)  => FloatType
        case (PrimitiveTypeName.BINARY, _: StringLogicalTypeAnnotation) =>
          StringType
        case (pt, ann) => throw new UnsupportedOperationException(
          s"lake connector: unsupported parquet type $pt/$ann (${t.getName})")
      }
      StructField(t.getName, dt, nullable = true)
    }
    StructType(fields)
  }

  /** Per-field decoder Group → Catalyst value, resolved once per schema
    * (the row path does no type dispatch). `i` is the field's index in
    * the PROJECTED schema.
    */
  def decoders(projected: StructType): Array[(Group, Int) => Any] =
    projected.fields.map { f =>
      f.dataType match {
        case LongType | TimestampType | TimestampNTZType =>
          (g: Group, i: Int) => g.getLong(i, 0)
        case IntegerType | DateType =>
          (g: Group, i: Int) => g.getInteger(i, 0)
        case DoubleType =>
          (g: Group, i: Int) => g.getDouble(i, 0)
        case FloatType =>
          (g: Group, i: Int) => g.getFloat(i, 0)
        case StringType =>
          (g: Group, i: Int) => UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
        case d: org.apache.spark.sql.types.DecimalType =>
          (g: Group, i: Int) => org.apache.spark.sql.types.Decimal(
            g.getLong(i, 0), d.precision, d.scale)
        case other => throw new UnsupportedOperationException(other.toString)
      }
    }

  /** Per-field decoder over parquet's COLUMN readers (the flat fast
    * path: page-level value reads, no Group materialization or record
    * assembly). Same type dispatch as [[decoders]].
    */
  def columnDecoders(projected: StructType)
      : Array[org.apache.parquet.column.ColumnReader => Any] =
    projected.fields.map { f =>
      f.dataType match {
        case LongType | TimestampType | TimestampNTZType =>
          (cr: org.apache.parquet.column.ColumnReader) => cr.getLong
        case IntegerType | DateType =>
          (cr: org.apache.parquet.column.ColumnReader) => cr.getInteger
        case DoubleType =>
          (cr: org.apache.parquet.column.ColumnReader) => cr.getDouble
        case FloatType =>
          (cr: org.apache.parquet.column.ColumnReader) => cr.getFloat
        case StringType =>
          (cr: org.apache.parquet.column.ColumnReader) =>
            UTF8String.fromBytes(cr.getBinary.getBytes)
        case d: org.apache.spark.sql.types.DecimalType =>
          (cr: org.apache.parquet.column.ColumnReader) =>
            org.apache.spark.sql.types.Decimal(cr.getLong,
              d.precision, d.scale)
        case other => throw new UnsupportedOperationException(other.toString)
      }
    }

  def toInternalRow(g: Group, dec: Array[(Group, Int) => Any]): InternalRow = {
    val values = new Array[Any](dec.length)
    var i = 0
    while (i < dec.length) {
      values(i) = if (g.getFieldRepetitionCount(i) == 0) null else dec(i)(g, i)
      i += 1
    }
    new GenericInternalRow(values)
  }

  /** Per-field encoder (row, rowOrdinal, groupField) → append. The row
    * ordinal is passed separately from the group field index so callers
    * can read at an offset (the ReplaceData op-column layout below).
    */
  def encoders(schema: StructType): Array[(InternalRow, Int, Group, Int) => Unit] =
    schema.fields.map { f =>
      f.dataType match {
        case LongType | TimestampType | TimestampNTZType =>
          (r: InternalRow, ri: Int, g: Group, gi: Int) => g.add(gi, r.getLong(ri))
        case IntegerType | DateType =>
          (r: InternalRow, ri: Int, g: Group, gi: Int) => g.add(gi, r.getInt(ri))
        case DoubleType =>
          (r: InternalRow, ri: Int, g: Group, gi: Int) => g.add(gi, r.getDouble(ri))
        case FloatType =>
          (r: InternalRow, ri: Int, g: Group, gi: Int) => g.add(gi, r.getFloat(ri))
        case StringType =>
          (r: InternalRow, ri: Int, g: Group, gi: Int) =>
            g.add(gi, Binary.fromConstantByteArray(r.getUTF8String(ri).getBytes))
        case d: org.apache.spark.sql.types.DecimalType =>
          (r: InternalRow, ri: Int, g: Group, gi: Int) =>
            g.add(gi, r.getDecimal(ri, d.precision, d.scale).toUnscaledLong)
        case other => throw new UnsupportedOperationException(other.toString)
      }
    }

  /** Encode `row` fields [off, off + width) into a Group. */
  def toGroup(row: InternalRow, schema: MessageType,
              enc: Array[(InternalRow, Int, Group, Int) => Unit],
              off: Int): Group = {
    val g = new SimpleGroup(schema)
    var i = 0
    while (i < enc.length) {
      if (!row.isNullAt(i + off)) enc(i)(row, i + off, g, i)
      i += 1
    }
    g
  }
}
