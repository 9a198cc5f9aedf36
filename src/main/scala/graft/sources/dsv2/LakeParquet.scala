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

  /** Spark → parquet message type (top-level fields optional, lake
    * naming; field ids from metadata stamped into the footer when
    * present). Nested types use the standard parquet layouts: STRUCT →
    * group, ARRAY → 3-level LIST (`group (LIST) { repeated group list
    * { element } }`), MAP → `group (MAP) { repeated group key_value {
    * required key; value } }` — the shapes every parquet reader
    * (Spark's own, DuckDB, Iceberg) round-trips.
    */
  def toMessageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach(f =>
      b.addField(toParquetField(f.name, f.dataType,
        required = false, fieldId(f))))
    b.named("graft_lake")
  }

  private def toParquetField(name: String, dt: DataType,
                             required: Boolean, id: Option[Int]): Type = {
    def prim(t: PrimitiveTypeName) =
      if (required) Types.required(t) else Types.optional(t)
    def named(tb: Types.PrimitiveBuilder[
        org.apache.parquet.schema.PrimitiveType]): Type =
      id.fold[Type](tb.named(name))(i => tb.id(i).named(name))
    def namedG(gb: Types.GroupBuilder[
        org.apache.parquet.schema.GroupType]): Type =
      id.fold[Type](gb.named(name))(i => gb.id(i).named(name))
    dt match {
      case st: StructType =>
        val gb = if (required) Types.requiredGroup() else Types.optionalGroup()
        st.fields.foreach(cf => gb.addField(toParquetField(cf.name,
          cf.dataType, required = !cf.nullable, fieldId(cf))))
        namedG(gb)
      case ArrayType(et, containsNull) =>
        val gb = (if (required) Types.requiredGroup()
          else Types.optionalGroup())
          .as(LogicalTypeAnnotation.listType())
          .addField(Types.repeatedGroup()
            .addField(toParquetField("element", et,
              required = !containsNull, None))
            .named("list"))
        namedG(gb)
      case MapType(kt, vt, valueContainsNull) =>
        val gb = (if (required) Types.requiredGroup()
          else Types.optionalGroup())
          .as(LogicalTypeAnnotation.mapType())
          .addField(Types.repeatedGroup()
            .addField(toParquetField("key", kt, required = true, None))
            .addField(toParquetField("value", vt,
              required = !valueContainsNull, None))
            .named("key_value"))
        namedG(gb)
      case LongType => named((prim(PrimitiveTypeName.INT64)))
      case IntegerType => named((prim(PrimitiveTypeName.INT32)))
      case DoubleType => named((prim(PrimitiveTypeName.DOUBLE)))
      case FloatType => named((prim(PrimitiveTypeName.FLOAT)))
      case BooleanType => named((prim(PrimitiveTypeName.BOOLEAN)))
      case StringType =>
        named(prim(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType()))
      case BinaryType =>
        // opaque media/payload bytes: plain BINARY, no logical
        // annotation (stats harvest records null counts only — a
        // byte-order "bound" over image payloads prunes nothing and
        // bloats manifests)
        named(prim(PrimitiveTypeName.BINARY))
      case TimestampType =>
        named(prim(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS)))
      case TimestampNTZType =>
        named(prim(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(false,
            LogicalTypeAnnotation.TimeUnit.MICROS)))
      case DateType =>
        named(prim(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType()))
      case d: org.apache.spark.sql.types.DecimalType
          if d.precision <= 18 =>
        // money columns: INT64 unscaled (the standard parquet encoding
        // up to precision 18 — covers every realistic currency scale)
        named(prim(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision)))
      case d: org.apache.spark.sql.types.DecimalType =>
        // warehouse-wide decimals (p ≤ 38): FIXED_LEN_BYTE_ARRAY of
        // the minimal length that holds any signed p-digit unscaled
        // value, big-endian two's complement — the standard parquet
        // encoding above INT64 range
        named(prim(PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY)
          .length(decimalFixedLen(d.precision))
          .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision)))
      case other => throw new UnsupportedOperationException(
        s"lake connector: unsupported column type $other ($name)")
    }
  }

  /** Minimal FIXED_LEN_BYTE_ARRAY length holding any signed unscaled
    * value of `precision` digits (two's complement): smallest n with
    * bitLength(10^p − 1) + sign bit ≤ 8n. p=18 → 8, p=38 → 16.
    */
  def decimalFixedLen(precision: Int): Int = {
    val maxUnscaled = java.math.BigInteger.TEN.pow(precision)
      .subtract(java.math.BigInteger.ONE)
    (maxUnscaled.bitLength() + 1 + 7) / 8
  }

  /** True when every column is a flat primitive — the precondition of
    * the page-level columnar fast path ([[columnDecoders]]); nested
    * schemas read through record assembly, which is what re-aligns
    * repeated/group structure across pages.
    */
  def isFlat(schema: StructType): Boolean =
    schema.fields.forall(f => f.dataType match {
      case _: StructType | _: ArrayType | _: MapType => false
      case _ => true
    })

  /** Structural type equality IGNORING nullability (containsNull /
    * valueContainsNull / nested field nullable): a writer that proved
    * its values non-null wrote required leaves, and reading them as
    * the table's nullable type is always safe. Names, order, and
    * decimal precision/scale still compare strictly.
    */
  def sameTypeIgnoreNullability(a: DataType, b: DataType): Boolean =
    (a, b) match {
      case (x: StructType, y: StructType) =>
        x.length == y.length && x.fields.zip(y.fields).forall {
          case (f, g) => f.name == g.name &&
            sameTypeIgnoreNullability(f.dataType, g.dataType) }
      case (ArrayType(x, _), ArrayType(y, _)) =>
        sameTypeIgnoreNullability(x, y)
      case (MapType(xk, xv, _), MapType(yk, yv, _)) =>
        sameTypeIgnoreNullability(xk, yk) &&
          sameTypeIgnoreNullability(xv, yv)
      case _ => a == b
    }

  /** Parquet message type → Spark schema (inverse of [[toMessageType]]).
    * Fails loud on any physical type outside the lake family.
    */
  def toStructType(message: MessageType): StructType =
    StructType(message.getFields.toArray(Array.empty[Type]).map(t =>
      StructField(t.getName, toDataType(t),
        nullable = t.getRepetition != Type.Repetition.REQUIRED)))

  private def toDataType(t: Type): DataType =
    if (t.isPrimitive) {
      val p = t.asPrimitiveType()
      (p.getPrimitiveTypeName, p.getLogicalTypeAnnotation) match {
        case (PrimitiveTypeName.INT64, ts: TimestampLogicalTypeAnnotation) =>
          require(ts.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS,
            s"lake connector: non-micros timestamp ${t.getName}")
          if (ts.isAdjustedToUTC) TimestampType else TimestampNTZType
        case (PrimitiveTypeName.INT64,
              dec: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
          org.apache.spark.sql.types.DecimalType(
            dec.getPrecision, dec.getScale)
        case (PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY,
              dec: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
          org.apache.spark.sql.types.DecimalType(
            dec.getPrecision, dec.getScale)
        case (PrimitiveTypeName.INT64, _)  => LongType
        case (PrimitiveTypeName.INT32, _: DateLogicalTypeAnnotation) =>
          DateType
        // a foreign INT32-backed decimal must NOT surface as a raw int
        // (the unscaled value would silently read as the number) —
        // reject loud until an int32-decimal decode path exists
        case (PrimitiveTypeName.INT32,
              dec: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
          throw new UnsupportedOperationException(
            s"lake connector: INT32-backed decimal ${t.getName} " +
              s"($dec) unsupported")
        case (PrimitiveTypeName.INT32, _)  => IntegerType
        case (PrimitiveTypeName.DOUBLE, _) => DoubleType
        case (PrimitiveTypeName.FLOAT, _)  => FloatType
        case (PrimitiveTypeName.BOOLEAN, _) => BooleanType
        case (PrimitiveTypeName.BINARY, _: StringLogicalTypeAnnotation) =>
          StringType
        case (PrimitiveTypeName.BINARY, null) => BinaryType
        case (pt, ann) => throw new UnsupportedOperationException(
          s"lake connector: unsupported parquet type $pt/$ann (${t.getName})")
      }
    } else {
      val g = t.asGroupType()
      g.getLogicalTypeAnnotation match {
        case _: LogicalTypeAnnotation.ListLogicalTypeAnnotation =>
          val repeated = g.getType(0).asGroupType() // "list"
          val elem = repeated.getType(0)
          ArrayType(toDataType(elem),
            containsNull = elem.getRepetition != Type.Repetition.REQUIRED)
        case _: LogicalTypeAnnotation.MapLogicalTypeAnnotation =>
          val kv = g.getType(0).asGroupType() // "key_value"
          val v = kv.getType(1)
          MapType(toDataType(kv.getType(0)), toDataType(v),
            valueContainsNull = v.getRepetition != Type.Repetition.REQUIRED)
        case _ =>
          // a REPEATED group with no LIST/MAP annotation is the legacy
          // 2-level list layout (pre-modern foreign writers) — reading
          // it as a struct would silently surface only element 0, so
          // reject loud (the pre-nested codec rejected ALL groups)
          require(t.getRepetition != Type.Repetition.REPEATED,
            s"lake connector: legacy 2-level repeated group " +
              s"${t.getName} (unannotated list) unsupported")
          StructType(g.getFields.toArray(Array.empty[Type]).map(ft =>
            StructField(ft.getName, toDataType(ft),
              nullable = ft.getRepetition != Type.Repetition.REQUIRED)))
      }
    }

  /** Per-field decoder Group → Catalyst value, resolved once per schema
    * (the row path does no type dispatch). `i` is the field's index in
    * the PROJECTED schema. Nested types recurse: a struct field decodes
    * its sub-group to a GenericInternalRow, a list its repeated "list"
    * instances to GenericArrayData, a map its "key_value" instances to
    * ArrayBasedMapData.
    */
  def decoders(projected: StructType): Array[(Group, Int) => Any] =
    projected.fields.map(f => valueDecoder(f.dataType))

  /** [[decoders]] with the FILE's message type: top-level DECIMAL
    * columns dispatch on the file's PHYSICAL type (a foreign
    * FLBA-backed small-precision decimal decodes as bytes, never
    * misread as INT64 by our own precision convention). Nested
    * decimals keep the convention — they only occur in
    * connector-written files.
    */
  def decoders(projected: StructType, message: MessageType)
      : Array[(Group, Int) => Any] =
    projected.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case d: org.apache.spark.sql.types.DecimalType =>
          decimalPhysical(message, i) match {
            case PrimitiveTypeName.INT64 =>
              (g: Group, j: Int) => org.apache.spark.sql.types.Decimal(
                g.getLong(j, 0), d.precision, d.scale)
            case _ => // FLBA (and BINARY-backed foreign decimals)
              (g: Group, j: Int) => decimalFromBytes(
                g.getBinary(j, 0).getBytes, d.precision, d.scale)
          }
        case _ => valueDecoder(f.dataType)
      }
    }

  /** The physical type carrying a top-level decimal column, validated
    * to one of the decodable encodings.
    */
  private def decimalPhysical(message: MessageType,
                              i: Int): PrimitiveTypeName = {
    val pt = message.getType(i).asPrimitiveType().getPrimitiveTypeName
    pt match {
      case PrimitiveTypeName.INT64 |
           PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY |
           PrimitiveTypeName.BINARY => pt
      case other => throw new UnsupportedOperationException(
        s"lake connector: decimal column ${message.getType(i).getName} " +
          s"backed by $other unsupported")
    }
  }

  private def valueDecoder(dt: DataType): (Group, Int) => Any = dt match {
    case LongType | TimestampType | TimestampNTZType =>
      (g: Group, i: Int) => g.getLong(i, 0)
    case IntegerType | DateType =>
      (g: Group, i: Int) => g.getInteger(i, 0)
    case DoubleType =>
      (g: Group, i: Int) => g.getDouble(i, 0)
    case FloatType =>
      (g: Group, i: Int) => g.getFloat(i, 0)
    case BooleanType =>
      (g: Group, i: Int) => g.getBoolean(i, 0)
    case StringType =>
      (g: Group, i: Int) => UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
    case BinaryType =>
      (g: Group, i: Int) => g.getBinary(i, 0).getBytes
    case d: org.apache.spark.sql.types.DecimalType if d.precision <= 18 =>
      (g: Group, i: Int) => org.apache.spark.sql.types.Decimal(
        g.getLong(i, 0), d.precision, d.scale)
    case d: org.apache.spark.sql.types.DecimalType =>
      (g: Group, i: Int) => decimalFromBytes(
        g.getBinary(i, 0).getBytes, d.precision, d.scale)
    case st: StructType =>
      val sub = st.fields.map(f => valueDecoder(f.dataType))
      (g: Group, i: Int) => toInternalRow(g.getGroup(i, 0), sub)
    case ArrayType(et, _) =>
      val elem = valueDecoder(et)
      (g: Group, i: Int) => {
        val lg = g.getGroup(i, 0) // the LIST-annotated group
        val n = lg.getFieldRepetitionCount(0)
        val out = new Array[Any](n)
        var k = 0
        while (k < n) {
          val inst = lg.getGroup(0, k) // one repeated "list" instance
          out(k) =
            if (inst.getFieldRepetitionCount(0) == 0) null
            else elem(inst, 0)
          k += 1
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
      }
    case MapType(kt, vt, _) =>
      val kd = valueDecoder(kt)
      val vd = valueDecoder(vt)
      (g: Group, i: Int) => {
        val mg = g.getGroup(i, 0) // the MAP-annotated group
        val n = mg.getFieldRepetitionCount(0)
        val keys = new Array[Any](n)
        val vals = new Array[Any](n)
        var k = 0
        while (k < n) {
          val kv = mg.getGroup(0, k) // one "key_value" instance
          keys(k) = kd(kv, 0)
          vals(k) =
            if (kv.getFieldRepetitionCount(1) == 0) null else vd(kv, 1)
          k += 1
        }
        new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
          new org.apache.spark.sql.catalyst.util.GenericArrayData(vals))
      }
    case other => throw new UnsupportedOperationException(other.toString)
  }

  /** FLBA two's-complement big-endian unscaled bytes → Spark Decimal. */
  def decimalFromBytes(bytes: Array[Byte], precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal =
    org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(new java.math.BigInteger(bytes), scale),
      precision, scale)

  /** Per-field decoder over parquet's COLUMN readers (the flat fast
    * path: page-level value reads, no Group materialization or record
    * assembly). Same type dispatch as [[decoders]]; callers gate on
    * [[isFlat]] — nested schemas never reach here.
    */
  def columnDecoders(projected: StructType,
                     message: MessageType)
      : Array[org.apache.parquet.column.ColumnReader => Any] =
    projected.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case d: org.apache.spark.sql.types.DecimalType =>
          decimalPhysical(message, i) match {
            case PrimitiveTypeName.INT64 =>
              (cr: org.apache.parquet.column.ColumnReader) =>
                org.apache.spark.sql.types.Decimal(cr.getLong,
                  d.precision, d.scale)
            case _ =>
              (cr: org.apache.parquet.column.ColumnReader) =>
                decimalFromBytes(cr.getBinary.getBytes,
                  d.precision, d.scale)
          }
        case _ => columnDecoder(f.dataType)
      }
    }

  private def columnDecoder(dt: DataType)
      : org.apache.parquet.column.ColumnReader => Any =
      dt match {
        case LongType | TimestampType | TimestampNTZType =>
          (cr: org.apache.parquet.column.ColumnReader) => cr.getLong
        case IntegerType | DateType =>
          (cr: org.apache.parquet.column.ColumnReader) => cr.getInteger
        case DoubleType =>
          (cr: org.apache.parquet.column.ColumnReader) => cr.getDouble
        case FloatType =>
          (cr: org.apache.parquet.column.ColumnReader) => cr.getFloat
        case BooleanType =>
          (cr: org.apache.parquet.column.ColumnReader) => cr.getBoolean
        case StringType =>
          (cr: org.apache.parquet.column.ColumnReader) =>
            UTF8String.fromBytes(cr.getBinary.getBytes)
        case BinaryType =>
          (cr: org.apache.parquet.column.ColumnReader) =>
            cr.getBinary.getBytes
        case d: org.apache.spark.sql.types.DecimalType
            if d.precision <= 18 =>
          // convention fallback (no physical info): our own files
          (cr: org.apache.parquet.column.ColumnReader) =>
            org.apache.spark.sql.types.Decimal(cr.getLong,
              d.precision, d.scale)
        case d: org.apache.spark.sql.types.DecimalType =>
          (cr: org.apache.parquet.column.ColumnReader) =>
            decimalFromBytes(cr.getBinary.getBytes, d.precision, d.scale)
        case other => throw new UnsupportedOperationException(other.toString)
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
    * Takes [[SpecializedGetters]] (InternalRow's supertype shared with
    * ArrayData) so nested struct/array/map values recurse through the
    * same encoders.
    */
  def encoders(schema: StructType)
      : Array[(org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
          Int, Group, Int) => Unit] =
    schema.fields.map(f => valueEncoder(f.dataType))

  type Getters =
    org.apache.spark.sql.catalyst.expressions.SpecializedGetters

  private def valueEncoder(dt: DataType)
      : (Getters, Int, Group, Int) => Unit = dt match {
    case LongType | TimestampType | TimestampNTZType =>
      (r: Getters, ri: Int, g: Group, gi: Int) => g.add(gi, r.getLong(ri))
    case IntegerType | DateType =>
      (r: Getters, ri: Int, g: Group, gi: Int) => g.add(gi, r.getInt(ri))
    case DoubleType =>
      (r: Getters, ri: Int, g: Group, gi: Int) => g.add(gi, r.getDouble(ri))
    case FloatType =>
      (r: Getters, ri: Int, g: Group, gi: Int) => g.add(gi, r.getFloat(ri))
    case BooleanType =>
      (r: Getters, ri: Int, g: Group, gi: Int) => g.add(gi, r.getBoolean(ri))
    case StringType =>
      (r: Getters, ri: Int, g: Group, gi: Int) =>
        g.add(gi, Binary.fromConstantByteArray(r.getUTF8String(ri).getBytes))
    case BinaryType =>
      (r: Getters, ri: Int, g: Group, gi: Int) =>
        g.add(gi, Binary.fromConstantByteArray(r.getBinary(ri)))
    case d: org.apache.spark.sql.types.DecimalType if d.precision <= 18 =>
      (r: Getters, ri: Int, g: Group, gi: Int) =>
        g.add(gi, r.getDecimal(ri, d.precision, d.scale).toUnscaledLong)
    case d: org.apache.spark.sql.types.DecimalType =>
      val n = decimalFixedLen(d.precision)
      (r: Getters, ri: Int, g: Group, gi: Int) => {
        val unscaled = r.getDecimal(ri, d.precision, d.scale)
          .toJavaBigDecimal.unscaledValue()
        val raw = unscaled.toByteArray // minimal two's complement
        val out = new Array[Byte](n)
        if (unscaled.signum() < 0) // sign-extend the pad
          java.util.Arrays.fill(out, 0, n - raw.length, -1.toByte)
        System.arraycopy(raw, 0, out, n - raw.length, raw.length)
        g.add(gi, Binary.fromConstantByteArray(out))
      }
    case st: StructType =>
      val sub = st.fields.map(f => valueEncoder(f.dataType))
      val width = st.fields.length
      (r: Getters, ri: Int, g: Group, gi: Int) => {
        val row = r.getStruct(ri, width)
        val sg = g.addGroup(gi)
        var i = 0
        while (i < width) {
          if (!row.isNullAt(i)) sub(i)(row, i, sg, i)
          i += 1
        }
      }
    case ArrayType(et, _) =>
      val elem = valueEncoder(et)
      (r: Getters, ri: Int, g: Group, gi: Int) => {
        val arr = r.getArray(ri)
        val lg = g.addGroup(gi) // the LIST-annotated group
        var k = 0
        while (k < arr.numElements()) {
          val inst = lg.addGroup(0) // one repeated "list" instance
          if (!arr.isNullAt(k)) elem(arr, k, inst, 0)
          k += 1
        }
      }
    case MapType(kt, vt, _) =>
      val ke = valueEncoder(kt)
      val ve = valueEncoder(vt)
      (r: Getters, ri: Int, g: Group, gi: Int) => {
        val m = r.getMap(ri)
        val keys = m.keyArray()
        val vals = m.valueArray()
        val mg = g.addGroup(gi) // the MAP-annotated group
        var k = 0
        while (k < m.numElements()) {
          val kv = mg.addGroup(0) // one "key_value" instance
          ke(keys, k, kv, 0)
          if (!vals.isNullAt(k)) ve(vals, k, kv, 1)
          k += 1
        }
      }
    case other => throw new UnsupportedOperationException(other.toString)
  }

  /** Encode `row` fields [off, off + width) into a Group. */
  def toGroup(row: InternalRow, schema: MessageType,
              enc: Array[(Getters, Int, Group, Int) => Unit],
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
