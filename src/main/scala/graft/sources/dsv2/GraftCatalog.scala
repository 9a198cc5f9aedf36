package graft.sources.dsv2

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, Table, TableCatalog, TableChange, TableInfo}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A directory-backed `TableCatalog`: identifier `ns1.….tbl` maps to
  * `<root>/ns1/…/tbl`, each table a [[LakeTable]]. This is the piece
  * that makes the connector reachable from PLAIN SQL — including
  * `MERGE INTO graft_lake.db.t …`, which Spark only plans against a
  * catalog-resolved v2 table (a temp view can't host row-level ops).
  *
  * Register per session:
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft_lake",
  *     classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft_lake.root", "/lake/root")
  * }}}
  *
  * Deliberately minimal: create / load / drop / list. Rename and alter
  * throw — schema evolution in this lake happens by rewrite, and an
  * unimplemented path must fail loud, not no-op.
  */
class GraftCatalog extends TableCatalog with ProcedureCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null,
      s"catalog $name requires spark.sql.catalog.$name.root")
  }

  override def name(): String = catalogName

  private def tableDir(ident: Identifier): Path =
    new Path((root +: ident.namespace.toSeq :+ ident.name).mkString("/"))

  private def fs = new Path(root).getFileSystem(new Configuration())

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path((root +: namespace.toSeq).mkString("/"))
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory)
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    fs.exists(tableDir(ident))

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!fs.exists(dir)) throw new NoSuchTableException(ident)
    new LakeTable((catalogName +: ident.namespace.toSeq :+ ident.name)
      .mkString("."), dir.toString)
  }

  /** Time travel — `SELECT … FROM t VERSION AS OF <n>` resolves here:
    * the returned table reads snapshot `n`'s manifest and rejects
    * writes. Fails loud for unlogged tables or expired versions.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (!fs.exists(dir)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft_lake versions are numeric snapshot ids, got '$version'")
    }
    LakeLog.snapshotAt(dir.toString, v) // existence check, fails loud
    new LakeTable((catalogName +: ident.namespace.toSeq :+ ident.name)
      .mkString("."), dir.toString, pinnedVersion = Some(v))
  }

  /** `TIMESTAMP AS OF` — Spark hands MICROseconds since epoch; resolve
    * to the latest snapshot committed at or before that instant.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = tableDir(ident)
    if (!fs.exists(dir)) throw new NoSuchTableException(ident)
    val snap = LakeLog.snapshotAsOfTime(dir.toString, timestampMicros / 1000L)
    new LakeTable((catalogName +: ident.namespace.toSeq :+ ident.name)
      .mkString("."), dir.toString, pinnedVersion = Some(snap.version))
  }

  override def createTable(ident: Identifier, info: TableInfo): Table = {
    val schema = StructType(info.columns().map(c =>
      StructField(c.name(), c.dataType(), c.nullable())))
    require(info.partitions().isEmpty,
      "graft_lake tables are unpartitioned (files are the groups)")
    val dir = tableDir(ident)
    fs.mkdirs(dir)
    val out = fs.create(new Path(dir, "_schema.ddl"), true)
    out.write(schema.toDDL.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    // v0 = the empty table: history (and any stream) starts at creation
    LakeLog.commit(dir.toString, "create", Seq.empty, Seq.empty, 0L)
    new LakeTable((catalogName +: ident.namespace.toSeq :+ ident.name)
      .mkString("."), dir.toString)
  }

  // route the deprecated StructType spelling through the TableInfo path
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    createTable(ident, new TableInfo.Builder()
      .withColumns(schema.fields.map(f =>
        org.apache.spark.sql.connector.catalog.Column
          .create(f.name, f.dataType, f.nullable)))
      .withPartitions(partitions)
      .withProperties(properties)
      .build())

  /** SQL `CALL graft_lake.system.<proc>(…)` — the maintenance surface
    * (history / rollback / expire / compact); see [[LakeProcedures]].
    */
  override def loadProcedure(ident: Identifier): UnboundProcedure =
    LakeProcedures.load(root, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (!namespace.sameElements(Array(LakeProcedures.Namespace)))
      Array.empty
    else LakeProcedures.names
      .map(Identifier.of(Array(LakeProcedures.Namespace), _)).toArray

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    fs.exists(dir) && fs.delete(dir, true)
  }

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft_lake: alter not supported — rewrite the table")

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft_lake: rename not supported")
}
