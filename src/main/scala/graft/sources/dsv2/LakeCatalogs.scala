package graft.sources.dsv2

import org.apache.spark.sql.SparkSession

/** Session wiring for the [[GraftCatalog]]-backed lake: one catalog name
  * (`graft_lake`) rooted at a fixed per-JVM directory, with the scale
  * directory encoded as the NAMESPACE (catalogs initialize once per
  * session, so the root must not vary by sfDir — tables from different
  * scales coexist as `graft_lake.<ns>.<table>`).
  */
object LakeCatalogs {
  val CatalogName = "graft_lake"

  def root: String =
    s"${sys.props("java.io.tmpdir")}/graft-lakecat-v2"

  /** Namespace for a scale dir: alnum-only (dots would split the SQL
    * identifier).
    */
  def ns(sfDir: String): String = sfDir.replaceAll("[^A-Za-z0-9]", "_")

  /** The on-disk directory of `ns(sfDir).name` — THE layout mapping,
    * shared with query fixtures so a layout change cannot silently
    * desynchronize direct log access from catalog-resolved SQL.
    */
  def tablePath(sfDir: String, name: String): String =
    s"$root/${ns(sfDir)}/$name"

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    spark.conf.set(s"spark.sql.catalog.$CatalogName",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$CatalogName.root", root)
  }
}
