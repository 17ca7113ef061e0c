package graft.util

import org.apache.spark.sql.SparkSession

/** Managed-table hygiene for re-runnable jobs: `DROP TABLE IF EXISTS` only
  * clears the CATALOG entry — a stale data directory from a PREVIOUS
  * session's warehouse (fresh metastore, same disk) survives it and blocks
  * the next `saveAsTable` with a location-already-exists error. One helper
  * so every call site clears both, consistently. */
object Warehouse {

  /** Drop `table` from the catalog AND delete its default managed location
    * under the session warehouse dir. */
  def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new java.io.File(
      if (wh.getScheme == null) wh.toString else wh.getPath, table)
    if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
  }
}
