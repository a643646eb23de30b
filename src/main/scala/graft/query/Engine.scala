package graft.query

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Ad-hoc parameterized query facade (reference EP3:
  * PostgresMedia.query, postgres_media.py:97-122) + catalog surface
  * (S8/S9: pg_class / information_schema scans, postgres_media.py:76,
  * 211-226).
  *
  * Parameter binding uses Spark's parameterized SQL (named markers),
  * the safe equivalent of the reference's client-side mogrify
  * (postgres_media.py:109-110).
  *
  * Error contract: the reference swallows errors and returns an empty
  * result (postgres_media.py:115-122). That silently hides failures, so
  * fail-fast is the default here; `lenient = true` reproduces the
  * reference's behavior for drop-in parity.
  */
final class Engine(spark: SparkSession, sfDir: String, lenient: Boolean = false) {
  Tables.registerAll(spark, sfDir)
  graft.functions.GraftFunctions.register(spark)

  /** Run SQL with named parameters, e.g.
    * query("SELECT * FROM orders WHERE o_totalprice < :p", Map("p" -> 50000)).
    */
  def query(sql: String, params: Map[String, Any] = Map.empty): DataFrame = {
    try spark.sql(sql, params)
    catch {
      case NonFatal(e) if lenient =>
        // reference contract: log-and-empty (postgres_media.py:115-122)
        System.err.println(s"[engine] query failed (lenient): ${e.getMessage}")
        spark.emptyDataFrame
    }
  }

  /** User tables (reference S8: SELECT relname FROM pg_class ...). */
  def listTables(): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).sorted.toSeq

  /** Column names per table, minus an exclusion list (reference S9:
    * query_table_columns excludes ORM tables and `id`,
    * postgres_media.py:211-226).
    */
  def tableColumns(exclude: Set[String] = Set.empty): Map[String, Seq[String]] =
    listTables().filterNot(exclude).map { t =>
      t -> spark.catalog.listColumns(t).collect().map(_.name).toSeq
    }.toMap

  /** DDL passthrough (reference D1-D3 create/drop lifecycle). */
  def ddl(statement: String): Unit = { spark.sql(statement); () }
}
