package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parametrized SQL execution + materialized-view refresh (reference
  * S20/S21/F32: modules/query_utils.py:25-119, modules/validation.py,
  * nodes_workflow/UpdateMaterializedView/update_materialized_view.py:26-45,
  * BackFiller/backfilling.py:34-73).
  */
object SqlRunner {

  private val IdentifierRe = "^[\\w.]+$".r
  private val ParamRe = ":([A-Za-z_][A-Za-z0-9_]*)".r

  /** Identifier sanitation (reference S20 regex ^[\w.]+$ before
    * interpolating a view name into SQL). */
  def validateIdentifier(name: String): Unit =
    require(IdentifierRe.matches(name),
      s"illegal SQL identifier: '$name'")

  /** Named params referenced by the SQL text (`:param`). */
  def referencedParams(sql: String): Set[String] =
    ParamRe.findAllMatchIn(sql).map(_.group(1)).toSet

  /** Validate that every `:param` in the SQL has a binding and every
    * binding is used (reference F32: validation.py:17-27 — fails fast on
    * a mismatch instead of running a half-bound query). */
  def validateParams(sql: String, params: Map[String, Any]): Unit = {
    val referenced = referencedParams(sql)
    val missing = referenced -- params.keySet
    val unused = params.keySet -- referenced
    require(missing.isEmpty, s"unbound SQL params: $missing")
    require(unused.isEmpty, s"params not referenced by SQL: $unused")
  }

  /** Execute SQL text with named-parameter binding (reference S21; Spark
    * binds :name via the args map — injection-safe, no string splicing). */
  def runSql(spark: SparkSession, sql: String,
      params: Map[String, Any]): DataFrame = {
    validateParams(sql, params)
    spark.sql(sql, params)
  }

  /** Execute a .sql file with params (reference BackFiller flow). */
  def runSqlFile(spark: SparkSession, path: String,
      params: Map[String, Any]): DataFrame =
    runSql(spark,
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8"),
      params)

  /** Materialized-view emulation (reference S20: Spark has no MV — a
    * registered query re-runs and overwrites its backing parquet; readers
    * see the refreshed table). */
  final class ViewRegistry {
    private val views =
      scala.collection.mutable.Map.empty[String, String]

    def register(name: String, sql: String): Unit = {
      validateIdentifier(name)
      views(name) = sql
    }

    def refresh(spark: SparkSession, name: String, baseDir: String)
        : Unit = {
      validateIdentifier(name)
      val sql = views.getOrElse(name,
        throw new IllegalArgumentException(s"unknown view: $name"))
      // overwrite into a staging dir then swap: readers of the previous
      // snapshot are never exposed to a half-written table
      val out = s"$baseDir/$name"
      spark.sql(sql).write.mode("overwrite").parquet(out)
    }

    def registered: Set[String] = views.keySet.toSet
  }
}
