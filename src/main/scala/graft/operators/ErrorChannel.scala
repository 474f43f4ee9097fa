package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The in-band error channel (reference §1 WrapperRetrieveDocument /
  * WrapperRawData, data/db_wrapper.py:15-47): instead of exceptions, a
  * row carries nullable `error_info`/`http_error_code` columns through
  * every stage; sinks split the stream at the end
  * (document_collector.py:160-188 writes error_retrieval rows + error
  * states). Keeping errors in-band is what lets one declarative plan
  * replace the reference's per-row try/except — and at scale it means no
  * task failures for data problems. */
object ErrorChannel {

  /** Add (null) error columns to a clean frame. */
  def withErrorChannel(df: DataFrame): DataFrame =
    df.withColumn("error_info", lit(null).cast("string"))
      .withColumn("http_error_code", lit(null).cast("int"))

  /** Mark rows matching `cond` as errored (idempotent: already-errored
    * rows keep their first error — reference wrappers preserve the
    * original failure). */
  def markErrors(df: DataFrame, cond: Column, code: Int,
      message: Column): DataFrame =
    df.withColumn("error_info",
        when(col("error_info").isNull && cond, message)
          .otherwise(col("error_info")))
      .withColumn("http_error_code",
        when(col("http_error_code").isNull && col("error_info") === message
            && cond, lit(code))
          .otherwise(col("http_error_code")))

  /** Mandatory-field validation (reference P7: modules/validation.py:6-13
    * + document_collector.py:160-165 — empty-after-strip desc/content =>
    * 422). */
  def validateMandatory(df: DataFrame, fields: Seq[String]): DataFrame =
    fields.foldLeft(withErrorChannel(df)) { (acc, f) =>
      markErrors(acc,
        col(f).isNull || length(trim(col(f))) === 0,
        422, lit(s"missing mandatory field: $f"))
    }

  /** Split into (clean, errored). */
  def split(df: DataFrame): (DataFrame, DataFrame) =
    (df.where(col("error_info").isNull)
       .drop("error_info", "http_error_code"),
     df.where(col("error_info").isNotNull))

  /** License allow-list gate (reference P8: constants.py:169-185 CC
    * list; open_alex.py:312-322 UnauthorizedLicense -> error row). */
  val authorizedLicenses: Seq[String] = Seq(
    "cc-by", "cc-by-sa", "cc-by-nc", "cc-by-nc-sa", "cc-by-nd",
    "cc-by-nc-nd", "cc0", "public-domain")

  def gateLicense(df: DataFrame, licenseCol: String): DataFrame =
    markErrors(df,
      !lower(col(licenseCol)).isin(authorizedLicenses.map(x => x: Any): _*),
      403, concat(lit("unauthorized license: "), col(licenseCol)))

  /** Publisher deny-list gate (reference P9: constants.py:235-355
    * predatory-publisher ids vs OpenAlex host lineage). */
  def gatePublisher(df: DataFrame, lineageCol: String,
      denyList: Seq[String]): DataFrame =
    markErrors(df,
      arrays_overlap(col(lineageCol),
        typedlit(denyList)),
      403, lit("publisher on deny-list"))
}
