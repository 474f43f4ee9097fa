package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Recursive JSON field search: find every string value of a field with a
  * given name at ANY depth of a JSON document (reference S5/F31:
  * collectors/json_collector.py:12-35 + helpers/json_helpers.py:4-17 —
  * the JSON URL collector walks arbitrary source payloads looking for the
  * configured url field).
  *
  * A UDF (schema-on-read over open-schema payloads can't be expressed as
  * a static Catalyst expression); jackson-databind ships inside Spark.
  * Row-local — scales linearly, no shuffle.
  */
object JsonSearch {

  @transient private lazy val mapper = new ObjectMapper()

  private def findAll(node: JsonNode, field: String,
      out: mutable.ArrayBuffer[String]): Unit = {
    if (node == null) return
    if (node.isObject) {
      val it = node.fields()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey == field && e.getValue.isTextual)
          out += e.getValue.asText()
        findAll(e.getValue, field, out)
      }
    } else if (node.isArray) {
      val it = node.elements()
      while (it.hasNext) findAll(it.next(), field, out)
    }
  }

  /** All string values of `field` anywhere in the JSON doc, in document
    * order; null/invalid JSON -> empty array. */
  val findFieldValues: UserDefinedFunction =
    udf { (json: String, field: String) =>
      if (json == null) Seq.empty[String]
      else {
        try {
          val out = mutable.ArrayBuffer.empty[String]
          findAll(mapper.readTree(json), field, out)
          out.toSeq
        } catch { case _: Exception => Seq.empty[String] }
      }
    }

  /** Column helper: url extraction with the reference's https filter
    * (reference csv/json collectors keep only https urls —
    * csv_collector.py:11-44). */
  def findUrls(json: Column, fieldName: String): Column =
    filter(findFieldValues(json, lit(fieldName)),
      u => u.startsWith("https://"))
}
