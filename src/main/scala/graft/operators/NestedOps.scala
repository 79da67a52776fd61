package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Nested-data operators: JSON payload flattening and recursive
  * struct flattening — the Spark analog of the reference's
  * XML-/JSON-to-rows parsing.
  *
  * reference: proteofav/variants.py:622,664 + utils.py:310 (REST
  * JSON payloads flattened row-wise), sifts.py:141 + validation.py:21
  * (nested XML attributes flattened to one row per entity).
  */
object NestedOps {

  /** Parse a JSON string column against an explicit schema and
    * splice the parsed fields in as top-level columns. Schema-first
    * (`from_json`) rather than schema-inference so the scan stays a
    * single pass and the plan is stable at 100 TB. */
  def flattenJson(df: DataFrame, jsonCol: String, schema: StructType,
                  prefix: String = ""): DataFrame = {
    val parsed = df.withColumn("__j", from_json(col(jsonCol), schema))
    val fields = schema.fields.map(f =>
      col(s"__j.${f.name}").as(s"$prefix${f.name}"))
    parsed.select((df.columns.map(col).toSeq ++ fields): _*).drop("__j")
  }

  /** Recursively flatten every struct column into top-level columns
    * named `parent_child` — the XML-attribute-flatten analog. Pure
    * projection: zero shuffle, and Catalyst prunes unused leaves out
    * of the scan. */
  def flattenStructs(df: DataFrame, sep: String = "_"): DataFrame = {
    def leaves(dt: DataType, path: Seq[String]): Seq[(Seq[String], String)] =
      dt match {
        case st: StructType =>
          st.fields.toSeq.flatMap(f => leaves(f.dataType, path :+ f.name))
        case _ => Seq((path, path.mkString(sep)))
      }
    val cols = df.schema.fields.toSeq.flatMap { f =>
      leaves(f.dataType, Seq(f.name)).map { case (path, name) =>
        col(path.mkString(".")).as(name)
      }
    }
    df.select(cols: _*)
  }
}
