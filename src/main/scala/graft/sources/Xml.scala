package graft.sources

import graft.operators.NestedOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** XML sources — the SIFTS / validation-XML analog, Spark-first.
  *
  * Spark 4 ships a native distributed XML reader (`rowTag` splits the
  * document into one row per element across executors). The reference
  * walks nested XML into per-residue rows on the driver
  * (proteofav/sifts.py:141 parse_sifts_residues,
  * validation.py:21 parse_validation_residues); here the same shape
  * is: read entities → explode nested element arrays → flatten
  * attribute structs, all as Catalyst projections.
  */
object Xml {

  /** Read one row per `rowTag` element. Attributes surface as `_attr`
    * columns, nested repeated elements as array<struct> columns. */
  def read(spark: SparkSession, path: String, rowTag: String): DataFrame =
    spark.read.option("rowTag", rowTag).xml(path)

  /** Explode every array-of-struct column (nested repeated elements)
    * into one row per leaf element — parent attributes replicate onto
    * each row — then flatten remaining structs to `parent_child`
    * columns. The per-residue-row shape of parse_sifts_residues. */
  def explodeNested(df: DataFrame): DataFrame = {
    val arrayCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] &&
        f.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType] =>
        f.name
    }
    val exploded = arrayCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, explode_outer(col(c)))
    }
    NestedOps.flattenStructs(exploded)
  }
}
