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

  /** The dbSources the reference excludes by default in every SIFTS
    * parse path (sifts.py:37, 204). */
  val DefaultExcludedDbs: Seq[String] = Seq("InterPro", "GO", "EC", "NCBI")

  /** Parse the SIFTS `listDB` header — one row per `<db/>` entry with
    * its (dbSource, dbCoordSys, dbVersion) attributes, the default
    * exclusion set applied. The `add_dbs=True` metadata table of
    * parse_sifts_residues. reference: proteofav/sifts.py:22-62
    * (_parse_sifts_dbs_from_file). */
  def siftsDbs(spark: SparkSession, path: String,
               excluded: Seq[String] = DefaultExcludedDbs): DataFrame =
    read(spark, path, rowTag = "listDB")
      .select(explode(col("db")).as("db"))
      .select(col("db._dbSource").cast("string").as("dbSource"),
        col("db._dbCoordSys").cast("string").as("dbCoordSys"),
        col("db._dbVersion").cast("string").as("dbVersion"))
      .filter(col("dbSource").isNotNull && col("dbSource") =!= "" &&
        !col("dbSource").isin(excluded: _*))

  /** Enrich per-residue crossRefDb rows with the header's dbVersion —
    * the long-form analog of the reference's `{source}_dbVersion`
    * columns (sifts.py:286-290): a broadcast left join on the source
    * (the header is a handful of rows; unlisted sources stay null). */
  def withDbVersions(residues: DataFrame, dbs: DataFrame,
                     sourceCol: String = "_dbSource"): DataFrame =
    residues.join(
      broadcast(dbs.select(col("dbSource").as(sourceCol), col("dbVersion"))),
      Seq(sourceCol), "left")

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
