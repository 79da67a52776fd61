package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}

/** PDB validation-XML source — the named loader for the reference's
  * validation leg (proteofav/validation.py). One row per
  * `ModelledSubgroup` element; columns are the union of the element's
  * ATTRIBUTES (child elements — clashes, bond/angle outliers — are
  * ignored, as the reference reads only `elem.attrib`), renamed with
  * the `validation_` prefix.
  *
  * Spark-first shape: the distributed XML reader splits the document
  * on the row tag across executors and its schema inference IS the
  * reference's header-union pass (validation.py:44-48); the icode /
  * altcode fixes and the dtype constraints are scan-fused column
  * expressions.
  */
object Validation {

  /** The reference's dtype constraints (library.py:506-534
    * validation_types) for the columns it pins — note `resnum` is a
    * STRING there (res_full concatenation depends on it). */
  val ValidationTypes: Map[String, DataType] = Map(
    "validation_model" -> LongType,
    "validation_ent" -> StringType,
    "validation_chain" -> StringType,
    "validation_resname" -> StringType,
    "validation_resnum" -> StringType,
    "validation_resnum_full" -> StringType,
    "validation_seq" -> StringType,
    "validation_altcode" -> StringType,
    "validation_icode" -> StringType,
    "validation_rsrz" -> StringType,
    "validation_avgoccu" -> DoubleType,
    "validation_rsr" -> DoubleType,
    "validation_owab" -> DoubleType,
    "validation_NatomsEDS" -> LongType,
    "validation_rscc" -> DoubleType,
    "validation_phi" -> DoubleType,
    "validation_psi" -> DoubleType,
    "validation_rota" -> StringType,
    "validation_rama" -> StringType,
    "validation_said" -> StringType)

  /** Parse a validation XML to one row per ModelledSubgroup —
    * `parse_validation_residues` (validation.py:21-73): attribute
    * union, `validation_` prefix, blank/null icode → '?' and
    * blank/'?'/null altcode → '.' (the same mmCIF-sentinel fixes the
    * repo applies for structures.py:205/219), reference dtypes
    * enforced, and the reference's raise-on-empty preserved (an eager
    * gate, like its pandas `table.empty` check). */
  def validationResidues(spark: SparkSession, path: String,
                         excludedCols: Seq[String] = Nil,
                         fixInsCode: Boolean = true,
                         fixLabelAltId: Boolean = true): DataFrame = {
    // inferSchema off: lxml hands the reference plain strings, so
    // numeric-looking attributes must not round-trip through inferred
    // doubles ("0.30" -> 0.3) before the reference dtype map applies
    val raw = spark.read.option("rowTag", "ModelledSubgroup")
      .option("inferSchema", "false").xml(path)
    val attrCols = raw.columns.filter(_.startsWith("_"))
    var df = raw.select(attrCols.map(c =>
      col(s"`$c`").cast(StringType)
        .as("validation_" + c.stripPrefix("_"))): _*)
    if (fixInsCode && df.columns.contains("validation_icode"))
      df = df.withColumn("validation_icode",
        when(col("validation_icode").isNull ||
          trim(col("validation_icode")) === "", lit("?"))
          .otherwise(col("validation_icode")))
    if (fixLabelAltId && df.columns.contains("validation_altcode"))
      df = df.withColumn("validation_altcode",
        when(col("validation_altcode").isNull ||
          trim(col("validation_altcode")) === "" ||
          col("validation_altcode") === "?", lit("."))
          .otherwise(col("validation_altcode")))
    df = excludeColumns(df, excludedCols)
    df = constrainTypes(df)
    if (df.isEmpty)
      throw new IllegalArgumentException(
        s"Validation file $path resulted in a empty Dataframe")
    df
  }

  /** `_add_validation_res_full` (validation.py:104-117): res_full =
    * resnum ++ icode with the '?' sentinel stripped — only when both
    * columns are present, as the reference's `in table` guard does. */
  def addResFull(df: DataFrame): DataFrame =
    if (df.columns.contains("validation_resnum") &&
      df.columns.contains("validation_icode"))
      df.withColumn("validation_resnum_full",
        concat(col("validation_resnum"),
          regexp_replace(col("validation_icode"), "\\?", "")))
    else df

  /** `filter_validation` (validation.py:142-174): column exclusion,
    * optional res_full extension, chain / resnum row selection, and
    * the reference's raise-on-empty after filtering. */
  def filterValidation(df: DataFrame,
                       excludedCols: Seq[String] = Nil,
                       chains: Option[Seq[String]] = None,
                       res: Option[Seq[String]] = None,
                       addResFullCol: Boolean = true): DataFrame = {
    var out = excludeColumns(df, excludedCols)
    if (addResFullCol) out = addResFull(out)
    for (cs <- chains)
      out = out.filter(col("validation_chain").isin(cs: _*))
    for (rs <- res)
      out = out.filter(col("validation_resnum").isin(rs: _*))
    if (out.isEmpty)
      throw new IllegalArgumentException(
        "The filters resulted in an empty DataFrame...")
    out
  }

  private def excludeColumns(df: DataFrame, excluded: Seq[String]): DataFrame =
    if (excluded.isEmpty) df
    else df.select(df.columns.filterNot(excluded.contains)
      .map(c => col(s"`$c`")): _*)

  private def constrainTypes(df: DataFrame): DataFrame =
    df.select(df.columns.map { c =>
      ValidationTypes.get(c) match {
        case Some(t) => col(s"`$c`").cast(t).as(c)
        case None => col(s"`$c`")
      }
    }: _*)
}
