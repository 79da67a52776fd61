package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-text rendering sink — the write_mmcif/write_pdb analog.
  *
  * reference: proteofav/structures.py:515 (write_mmcif_from_table),
  * structures.py:541 (write_pdb_from_table). Rows are formatted to
  * fixed-width / delimited records with column expressions and written
  * via the distributed text sink — the formatting runs on executors,
  * not the driver.
  */
object TextRender {

  /** Right-pad/truncate a column to exactly `len` chars. */
  def padded(c: Column, len: Int): Column = rpad(c.cast("string"), len, " ")

  /** Left-pad (numeric-style) to exactly `len` chars. */
  def rightAligned(c: Column, len: Int): Column = lpad(c.cast("string"), len, " ")

  /** Render columns into a single fixed-width `value` string column
    * (the shape `spark.write.text` requires). */
  def fixedWidthLines(df: DataFrame, specs: Seq[(Column, Int, Boolean)]): DataFrame =
    df.select(concat(specs.map {
      case (c, len, right) => if (right) rightAligned(c, len) else padded(c, len)
    }: _*).as("value"))

  /** Write the rendered lines as distributed text files. */
  def writeText(lines: DataFrame, path: String): Unit =
    lines.write.mode("overwrite").text(path)
}
