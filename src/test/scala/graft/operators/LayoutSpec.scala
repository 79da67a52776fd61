package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import sqlImplicits._

  private def refInterleave(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { b =>
      (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }.sum

  test("zValue matches the sequential bit-interleave reference") {
    val rnd = new scala.util.Random(67)
    val pts = (1 to 300).map(_ =>
      (rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == refInterleave(x, y, 16), s"($x,$y)")
    }
  }

  test("every tile is an exact rectangle of the normalized grid") {
    val rnd = new scala.util.Random(83)
    val df = (1 to 2000).map(_ =>
      (rnd.nextInt(100000).toLong, rnd.nextInt(5000).toLong)).toDF("x", "y")
    val z = Layout.withZOrder(df, "x", "y", bits = 10, tileBits = 3)
    // within a tile, the top tileBits of BOTH grid coords are constant
    val bad = z.groupBy("tile_id")
      .agg(countDistinct(shiftright(col("zx"), 7)).as("nx"),
        countDistinct(shiftright(col("zy"), 7)).as("ny"))
      .filter(col("nx") > 1 || col("ny") > 1).count()
    assert(bad == 0)
    // and the de-interleaved stats name that rectangle
    val stats = Layout.zorderStats(df, "x", "y", bits = 10, tileBits = 3)
    val byTile = stats.select("tile_id", "gx", "gy")
      .as[(Long, Long, Long)].collect()
    byTile.foreach { case (tile, gx, gy) =>
      assert(refInterleave(gx, gy, 3) == tile, s"tile $tile != ($gx,$gy)")
    }
  }

  test("z-ordered files prune range probes on BOTH dimensions") {
    // uniform 64x64 grid; 16 files each way. The y-sorted layout
    // answers an x-slab probe from every file; the z layout keeps
    // both dimensions' footer ranges tight.
    val pts = for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)
    val df = pts.toDF("x", "y")
    val zDir = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString
    val yDir = java.nio.file.Files
      .createTempDirectory("graft_ysort").toString
    Layout.writeZOrdered(df, "x", "y", zDir, nFiles = 16, bits = 6)
    df.repartitionByRange(16, col("y")).sortWithinPartitions("y")
      .write.mode("overwrite").parquet(yDir)
    def filesTouchedByXSlab(dir: String, lo: Long, hi: Long): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("mn"), max("x").as("mx"))
        .filter(col("mx") >= lo && col("mn") <= hi)
        .count()
    val zTouched = filesTouchedByXSlab(zDir, 8, 15)
    val yTouched = filesTouchedByXSlab(yDir, 8, 15)
    // y-sorted: every file spans all of x. z-ordered: the x∈[8,16)
    // slab is 1/8 of the grid → ~2 of 16 z-contiguous files.
    assert(yTouched == 16, s"y-sorted layout should touch all: $yTouched")
    assert(zTouched <= 6, s"z layout should prune the x slab: $zTouched")
    // round-trip: layout changes the order, never the data
    assert(spark.read.parquet(zDir).as[(Long, Long)].collect().toSet ==
      pts.toSet)
  }

  test("normalizeToGrid edges: degenerate range, overflow fails loudly") {
    val one = Seq((5L, 5L), (5L, 9L)).toDF("v", "w")
    val z = Layout.withZOrder(one, "v", "w", bits = 8, tileBits = 2)
      .select("zx").as[Long].collect()
    assert(z.forall(_ == 0L)) // min == max → every value maps to cell 0
    val wide = Seq((0L, 1L), (Long.MaxValue - 2L, 2L)).toDF("v", "w")
    val e = intercept[Exception] {
      Layout.withZOrder(wide, "v", "w", bits = 8, tileBits = 2).collect()
    }
    assert(e.getMessage.contains("overflow") ||
      e.getCause != null, s"expected the grid-scale overflow: $e")
    intercept[IllegalArgumentException](
      Layout.withZOrder(Seq((1L, 1L, 1L)).toDF("x", "y", "zval"),
        "x", "y"))
  }
}
