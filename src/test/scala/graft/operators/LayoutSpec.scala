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

  test("compactTable: partition-preserving, contents-identical, " +
      "measured file-count collapse") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compact").toString
    val df = (1L to 600L).map(i =>
      (i, s"doc $i", if (i % 3 == 0) "de" else "en"))
      .toDF("doc_id", "text", "lang")
    // scatter: 12 files per lang partition = 24 small files
    df.repartition(12).write.partitionBy("lang")
      .mode("overwrite").parquet(s"$dir/src")
    def dataFiles(p: String): Int =
      new java.io.File(p).listFiles()
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(dataFiles(s"$dir/src/lang=en") > 1)
    val report = Layout.compactTable(spark, s"$dir/src", s"$dir/dst",
      targetBytes = 1L << 30)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    // one fat file per partition; report agrees with the filesystem
    assert(dataFiles(s"$dir/dst/lang=en") == 1)
    assert(dataFiles(s"$dir/dst/lang=de") == 1)
    assert(report("lang=en")._2 == 1L && report("lang=de")._2 == 1L)
    assert(report("lang=en")._1 == dataFiles(s"$dir/src/lang=en").toLong)
    // contents identical INCLUDING the re-derived partition column
    val back = spark.read.parquet(s"$dir/dst")
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect().toSet
    assert(back == df.as[(Long, String, String)].collect().toSet)
    // a small target splits into ceil(bytes/target) files
    val bytesEn = report("lang=en") match { case _ =>
      new java.io.File(s"$dir/src/lang=en").listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(_.length).sum }
    val tgt = bytesEn / 3 + 1
    val rep2 = Layout.compactTable(spark, s"$dir/src", s"$dir/dst2",
      targetBytes = tgt)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    val wantEn = (bytesEn + tgt - 1) / tgt
    assert(rep2("lang=en") == wantEn,
      s"expected ceil split $wantEn, got ${rep2("lang=en")}")
    // rerun-safe: dst is wiped, not appended into
    Layout.compactTable(spark, s"$dir/src", s"$dir/dst",
      targetBytes = 1L << 30)
    assert(dataFiles(s"$dir/dst/lang=en") == 1)
    assert(spark.read.parquet(s"$dir/dst").count() == 600)
    // flat (unpartitioned) tables compact under the "" partition
    df.drop("lang").repartition(9)
      .write.mode("overwrite").parquet(s"$dir/flat")
    val flat = Layout.compactTable(spark, s"$dir/flat", s"$dir/flatc",
      targetBytes = 1L << 30)
      .as[(String, Long, Long, Long)].collect()
    assert(flat.map(_._1).toSeq == Seq(""))
    assert(flat.head._4 == 1L && dataFiles(s"$dir/flatc") == 1)
    // guards: in-place compaction and a missing src fail loudly
    intercept[IllegalArgumentException](
      Layout.compactTable(spark, s"$dir/src", s"$dir/src", 1L << 30))
    intercept[IllegalArgumentException](
      Layout.compactTable(spark, s"$dir/nope", s"$dir/x", 1L << 30))
    // an existing-but-empty src (zero data files) yields an EMPTY
    // report, not a FileNotFoundException on the never-created dst
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/empty"))
    val emptyRep = Layout.compactTable(spark, s"$dir/empty",
      s"$dir/emptyc", 1L << 30)
    assert(emptyRep.count() == 0L)
  }
}
