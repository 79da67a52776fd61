package graft.sinks

import graft.SparkSpec

class ParquetSinkSpec extends SparkSpec {
  import sqlImplicits._

  test("writeCompacted bounds rows per file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact")
    val df = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(8) // simulate a fragmented upstream
    ParquetSink.writeCompacted(df, dir.toString, targetRecordsPerFile = 4L)
    val files = new java.io.File(dir.toString).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 3) // ceil(10/4)
    val back = spark.read.parquet(dir.toString)
    assert(back.count() == 10)
    assert(back.as[(Long, String)].collect().map(_._1).sorted
      .sameElements(1L to 10L))
  }

  test("writeRangeSorted: row-group stats prune the selective read") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_layout")
    val n = 200000L
    val df = spark.range(n).select(col("id").as("k"),
      pmod(col("id") * 2654435761L, lit(1000L)).as("v"))
    val sorted = s"$dir/sorted"
    val shuffled = s"$dir/shuffled"
    // same row-group size both sides — the ONLY difference is layout
    ParquetSink.writeRangeSorted(df, sorted, Seq("k"), nFiles = 4,
      rowGroupBytes = 64L * 1024)
    // layout uncorrelated with k: repartition alone PRESERVES the
    // ascending scan order inside each file (pages would still carry
    // narrow k bands) — sorting by the hash-like v genuinely
    // scrambles k within every row group and page
    df.repartition(4, col("v")).sortWithinPartitions("v")
      .write.mode("overwrite").option("parquet.block.size", 64L * 1024)
      .parquet(shuffled)
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // rows SURFACED by the scan = rows in row groups that survive
      // footer min/max pruning (the post-scan Filter re-filters, so
      // the RESULT is identical either way — the layout only moves
      // how many rows the reader must materialize)
      def run(path: String): (Long, Long) = {
        val q = spark.read.parquet(path)
          .filter(col("k") >= 10000L && col("k") < 12000L)
        // collect THIS dataset: metrics live on the executed plan
        // object, and a .count() would build (and execute) a
        // different one, leaving q's scan metrics at zero
        val result = q.collect().length.toLong
        val scan = q.queryExecution.executedPlan.collectLeaves()
          .collectFirst {
            case f: org.apache.spark.sql.execution.FileSourceScanExec => f
          }.get
        (result, scan.metrics("numOutputRows").value)
      }
      val (sortedRes, sortedScanned) = run(sorted)
      val (shuffledRes, shuffledScanned) = run(shuffled)
      assert(sortedRes == 2000L && shuffledRes == 2000L)
      // sorted layout: only the row groups covering [10000, 12000)
      // materialize; shuffled: every row group's min/max straddles
      // the band, nothing prunes
      assert(sortedScanned < n / 5,
        s"sorted layout scanned $sortedScanned of $n")
      assert(shuffledScanned > n / 2,
        s"shuffled layout scanned only $shuffledScanned — " +
          "pruning comparison baseline is broken")
      assert(sortedScanned * 10 < shuffledScanned,
        s"expected >=10x pruning win, got $sortedScanned vs $shuffledScanned")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }
}
