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
}
