package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PartitionedTablesSpec extends SparkSpec {
  import sqlImplicits._

  test("partitioned write + filter prunes directories at plan time") {
    val dir = Files.createTempDirectory("graft_part").toString + "/docs"
    val docs = Seq(
      (1L, "hello world", "en"), (2L, "hola mundo", "es"),
      (3L, "more english", "en"))
      .toDF("doc_id", "text", "lang")
    PartitionedTables.writePartitioned(docs, dir, Seq("lang"))
    val q = PartitionedTables.read(spark, dir).filter(col("lang") === "en")
    assert(q.count() == 2)
    assert(PartitionedTables.prunes(q), "scan must carry PartitionFilters")
    // and the partition column round-trips as a real column
    assert(q.select("lang").distinct().as[String].collect().toSeq == Seq("en"))
    // unfiltered read sees every partition
    assert(PartitionedTables.read(spark, dir).count() == 3)
  }
}
