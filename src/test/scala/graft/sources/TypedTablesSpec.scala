package graft.sources

import graft.SparkSpec
import graft.model._

class TypedTablesSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("typed loaders round the star schema through case classes") {
    val li: Lineitem = Tables.typed.lineitem(spark, d).head()
    assert(li.l_orderkey >= 0 && li.l_quantity > 0)
    val doc: Document = Tables.typed.documents(spark, d).head()
    assert(doc.text.nonEmpty && doc.n_chars > 0)
    val emb: Embedding = Tables.typed.embeddings(spark, d).head()
    assert(emb.embedding.length == 64)
    val ev: Event = Tables.typed.events(spark, d).head()
    assert(ev.ts != null) // ns parquet timestamp normalized to micros
  }

  test("typed filter compiles against fields and runs distributed") {
    import sqlImplicits._
    val n = Tables.typed.lineitem(spark, d)
      .filter(l => l.l_returnflag == "R" && l.l_quantity > 10)
      .map(_.l_orderkey).distinct().count()
    assert(n > 0)
  }
}
