package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.types._

class VariantsSpec extends SparkSpec {
  import sqlImplicits._

  private val uniprotSchema = StructType(Seq(
    StructField("accession", StringType),
    StructField("entryName", StringType),
    StructField("features", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("begin", StringType),
      StructField("end", StringType),
      StructField("wildType", StringType),
      StructField("alternativeSequence", StringType),
      StructField("consequenceType", StringType),
      StructField("xrefs", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("id", StringType)))))))))))

  test("flattenUniprotVariants: features explode, xrefs split, merge-down") {
    val payload =
      """{"accession":"P00439","entryName":"PH4H_HUMAN","features":[
        |{"type":"VARIANT","begin":"44","end":"44","wildType":"A",
        | "alternativeSequence":"G","consequenceType":"missense",
        | "xrefs":[{"name":"dbSNP","id":"rs1"},{"name":"ClinVar","id":"rcv1"}]},
        |{"type":"VARIANT","begin":"57","end":"57","wildType":"R",
        | "alternativeSequence":"Q","consequenceType":"missense",
        | "xrefs":[{"name":"dbSNP","id":"rs1"}]}]}""".stripMargin
      .replaceAll("\n", "")
    val out = Variants.flattenUniprotVariants(
      Seq(payload).toDF("json"), "json", uniprotSchema)
    val byId = out.collect()
      .map(r => r.getAs[String]("xrefs_id") -> r).toMap
    assert(byId.keySet == Set("rs1", "rcv1"))
    // rs1 backs TWO variants -> merged-down ';'-joined sorted values
    assert(byId("rs1").getAs[String]("begin") == "44;57")
    assert(byId("rs1").getAs[String]("wildType") == "A;R")
    // rcv1 backs one -> singleton values survive as-is
    assert(byId("rcv1").getAs[String]("begin") == "44")
    assert(byId("rcv1").getAs[String]("accession") == "P00439")
  }

  test("flattenUniprotVariants keeps xref-less features (null key)") {
    val payload =
      """{"accession":"P1","entryName":"E","features":[
        |{"type":"VARIANT","begin":"1","end":"1","wildType":"A",
        | "alternativeSequence":"G","consequenceType":"m","xrefs":null}]}"""
        .stripMargin.replaceAll("\n", "")
    val out = Variants.flattenUniprotVariants(
      Seq(payload).toDF("json"), "json", uniprotSchema).collect()
    assert(out.length == 1 &&
      out.head.isNullAt(out.head.fieldIndex("xrefs_id")))
  }

  private val ensemblSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("start", StringType),
    StructField("end", StringType),
    StructField("sift", StringType),
    StructField("polyphen", StringType),
    StructField("type", StringType)))

  test("flattenEnsemblVariants: rename, type, synonymous filter") {
    val payload =
      """[{"id":"rs10","start":"5","end":"5","sift":"0.12",
        | "polyphen":"0.9","type":"missense_variant"},
        |{"id":"rs11","start":"9","end":"9","sift":"0.5",
        | "polyphen":"0.1","type":"synonymous_variant"}]""".stripMargin
      .replaceAll("\n", "")
    val df = Seq(payload).toDF("json")
    val all = Variants.flattenEnsemblVariants(df, "json", ensemblSchema)
    assert(all.columns.contains("xrefs_id") && all.columns.contains("begin")
      && all.columns.contains("siftScore")) // renamed via the library map
    assert(all.count() == 2)
    val filtered = Variants.flattenEnsemblVariants(df, "json", ensemblSchema,
      synonymous = false)
    assert(filtered.select("xrefs_id").as[String].collect().toSeq
      == Seq("rs10"))
  }

  test("parseUniprotVariants: disease / transition / ids findall triple") {
    val ann = "['In cancer; loss'] P->L (['VAR_000001']) " +
      "['In BRCA1. G->R (['VAR_000002'])']"
    val out = Variants.parseUniprotVariants(
      Seq((7L, ann)).toDF("acc", "annotation"))
    assert(!out.columns.contains("annotation")) // dropped, as reference
    val row = out.select("disease", "transition", "ids")
      .as[(Seq[String], Seq[(String, String)], Seq[String])].head()
    assert(row._1 == Seq("cancer", "BRCA1"))
    assert(row._2 == Seq(("P", "L"), ("G", "R")))
    assert(row._3 == Seq("VAR_000001", "VAR_000002"))
  }
}
