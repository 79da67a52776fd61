package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sitemap (sitemaps.org XML) consumption — the crawl frontier's
  * PUSH side: outlinks (WAT, [[Wat]]) discover URLs the web links
  * to, sitemaps are what the SITE declares it wants crawled, with
  * freshness (`lastmod`) and `priority` hints. Frontier assembly is
  * sitemap ∪ outlinks → canonicalize → robots gate
  * ([[graft.operators.Robots]]) — the composition the
  * q_sitemap_frontier query runs end to end.
  *
  * Parsing is `from_xml` against the fixed urlset schema —
  * scan-stage, one sitemap document per row (the 50k-URL/50 MB
  * sitemap spec cap keeps single documents small; an index-of-
  * sitemaps fans out to one row per child BEFORE this parse).
  * Malformed XML parses to null and contributes zero URL rows
  * (flatMap semantics, the [[Wat]] discipline); entries whose `loc`
  * has no parseable host or path are dropped — a frontier row
  * without a host cannot be fetched, scheduled, or robots-gated.
  */
object Sitemap {

  /** The sitemaps.org urlset shape; absent optional fields read as
    * null (`priority`, `lastmod` are optional per spec). */
  val urlsetSchema: StructType = StructType(Seq(
    StructField("url", ArrayType(StructType(Seq(
      StructField("loc", StringType),
      StructField("priority", StringType),
      StructField("lastmod", StringType)))))))

  /** (host, path, priority, lastmod) frontier candidates from a
    * table of sitemap XML documents. */
  def urls(sitemaps: DataFrame, xmlCol: String = "xml"): DataFrame =
    sitemaps
      .select(from_xml(col(xmlCol), urlsetSchema).as("s"))
      .select(explode(col("s.url")).as("u"))
      .select(
        graft.functions.TextFunctions.urlHost(col("u.loc")).as("host"),
        regexp_extract(col("u.loc"), "^[a-z]+://[^/]+(/.*)$", 1)
          .as("path"),
        col("u.priority").as("priority"),
        col("u.lastmod").as("lastmod"))
      .where(col("host").isNotNull && col("path") =!= "")
}
