package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sitemap (sitemaps.org XML) consumption — the crawl frontier's
  * PUSH side: outlinks (WAT, [[Wat]]) discover URLs the web links
  * to, sitemaps are what the SITE declares it wants crawled, with
  * freshness (`lastmod`) and `priority` hints. Frontier assembly is
  * sitemap index → child sitemaps → urlset ∪ outlinks →
  * canonicalize → robots gate ([[graft.operators.Robots]]) — the
  * composition the q_sitemap_frontier / q_sitemap_index queries run
  * end to end.
  *
  * Parsing is `from_xml` against fixed schemas — scan-stage, one
  * sitemap document per row (the 50k-URL/50 MB sitemap spec cap
  * keeps single documents small; a `<sitemapindex>` fans out to one
  * row per child via [[indexChildren]] BEFORE the urlset parse).
  * Malformed XML parses to null and contributes zero rows (flatMap
  * semantics, the [[Wat]] discipline); entries whose `loc` has no
  * parseable host or path are dropped — a frontier row without a
  * host cannot be fetched, scheduled, or robots-gated.
  */
object Sitemap {

  /** The sitemaps.org urlset shape; absent optional fields read as
    * null (`priority`, `lastmod` are optional per spec). */
  val urlsetSchema: StructType = StructType(Seq(
    StructField("url", ArrayType(StructType(Seq(
      StructField("loc", StringType),
      StructField("priority", StringType),
      StructField("lastmod", StringType)))))))

  /** The sitemaps.org `<sitemapindex><sitemap><loc/><lastmod/>`
    * shape (a sitemap OF sitemaps — how any site above the 50k-URL
    * cap publishes its frontier). */
  val sitemapIndexSchema: StructType = StructType(Seq(
    StructField("sitemap", ArrayType(StructType(Seq(
      StructField("loc", StringType),
      StructField("lastmod", StringType)))))))

  /** (host, path, priority, lastmod) frontier candidates from a
    * table of sitemap XML documents. `carryCols` ride the explode
    * unchanged (e.g. the parent index's lastmod, for freshness
    * provenance) — name them to avoid the four output columns. */
  def urls(sitemaps: DataFrame, xmlCol: String = "xml",
           carryCols: Seq[String] = Seq.empty): DataFrame =
    sitemaps
      .select(carryCols.map(col) :+
        from_xml(col(xmlCol), urlsetSchema).as("s"): _*)
      .select(carryCols.map(col) :+ explode(col("s.url")).as("u"): _*)
      .select(carryCols.map(col) ++ Seq(
        graft.functions.TextFunctions.urlHost(col("u.loc")).as("host"),
        regexp_extract(col("u.loc"), "^[a-z]+://[^/]+(/.*)$", 1)
          .as("path"),
        col("u.priority").as("priority"),
        col("u.lastmod").as("lastmod")): _*)
      .where(col("host").isNotNull && col("path") =!= "")

  /** (host, path, lastmod) of the CHILD sitemaps declared by a table
    * of sitemap-index XML documents — the fan-out hop: join the
    * result against the fetched child documents on (host, path) and
    * feed those to [[urls]]. Same null/drop discipline as [[urls]]. */
  def indexChildren(indexes: DataFrame, xmlCol: String = "xml")
  : DataFrame =
    indexes
      .select(from_xml(col(xmlCol), sitemapIndexSchema).as("s"))
      .select(explode(col("s.sitemap")).as("m"))
      .select(
        graft.functions.TextFunctions.urlHost(col("m.loc")).as("host"),
        regexp_extract(col("m.loc"), "^[a-z]+://[^/]+(/.*)$", 1)
          .as("path"),
        col("m.lastmod").as("lastmod"))
      .where(col("host").isNotNull && col("path") =!= "")
}
