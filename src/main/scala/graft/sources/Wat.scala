package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WAT (Web Archive Transformation) consumption — the THIRD Common
  * Crawl sibling container next to raw WARC ([[Warc]]) and extracted
  * WET text: `WARC-Type: metadata` records whose payload is a JSON
  * envelope of per-page metadata, most importantly the OUTLINK list
  * (`Envelope → Payload-Metadata → HTTP-Response-Metadata →
  * HTML-Metadata → Links`). The link graph is what host-level
  * quality ranking consumes ([[graft.operators.Graph.pageRankTicks]])
  * — WAT is how you build it without parsing any HTML.
  *
  * Parsing is `from_json` against the fixed envelope schema —
  * scan-stage, codegen'd, zero shuffles; a malformed payload parses
  * to null and yields zero link rows (outlink extraction is a
  * flatMap: a page with no parseable links contributes no edges —
  * the same semantics as a page with an empty link list).
  */
object Wat {

  private val envelopeSchema: StructType = {
    val links = ArrayType(StructType(Seq(
      StructField("url", StringType),
      StructField("text", StringType))))
    val htmlMeta = StructType(Seq(StructField("Links", links)))
    val httpMeta = StructType(Seq(StructField("HTML-Metadata", htmlMeta)))
    val payloadMeta =
      StructType(Seq(StructField("HTTP-Response-Metadata", httpMeta)))
    val headerMeta =
      StructType(Seq(StructField("WARC-Target-URI", StringType)))
    StructType(Seq(StructField("Envelope", StructType(Seq(
      StructField("WARC-Header-Metadata", headerMeta),
      StructField("Payload-Metadata", payloadMeta))))))
  }

  /** (src_url, dst_url) outlink edges from a WARC-records table (the
    * [[Warc.read]] / WarcIngest row contract): metadata records only,
    * src = the envelope's own target URI (falling back to the WARC
    * header's), one row per link with a non-null url. */
  def outlinks(records: DataFrame): DataFrame =
    records.where(col("warc_type") === "metadata")
      .select(
        from_json(col("payload").cast("string"), envelopeSchema).as("j"),
        col("target_uri"))
      .select(
        coalesce(
          col("j.Envelope.`WARC-Header-Metadata`.`WARC-Target-URI`"),
          col("target_uri")).as("src_url"),
        explode(col("j.Envelope.`Payload-Metadata`" +
          ".`HTTP-Response-Metadata`.`HTML-Metadata`.Links")).as("l"))
      .select(col("src_url"), col("l.url").as("dst_url"))
      .where(col("dst_url").isNotNull)

  /** (src_url, dst_url, anchor) rows — the outlink edges that CARRY
    * anchor text (the `text` member of a WAT link object). Anchor
    * text is the classic incoming-relevance signal: what OTHER pages
    * call a target is training data for retrieval and a quality
    * feature the target's own content can't fake alone. Links with
    * no `text` (images, scripts, bare hrefs — most WAT link rows)
    * are dropped: they belong to [[outlinks]], not the anchor
    * corpus. Same parse discipline: scan-stage from_json, malformed
    * payloads and non-metadata records contribute nothing. */
  def anchorTexts(records: DataFrame): DataFrame =
    records.where(col("warc_type") === "metadata")
      .select(
        from_json(col("payload").cast("string"), envelopeSchema).as("j"),
        col("target_uri"))
      .select(
        coalesce(
          col("j.Envelope.`WARC-Header-Metadata`.`WARC-Target-URI`"),
          col("target_uri")).as("src_url"),
        explode(col("j.Envelope.`Payload-Metadata`" +
          ".`HTTP-Response-Metadata`.`HTML-Metadata`.Links")).as("l"))
      .select(col("src_url"), col("l.url").as("dst_url"),
        col("l.text").as("anchor"))
      .where(col("dst_url").isNotNull && col("anchor").isNotNull)
}
