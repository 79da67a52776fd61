package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier politeness scheduling — the stage after the robots
  * gate ([[Robots.gateUrls]]) that turns "may fetch" into "fetch
  * WHEN": per-host fetch pacing from Crawl-delay
  * ([[Robots.crawlDelays]]) or the crawler's own default. A fetcher
  * fleet consuming `fetch_at_us` order never hits one host faster
  * than its declared delay, however many workers drain the frontier.
  *
  * Slot assignment is ONE host-partitioned window: slot =
  * row_number − 1 in the caller's pinned order (priority first, in
  * the frontier composition), fetch_at_us = startUs + slot ×
  * delay_us with the delay converted to integer MICROSECONDS once —
  * all-long arithmetic after that, so the timeline is exact and
  * engine-portable (no per-slot float accumulation).
  *
  * Scale shape: the frontier shuffles ONCE on host (the window);
  * per-host row counts are whatever upstream quota policy admitted —
  * a host-quota cap (selectTopNByGroup) belongs BEFORE scheduling,
  * both for politeness (a 10M-URL host at delay 3 s is a year of
  * fetching) and to bound the window partition.
  */
object Frontier {

  /** @param urls    gated frontier; must carry hostCol
    * @param delays  (host, delay_sec) — [[Robots.crawlDelays]] output;
    *                hosts absent here pace at defaultDelaySec
    * @param orderBy pinned within-host fetch order (make it total —
    *                e.g. priority DESC, then path — or slots are
    *                nondeterministic)
    * @param defaultDelaySec pacing for hosts declaring no delay
    * @param startUs timeline origin (epoch µs of the crawl start)
    * @return urls + (delay_us, slot, fetch_at_us) */
  def schedule(urls: DataFrame, delays: DataFrame,
               orderBy: Seq[Column],
               defaultDelaySec: Double = 1.0,
               startUs: Long = 0L,
               hostCol: String = "host"): DataFrame = {
    require(orderBy.nonEmpty, "schedule needs a pinned within-host order")
    val w = Window.partitionBy(col(hostCol)).orderBy(orderBy: _*)
    urls
      .join(delays.select(col("host").as(hostCol),
        col("delay_sec")), Seq(hostCol), "left")
      .withColumn("delay_us",
        floor(coalesce(col("delay_sec"), lit(defaultDelaySec)) *
          1000000L).cast("long"))
      .drop("delay_sec")
      .withColumn("slot", (row_number().over(w) - 1).cast("long"))
      .withColumn("fetch_at_us",
        lit(startUs) + col("slot") * col("delay_us"))
  }
}
