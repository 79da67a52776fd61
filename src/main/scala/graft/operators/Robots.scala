package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and URL gating (RFC 9309 / the Google REP) —
  * the crawl-politeness component a pipeline runs between frontier
  * and fetcher: which of the billions of frontier URLs may this
  * crawler touch at all.
  *
  * The parse is fully RELATIONAL — no state-machine UDF: lines
  * explode per host, comments strip, directives normalize
  * (case-insensitive names, trimmed values, unknown directives like
  * Crawl-delay ignored), and the RFC's grouping rule — consecutive
  * `User-agent:` lines form one group header; rules attach to the
  * most recent header; a `User-agent:` AFTER rules starts a NEW
  * group — is one lag + one running sum over a (host, line) window.
  * Robots files are small and one-per-host, so the per-host windows
  * partition across the cluster by host: billions of hosts, no hot
  * key (a window partitioned by host over ≤ a few hundred lines each
  * — the r12 global-window killer shape does not apply).
  *
  * Decision semantics (spec-pinned):
  *  - group selection: a group whose agent token equals the caller's
  *    (case-insensitive) beats `*`; all matching groups' rules merge
  *    (the RFC merge rule). Substring product-token matching is NOT
  *    implemented — exact-or-star covers the synthesized corpus and
  *    the common crawler config; documented boundary.
  *  - rule match: literal path-prefix (the `*`/`$` wildcard
  *    extension is a documented boundary), LONGEST match wins, a
  *    length tie goes to Allow (Google tie-break), no matching rule
  *    (or no robots.txt / no applicable group) = allowed.
  *  - empty-value Allow/Disallow lines carry no restriction and are
  *    dropped at parse time (RFC: "Disallow:" = allow everything).
  */
object Robots {

  /** Shared line/group pass: explode lines per host, strip comments,
    * normalize directives, keep `directives`, and attach each line
    * to its RFC group (consecutive `User-agent:` lines share one
    * header; a header after rules starts a new group). The directive
    * set is a parameter because including an extra directive (e.g.
    * crawl-delay) between two agent lines can change group
    * boundaries — each consumer states the lines it groups over. */
  private def groupedDirectives(robots: DataFrame, hostCol: String,
                                textCol: String,
                                directives: Seq[String]): DataFrame = {
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_no", "raw")))
      .select(col("host"), col("line_no"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .where(col("line") =!= "")
      .select(col("host"), col("line_no"),
        lower(trim(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1)))
          .as("directive"),
        trim(regexp_extract(col("line"), "^[A-Za-z-]+\\s*:(.*)$", 1))
          .as("value"))
      .where(col("directive").isin(directives: _*))
    val w = Window.partitionBy("host").orderBy("line_no")
    // a group STARTS at a user-agent line not preceded by another
    // user-agent line (consecutive agent lines share one header)
    lines
      .withColumn("starts",
        (col("directive") === "user-agent" &&
          coalesce(lag(col("directive"), 1).over(w), lit("")) =!=
            "user-agent").cast("long"))
      .withColumn("grp", sum(col("starts")).over(w))
      .where(col("grp") >= 1) // rules before any user-agent line: void
  }

  /** Per-host Crawl-delay for `agent` — the de-facto extension RFC
    * 9309 leaves undefined (parsed here, IGNORED by [[robotsRules]],
    * honored by [[Frontier.schedule]]). Group selection mirrors
    * [[gateUrls]]: a host with an exact-agent group uses ONLY that
    * group's delay — if the exact group declares none the host gets
    * NO row (the scheduler's default applies), even when `*` has
    * one. Non-numeric values drop; several matching groups take the
    * MAX delay (the conservative merge). Returns (host, delay_sec).
    */
  def crawlDelays(robots: DataFrame, agent: String,
                  hostCol: String = "host",
                  textCol: String = "robots_txt"): DataFrame = {
    val a = lower(lit(agent))
    val grouped = groupedDirectives(robots, hostCol, textCol,
      Seq("user-agent", "crawl-delay"))
    val agents = grouped.where(col("directive") === "user-agent")
      .select(col("host"), col("grp"), lower(col("value")).as("agent"))
    val hostHasExact = agents.where(col("agent") === a)
      .select("host").distinct().withColumn("has_exact", lit(true))
    val delays = grouped
      .where(col("directive") === "crawl-delay" &&
        col("value").rlike("^[0-9]+(\\.[0-9]+)?$"))
      .select(col("host"), col("grp"),
        col("value").cast("double").as("delay_sec"))
    agents.join(delays, Seq("host", "grp"))
      .join(hostHasExact, Seq("host"), "left")
      .where(col("agent") === a ||
        (col("agent") === "*" && col("has_exact").isNull))
      .groupBy("host")
      .agg(max(col("delay_sec")).as("delay_sec"))
  }

  /** Parse a (host, robots_txt) table into the flat rule table:
    * (host, agent, allow, path, path_len). One row per
    * (group-agent × rule) pair — the join-ready form
    * [[gateUrls]] probes. */
  def robotsRules(robots: DataFrame, hostCol: String = "host",
                  textCol: String = "robots_txt"): DataFrame = {
    val grouped = groupedDirectives(robots, hostCol, textCol,
      Seq("user-agent", "allow", "disallow"))
    val agents = grouped.where(col("directive") === "user-agent")
      .select(col("host"), col("grp"), lower(col("value")).as("agent"))
    val rules = grouped
      .where(col("directive").isin("allow", "disallow") &&
        col("value") =!= "") // empty value = no restriction (RFC)
      .select(col("host"), col("grp"),
        (col("directive") === "allow").as("allow"),
        col("value").as("path"),
        length(col("value")).as("path_len"))
    agents.join(rules, Seq("host", "grp"))
      .select("host", "agent", "allow", "path", "path_len")
  }

  /** Gate a (host, path) URL table for `agent` against a parsed rule
    * table: per URL, the longest matching rule of the applicable
    * group decides; ties go to Allow; silence means allowed.
    *
    * Scale shape: rules join URLs on the HOST key (both sides hash
    * to the host — a frontier is hosts × paths, rules are one small
    * set per host, so the join co-partitions and the per-URL rule
    * fan-in is that host's rule count); group selection is one
    * host-level aggregate broadcast back onto the rule rows; the
    * longest-match argmax is a max_by over the matched rules — no
    * window over the frontier.
    *
    * @return (host, path, allowed, rule_path) — rule_path null when
    *         no rule matched
    */
  def gateUrls(urls: DataFrame, rules: DataFrame,
               agent: String): DataFrame = {
    val a = lower(lit(agent))
    // hosts where an exact-agent group exists: their '*' groups are
    // ignored (RFC group selection — most specific match only)
    val hostHasExact = rules.where(col("agent") === a)
      .select("host").distinct().withColumn("has_exact", lit(true))
    val eff = rules
      .join(hostHasExact, Seq("host"), "left")
      .where(col("agent") === a ||
        (col("agent") === "*" && col("has_exact").isNull))
      .select(col("host"), col("allow"),
        col("path").as("rule_path"), col("path_len"))
    val u = urls.select(col("host"), col("path")).distinct()
    // inner join on host keeps only URL×rule pairs; prefix-filter,
    // then ONE max_by per URL — longest rule wins, allow breaks ties.
    // Two distinct same-length paths cannot both prefix one URL, so
    // the (path_len, allow) key is total over surviving candidates.
    val winners = u.join(eff, Seq("host"))
      .where(col("path").startsWith(col("rule_path")))
      .groupBy("host", "path")
      .agg(max_by(
        struct(col("allow"), col("rule_path")),
        struct(col("path_len"), col("allow").cast("int"))).as("win"))
    // silence = allowed: hosts with no robots/no group, and URLs no
    // rule of their host matched, come back through the left join
    u.join(winners, Seq("host", "path"), "left")
      .select(col("host"), col("path"),
        coalesce(col("win.allow"), lit(true)).as("allowed"),
        col("win.rule_path").as("rule_path"))
  }
}
