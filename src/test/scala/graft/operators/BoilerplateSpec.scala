package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import sqlImplicits._

  private val page =
    "<html><head><title>t</title><script>if (1 < 2) { x(); }</script>" +
      "<style>.nav{display:none}</style></head><body>" +
      "<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/a\">About</a>" +
      " <a href=\"/c\">Contact</a></div>" +
      "<h1>Tiny title</h1>" +
      "<p>The quick brown fox jumps over the lazy dog and runs off " +
      "into the woods for a while.</p>" +
      "<p>Second paragraph of the story is here &amp; it talks about " +
      "the <b>bold</b> fox again in detail.</p>" +
      "<div><a href=\"/r1\">Related article one</a> " +
      "<a href=\"/r2\">Related article two</a> more</div>" +
      "<div>Copyright 2024 ExampleCorp All rights reserved</div>" +
      "<!-- footer --></body></html>"

  test("htmlBlockScores: link density, stopword ratio, keep verdicts") {
    val df = Seq((1L, page)).toDF("doc_id", "html")
    val blocks = Boilerplate.htmlBlockScores(df)
      .orderBy("block_idx")
      .select("text", "link_chars", "keep")
      .as[(String, Long, Boolean)].collect().toSeq
    // nav: all-link, short → dropped
    assert(blocks.head == (("Home About Contact"), 16L, false))
    // heading: short → dropped
    assert(blocks(1) == (("Tiny title"), 0L, false))
    // both paragraphs: long, link-free, stopword-fluent → kept
    assert(blocks(2)._3 && blocks(2)._1.startsWith("The quick brown"))
    assert(blocks(3)._3 &&
      blocks(3)._1.contains("here & it talks about the bold fox"))
    // related-links block: 38 of 45 chars inside anchors → dropped
    val rel = blocks(4)
    assert(rel._1 == "Related article one Related article two more")
    assert(rel._2 == 38L && !rel._3)
    // copyright: long enough but zero stopwords, not long → dropped
    assert(blocks(5) ==
      (("Copyright 2024 ExampleCorp All rights reserved"), 0L, false))
    assert(blocks.size == 6)
  }

  test("htmlExtractBlocks: reassembles kept blocks in order; a doc " +
    "with no surviving block stays present with empty text") {
    val df = Seq(
      (1L, "u1", page),
      // doc 2: nothing survives (one short link block)
      (2L, "u2", "<div><a href=\"/\">Home</a></div>"))
      .toDF("doc_id", "url", "html")
    val out = Boilerplate
      .htmlExtractBlocks(df, carryCols = Seq("url"))
      .orderBy("doc_id")
      .select("doc_id", "url", "n_blocks", "n_kept", "extracted")
      .as[(Long, String, Long, Long, String)].collect().toSeq
    val (d1, d2) = (out.head, out(1))
    assert(d1._2 == "u1" && d1._3 == 6L && d1._4 == 2L)
    val lines = d1._5.split("\n").toSeq
    assert(lines.size == 2 && lines.head.startsWith("The quick") &&
      lines(1).startsWith("Second paragraph"))
    assert(d2 == ((2L, "u2", 1L, 0L, "")))
  }

  test("a long stopword-free block (code/table dump) survives via " +
    "the length escape hatch") {
    val longText = Seq.fill(40)("x1 y2 z3").mkString(" ") // 319 chars, 0 stopwords
    val df = Seq((1L, s"<p>$longText</p>")).toDF("doc_id", "html")
    val out = Boilerplate.htmlExtractBlocks(df)
      .select("n_kept", "extracted").as[(Long, String)].head()
    assert(out._1 == 1L && out._2 == longText)
  }

  test("plan shape: one shuffle (the per-doc rollup), no join") {
    val df = Seq((1L, page)).toDF("doc_id", "html")
    val plan = Boilerplate.htmlExtractBlocks(df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    assert("Exchange".r.findAllIn(plan).length <= 1,
      s"extraction should shuffle once (doc rollup):\n$plan")
  }
}
