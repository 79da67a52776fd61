package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class SourcesSpec extends SparkSpec {
  import sqlImplicits._

  private def writeTmp(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft_src_test")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("fixedWidth parses offsets and types; skipLines drops header") {
    val path = writeTmp("fw.txt",
      "HEADER LINE\n  12   3R       4.5\n  34   1A      10.0\n")
    val out = TextSources.fixedWidth(spark, path, Seq(
      TextSources.FixedWidthField("id", 1, 4, "int"),
      TextSources.FixedWidthField("n", 5, 4, "int"),
      TextSources.FixedWidthField("flag", 9, 1, "string"),
      TextSources.FixedWidthField("v", 10, 10, "double")),
      skipLines = 1)
    val rows = out.orderBy("id").as[(Int, Int, String, Double)].collect().toSeq
    assert(rows == Seq((12, 3, "R", 4.5), (34, 1, "A", 10.0)))
  }

  test("tokenRecords splits prefixed lines on whitespace") {
    val path = writeTmp("tok.txt",
      "ATOM 1 N ALA\nHETATM 9 O HOH\nATOM 2  CA  GLY\n")
    val out = TextSources.tokenRecords(spark, path,
      Seq("rec", "serial", "name", "res"), Some("ATOM"))
    val rows = out.orderBy("serial").select("serial", "name", "res")
      .as[(String, String, String)].collect().toSeq
    assert(rows == Seq(("1", "N", "ALA"), ("2", "CA", "GLY")))
  }

  test("gff parses 9 columns + attribute map, drops comments") {
    val path = writeTmp("x.gff",
      "# comment\nchr1\tsrc\tgene\t100\t200\t.\t+\t.\tid=g1;name=foo\n")
    val out = TextSources.gff(spark, path)
    val r = out.head()
    assert(r.getAs[String]("seqid") == "chr1")
    assert(r.getAs[Long]("start") == 100L)
    assert(r.getAs[Map[String, String]]("attr_map") ==
      Map("id" -> "g1", "name" -> "foo"))
  }

  test("fasta: distributed record split + multiline sequence concat") {
    val path = writeTmp("a.fasta",
      ">seq1/5-10 some description\nABCDE\nFGHIJ\n>seq2\nKLMNO\n")
    val out = Msa.fasta(spark, path)
    val rows = out.orderBy("seq_id")
      .select("seq_id", "description", "sequence")
      .as[(String, String, String)].collect().toSeq
    assert(rows == Seq(("seq1/5-10", "some description", "ABCDEFGHIJ"),
      ("seq2", "", "KLMNO")))
  }

  test("stockholm: blocks concatenate in order, annotations filtered") {
    val path = writeTmp("a.sth",
      """# STOCKHOLM 1.0
        |#=GF ID   FAM1
        |#=GS seq1/5-14  AC P00001.1
        |seq1/5-14      ABC..DE
        |seq2/1-6       GHI-JK.
        |
        |seq1/5-14      FGHIJ
        |seq2/1-6       .LM
        |#=GC seq_cons  xxxxx
        |//
        |""".stripMargin)
    val out = Msa.stockholm(spark, path)
    val rows = out.orderBy("seq_id")
      .select("seq_id", "aligned", "sequence")
      .as[(String, String, String)].collect().toSeq
    assert(rows == Seq(
      ("seq1/5-14", "ABC..DEFGHIJ", "ABCDEFGHIJ"),
      ("seq2/1-6", "GHI-JK..LM", "GHIJKLM")))
    // description regex applies to stockholm NAME/start-end ids too
    val parsed = Msa.parseDescription(out).orderBy("seq_id")
      .select("acc", "seq_start", "seq_end")
      .as[(String, Long, Long)].collect().toSeq
    assert(parsed == Seq(("seq1", 5L, 14L), ("seq2", 1L, 6L)))
  }

  test("stockholm: multiple files parse independently (per-file shard)") {
    val dir = Files.createTempDirectory("graft_sth").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "fam1.sth"),
      "# STOCKHOLM 1.0\nseqA/1-3  ABC\n//\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "fam2.sth"),
      "# STOCKHOLM 1.0\nseqA/1-4  DEFG\nseqB/2-4  HIJ\n//\n")
    val out = Msa.stockholm(spark, dir)
    // same seq id in two files stays two rows (grouped per src_file)
    assert(out.count() == 3)
    val seqs = out.select("sequence").as[String].collect().toSet
    assert(seqs == Set("ABC", "DEFG", "HIJ"))
  }

  test("clustal: header dropped, consensus skipped, blocks concat") {
    val path = writeTmp("a.aln",
      """CLUSTAL W (1.83) multiple sequence alignment
        |
        |seq1/5-14      ABC--DE 7
        |seq2/1-6       GHI-JK- 6
        |               **: .
        |
        |seq1/5-14      FGHIJ 12
        |seq2/1-6       -LM 8
        |""".stripMargin)
    val out = Msa.clustal(spark, path)
    val rows = out.orderBy("seq_id")
      .select("seq_id", "aligned", "sequence")
      .as[(String, String, String)].collect().toSeq
    // trailing cumulative counts tolerated; conservation row (leading
    // whitespace) and blanks skipped; fragments concat in line order
    assert(rows == Seq(
      ("seq1/5-14", "ABC--DEFGHIJ", "ABCDEFGHIJ"),
      ("seq2/1-6", "GHI-JK--LM", "GHIJKLM")))
    // the Pfam/CATH NAME/start-end grammar applies to clustal ids too
    val parsed = Msa.parseDescription(out).orderBy("seq_id")
      .select("acc", "seq_start", "seq_end")
      .as[(String, Long, Long)].collect().toSeq
    assert(parsed == Seq(("seq1", 5L, 14L), ("seq2", 1L, 6L)))
  }

  test("clustal: non-clustal header raises, as AlignIO.read does") {
    val path = writeTmp("bad.aln", "NOT AN ALIGNMENT\nseq1 ABC\n")
    intercept[IllegalArgumentException] { Msa.clustal(spark, path) }
  }

  test("normalizeSequence uppercases, swaps gaps, X-es unknown letters") {
    val df = Seq("acd.ef?gZ").toDF("s")
    val out = df.select(Msa.normalizeSequence(col("s"),
      gapSymbol = ".", newGapSymbol = "-").as("n")).as[String].head()
    assert(out == "ACD-EFXGX") // Z is not a standard residue letter
  }

  test("parseDescription extracts accession and range") {
    val df = Seq("UniRef90_P12345/57-316").toDF("seq_id")
    val r = Msa.parseDescription(df).head()
    assert(r.getAs[String]("acc") == "UniRef90_P12345")
    assert(r.getAs[Long]("seq_start") == 57L)
    assert(r.getAs[Long]("seq_end") == 316L)
  }

  test("parseDescriptionFull: the reference's four description grammars") {
    def one(desc: String, fmt: String) =
      Msa.parseDescriptionFull(Seq(desc).toDF("description"),
        format = fmt).head()
    // UniProt fasta (msas.py:165 docstring example)
    val u = one("sp|P00439|PH4H_HUMAN Phenylalanine-4-hydroxylase OS=Homo",
      "fasta")
    assert(u.getAs[String]("collection") == "sp")
    assert(u.getAs[String]("accession") == "P00439")
    assert(u.getAs[String]("name") == "PH4H_HUMAN")
    assert(u.getAs[String]("source") == "UniProt")
    assert(u.getAs[String]("rest") == "Phenylalanine-4-hydroxylase OS=Homo")
    // CATH fasta with structure domain (msas.py:260 example)
    val c = one("cath|4.1.0|1rwcA01/4-372 CATH_S35=1.50.10.100.1", "fasta")
    assert(c.getAs[String]("collection") == "cath")
    assert(c.getAs[String]("version") == "4.1.0")
    assert(c.getAs[String]("accession") == "1rwcA01")
    assert(c.getAs[Long]("seq_start") == 4L && c.getAs[Long]("seq_end") == 372L)
    assert(c.getAs[String]("source") == "CATH")
    // Pfam stockholm (msas.py:209 example) — incl. the reference's
    // generic-accession quirk: the alnum run AFTER the underscore
    val p = one("C7P4T5_HALMD/44-372", "stockholm")
    assert(p.getAs[String]("name") == "C7P4T5_HALMD")
    assert(p.getAs[String]("accession") == "HALMD")
    assert(p.getAs[Long]("seq_start") == 44L && p.getAs[Long]("seq_end") == 372L)
    assert(p.getAs[String]("source") == "Pfam")
    // CATH stockholm fallback stamps source even without a match
    val s = one("no grammar here", "stockholm")
    assert(s.getAs[String]("source") == "CATH")
    assert(s.isNullAt(s.fieldIndex("seq_start")))
    // generic with CATH domain form → pdb/chain split
    val gd = one("1rwcA01/4-372", "generic")
    assert(gd.getAs[String]("pdb_id") == "1rwc")
    assert(gd.getAs[String]("chain_id") == "A")
    assert(gd.getAs[String]("collection") == "cath")
    assert(gd.getAs[String]("source") == "GenericParser")
    // plain generic accession/range
    val gp = one("P00439/24-145", "generic")
    assert(gp.getAs[String]("accession") == "P00439")
    assert(gp.getAs[Long]("seq_start") == 24L && gp.getAs[Long]("seq_end") == 145L)
    // unmatched generic → null fields, null source
    val gn = one("nothing to see", "generic")
    assert(gn.isNullAt(gn.fieldIndex("source")))
    assert(gn.isNullAt(gn.fieldIndex("accession")))
  }

  test("TextRender roundtrip through fixedWidth") {
    val df = Seq((7L, "R", 2.5), (42L, "A", 10.0)).toDF("id", "f", "v")
    val dir = Files.createTempDirectory("graft_render").toString + "/out"
    graft.sinks.TextRender.writeText(
      graft.sinks.TextRender.fixedWidthLines(df, Seq(
        (col("id"), 6, true), (col("f"), 2, false), (col("v"), 8, true))),
      dir)
    val back = TextSources.fixedWidth(spark, dir, Seq(
      TextSources.FixedWidthField("id", 1, 6, "bigint"),
      TextSources.FixedWidthField("f", 7, 2, "string"),
      TextSources.FixedWidthField("v", 9, 8, "double")))
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((7L, "R", 2.5), (42L, "A", 10.0)))
  }

  test("Warc: write/read roundtrip preserves records across partitions") {
    val dir = Files.createTempDirectory("graft_warc").toString + "/out"
    val docs = Seq(
      (1L, "hello warc"),
      (2L, ""), // empty payload
      (3L, "binary-ish \r\n\r\nWARC/1.0 payload text"), // record-like TEXT
      (4L, "four")).toDF("doc_id", "text")
    Warc.write(docs.select(
      concat(lit("https://x.example/d/"), col("doc_id")).as("uri"),
      lit("2026-01-01T00:00:00Z").as("date"),
      col("text").cast("binary").as("payload")).repartition(2), dir)
    val back = Warc.read(spark, dir + "/*.warc")
      .select(regexp_extract(col("target_uri"), "([0-9]+)$", 1)
        .cast("long").as("doc_id"),
        col("warc_type"), col("warc_date"), col("content_length"),
        col("payload").cast("string").as("text"))
      .as[(Long, String, String, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(back.keySet == Set(1L, 2L, 3L, 4L))
    assert(back(1L) == ((1L, "response", "2026-01-01T00:00:00Z",
      10L, "hello warc")))
    assert(back(2L)._4 == 0L && back(2L)._5 == "")
    // Content-Length drives the read: a payload containing WARC-like
    // text does not split the record
    assert(back(3L)._5 == "binary-ish \r\n\r\nWARC/1.0 payload text")
  }

  test("Warc.write rejects CR/LF header values and leaves no temp file") {
    val dir = Files.createTempDirectory("graft_warc_inj").toString + "/out"
    val bad = Seq(("https://x.example/a\r\nWARC-Type: forged", "payload"))
      .toDF("uri", "text")
      .select(col("uri"), lit("2026-01-01T00:00:00Z").as("date"),
        col("text").cast("binary").as("payload"))
    val e = intercept[org.apache.spark.SparkException](
      Warc.write(bad.repartition(1), dir))
    assert(e.getMessage.contains("CR/LF") ||
      Option(e.getCause).exists(_.getMessage.contains("CR/LF")))
    // the failed attempt committed nothing: no final part file AND no
    // orphaned .inprogress temp for parseFile to trip over later
    val left = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty).map(_.getName).toSeq
    assert(left.isEmpty, s"leftovers: $left")
    // a LF-only value is rejected too (it would still break framing)
    val badLf = Seq(("https://ok", "p")).toDF("uri", "text")
      .select(col("uri"), lit("2026-01-01\n").as("date"),
        col("text").cast("binary").as("payload"))
    intercept[org.apache.spark.SparkException](
      Warc.write(badLf.repartition(1), dir))
  }

  test("Warc.write commits via rename: final files only, re-write wins whole") {
    val dir = Files.createTempDirectory("graft_warc_commit").toString + "/out"
    def df(n: Int) = (1 to n).map(i => (s"https://x/$i", s"body-$i"))
      .toDF("uri", "text")
      .select(col("uri"), lit("d").as("date"),
        col("text").cast("binary").as("payload"))
    Warc.write(df(3).repartition(1), dir)
    // re-write over the same dir (the retry/overwrite path): the
    // final file is replaced whole, never appended or interleaved
    Warc.write(df(2).repartition(1), dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSeq // local-FS .crc sidecars
    assert(files == Seq("part-00000.warc"), s"got $files")
    assert(Warc.read(spark, dir + "/*.warc").count() == 2)
  }

  test("Warc: .gz files decompress, incl. concatenated gzip members") {
    def rec(uri: String, body: String): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: d\r\nContent-Length: ${body.length}\r\n\r\n" +
        body + "\r\n\r\n").getBytes("UTF-8")
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    // the Common Crawl layout: one gzip MEMBER per record, concatenated
    val dir = Files.createTempDirectory("graft_warc_gz")
    Files.write(dir.resolve("f.warc.gz"),
      gz(rec("https://a", "one")) ++ gz(rec("https://b", "two")))
    val back = Warc.read(spark, dir.toString + "/*.warc.gz")
      .select(col("target_uri"), col("payload").cast("string"))
      .as[(String, String)].collect().toSet
    assert(back == Set(("https://a", "one"), ("https://b", "two")))
  }

  test("Warc: a truncated final record keeps the parsed prefix") {
    val good = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://a\r\nWARC-Date: d\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes("UTF-8")
    val truncated = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://b\r\nWARC-Date: d\r\n" +
      "Content-Length: 100\r\n\r\nonly-a-few-bytes").getBytes("UTF-8")
    val rows = Warc.parseFile("f", good ++ truncated)
    assert(rows.length == 1)
    assert(rows.head.getString(3) == "https://a")
    assert(new String(rows.head.getAs[Array[Byte]](6), "UTF-8") == "ok")
  }

  test("Wat.outlinks: envelope links, header fallback, junk quarantined") {
    val dir = Files.createTempDirectory("graft_wat").toString
    def env(uri: String, urls: Seq[String], withHeaderUri: Boolean) = {
      val links = urls.map(u => s"""{"path":"A@/href","url":"$u"}""")
        .mkString("[", ",", "]")
      val hdr = if (withHeaderUri)
        s""""WARC-Header-Metadata":{"WARC-Target-URI":"$uri"},"""
      else """"WARC-Header-Metadata":{},"""
      s"""{"Envelope":{$hdr"Payload-Metadata":{"HTTP-Response-Metadata":{"HTML-Metadata":{"Links":$links}}}}}"""
    }
    val recs = Seq(
      ("https://a.org/x", env("https://a.org/x",
        Seq("https://b.org/1", "https://c.org/2"), withHeaderUri = true)),
      // no envelope URI: src falls back to the WARC header's
      ("https://d.org/y", env("ignored", Seq("https://e.org/3"),
        withHeaderUri = false)),
      // malformed JSON: zero link rows, never a crash
      ("https://junk.org/z", "{not json at all"))
      .toDF("uri", "json")
      .select(col("uri"), lit("2026-01-01T00:00:00Z").as("date"),
        col("json").cast("binary").as("payload"))
    Warc.write(recs.repartition(1), dir, warcType = "metadata")
    val out = Wat.outlinks(Warc.read(spark, dir + "/*.warc"))
      .as[(String, String)].collect().toSet
    assert(out == Set(
      ("https://a.org/x", "https://b.org/1"),
      ("https://a.org/x", "https://c.org/2"),
      ("https://d.org/y", "https://e.org/3")))
    // non-metadata records contribute nothing
    Warc.write(recs.repartition(1), dir + "_resp")
    assert(Wat.outlinks(Warc.read(spark, dir + "_resp/*.warc"))
      .count() == 0)
  }

  test("Sitemap.urls: urlset parse, optional fields, junk quarantined") {
    val xmls = Seq(
      // well-formed: one full entry, one bare loc (optional fields
      // absent -> null), one loc with www + port to normalize
      """<urlset><url><loc>https://a.org/x</loc><priority>0.8</priority><lastmod>2026-01-01</lastmod></url>""" +
        """<url><loc>https://www.b.org:8080/y/z</loc></url>""" +
        """<url><loc>https://c.org</loc></url></urlset>""",
      "{not xml at all",
      "<urlset></urlset>")
      .map(Tuple1(_)).toDF("xml")
    val got = Sitemap.urls(xmls)
      .as[(String, String, Option[String], Option[String])]
      .collect().toSet
    assert(got == Set(
      ("a.org", "/x", Some("0.8"), Some("2026-01-01")),
      // www./port strip via urlHost; path survives verbatim
      ("b.org", "/y/z", None, None)))
    // c.org had no path -> dropped; junk and empty urlsets -> 0 rows
  }

  test("Sitemap.indexChildren + urls carryCols: the index hop") {
    val idx = Seq(
      """<sitemapindex><sitemap><loc>https://a.org/s1.xml</loc>""" +
        """<lastmod>2026-02-01</lastmod></sitemap>""" +
        """<sitemap><loc>https://a.org/s2.xml</loc></sitemap>""" +
        """</sitemapindex>""",
      "garbage").map(Tuple1(_)).toDF("xml")
    val kids = Sitemap.indexChildren(idx)
      .as[(String, String, Option[String])].collect().toSet
    assert(kids == Set(
      ("a.org", "/s1.xml", Some("2026-02-01")),
      ("a.org", "/s2.xml", None)))
    // carryCols ride the urlset explode unchanged
    val child = Seq(("/s1.xml",
      """<urlset><url><loc>https://a.org/p1</loc></url>""" +
        """<url><loc>https://a.org/p2</loc></url></urlset>"""))
      .toDF("sitemap_path", "xml")
    val urls = Sitemap.urls(child, carryCols = Seq("sitemap_path"))
      .select("sitemap_path", "host", "path")
      .as[(String, String, String)].collect().toSet
    assert(urls == Set(("/s1.xml", "a.org", "/p1"),
      ("/s1.xml", "a.org", "/p2")))
  }

  test("Wat.anchorTexts: text-bearing links only, text-less dropped") {
    val dir = Files.createTempDirectory("graft_wat_anchor").toString
    val json =
      """{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"https://a.org/x"},
        |"Payload-Metadata":{"HTTP-Response-Metadata":{"HTML-Metadata":{"Links":[
        |{"path":"A@/href","url":"https://b.org/1","text":"Fast Join"},
        |{"path":"A@/href","url":"https://c.org/2"},
        |{"path":"IMG@/src","url":"https://img.org/i.png","text":null},
        |{"path":"A@/href","url":null,"text":"orphan"}
        |]}}}}}""".stripMargin.replace("\n", "")
    val recs = Seq(("https://a.org/x", json)).toDF("uri", "json")
      .select(col("uri"), lit("2026-01-01T00:00:00Z").as("date"),
        col("json").cast("binary").as("payload"))
    Warc.write(recs.repartition(1), dir, warcType = "metadata")
    val out = Wat.anchorTexts(Warc.read(spark, dir + "/*.warc"))
      .as[(String, String, String)].collect().toSet
    // only the link with BOTH a url and text survives: the bare
    // href, the explicit-null image link, and the url-less entry
    // all belong to outlinks (or nothing), not the anchor corpus
    assert(out == Set(("https://a.org/x", "https://b.org/1",
      "Fast Join")))
    // outlinks still sees the text-less ones (anchor is a SUBSET)
    assert(Wat.outlinks(Warc.read(spark, dir + "/*.warc")).count() == 3)
  }
}
