package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) reader/writer — the container
  * format web-scale training corpora actually arrive in (Common
  * Crawl ships ~90k WARC files per snapshot). The processing model
  * here is Common Crawl's own: ONE task per WARC file, thousands of
  * files in parallel — `binaryFile` hands each task its whole file,
  * record splitting is a local byte scan, and everything downstream
  * is ordinary DataFrame work. A single file must fit in executor
  * memory (Common Crawl caps them at ~1 GiB, far under executor
  * sizing); the FILE count, not file size, is the scale axis.
  *
  * Records are the standard layout: a `WARC/1.0` version line,
  * CRLF-separated headers (WARC-Type, WARC-Target-URI, WARC-Date,
  * Content-Length), a blank line, `Content-Length` payload bytes,
  * and a CRLF CRLF record terminator. Content-Length DRIVES the
  * payload read — payloads are opaque bytes and may themselves
  * contain record-like text; only the byte count is trusted.
  */
object Warc {

  val recordSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("record_idx", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  private val CRLF = "\r\n".getBytes("US-ASCII")

  /** Write a DataFrame as WARC files — one `part-N.warc` per
    * partition, written through the Hadoop FileSystem API (works on
    * any cluster filesystem, not just local disk). Callers size
    * partitions to the target file size (the Common Crawl ~1 GiB
    * convention) with a repartition before the call.
    *
    * Two hardening rules (both are crawl-data facts of life):
    * - Header values are REJECTED if they contain CR or LF. Target
    *   URIs originate from crawled, untrusted content; a \\r\\n in a
    *   URI would forge headers / break record framing, and because
    *   [[parseFile]] keeps only the parsed prefix of a malformed
    *   file, every later record in that file would silently vanish
    *   on read-back. Failing the write names the row; callers
    *   sanitize upstream (canonicalizeUrl never emits control
    *   chars).
    * - Each task writes to an attempt-unique `.inprogress-<id>` temp
    *   path and RENAMES into place on success (the WarcIngest
    *   manifest commit discipline): a retried or speculative attempt
    *   can never interleave bytes with the original into one final
    *   file, and a failed job leaves no half-written `part-N.warc`
    *   for parseFile to silently accept as a truncated prefix. The
    *   commit is FIRST-attempt-wins (the driver pre-cleans the
    *   destination, so re-runs still overwrite): a later attempt
    *   that finds its part already committed discards its own temp
    *   rather than delete-then-rename, which under speculation could
    *   report success with a missing part file. */
  def write(df: DataFrame, dir: String,
            uriCol: String = "uri", dateCol: String = "date",
            payloadCol: String = "payload",
            warcType: String = "response"): Unit = {
    val rows = df.select(col(uriCol).cast("string"),
      col(dateCol).cast("string"), col(payloadCol).cast("binary"))
    // driver-side pre-clean (overwrite semantics for re-runs into
    // the same dir, incl. stale .inprogress temps from a crashed
    // job) so the task-level commit below can be strictly
    // first-attempt-wins: once a part file exists, it was committed
    // by a sibling attempt of THIS job and must not be disturbed
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val dfs = dirPath.getFileSystem(
      rows.sparkSession.sparkContext.hadoopConfiguration)
    Option(dfs.globStatus(
        new org.apache.hadoop.fs.Path(dir, "part-*.warc*")))
      .getOrElse(Array.empty).foreach(s => dfs.delete(s.getPath, false))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      rows.sparkSession.sparkContext.hadoopConfiguration)
    rows.sparkSession.sparkContext.runJob(rows.rdd,
      (ctx: org.apache.spark.TaskContext, it: Iterator[Row]) => {
        def clean(v: String, what: String): String = {
          require(v == null ||
            !v.exists(c => c == '\r' || c == '\n'),
            s"WARC $what contains CR/LF and would break record " +
              s"framing — sanitize upstream: ${v.take(80)}")
          v
        }
        val path = new org.apache.hadoop.fs.Path(
          dir, f"part-${ctx.partitionId()}%05d.warc")
        val tmp = new org.apache.hadoop.fs.Path(
          dir, f"part-${ctx.partitionId()}%05d.warc" +
            s".inprogress-${ctx.taskAttemptId()}")
        val fs = path.getFileSystem(conf.value)
        try {
          val out = fs.create(tmp, true)
          try {
            it.foreach { r =>
              val payload =
                Option(r.getAs[Array[Byte]](2)).getOrElse(Array.emptyByteArray)
              val headers = (s"WARC/1.0\r\n" +
                s"WARC-Type: $warcType\r\n" +
                s"WARC-Target-URI: ${clean(r.getString(0), "target URI")}\r\n" +
                s"WARC-Date: ${clean(r.getString(1), "date")}\r\n" +
                s"Content-Length: ${payload.length}\r\n" +
                "\r\n").getBytes("UTF-8")
              out.write(headers)
              out.write(payload)
              out.write(CRLF)
              out.write(CRLF)
            }
          } finally out.close()
          // commit: FIRST attempt wins whole — the destination was
          // pre-cleaned by the driver, so it can only exist if a
          // sibling attempt (speculation, or a retry after a
          // post-commit failure) already renamed its complete file
          // into place. Deleting it and re-renaming could leave a
          // reported-successful job with a MISSING part (our delete
          // lands, our rename doesn't); both attempts wrote complete
          // files, so keep the committed one and discard ours. If
          // two attempts race past the exists check, the loser's
          // rename either fails (task retries, then discards) or
          // atomically replaces one complete file with another.
          if (fs.exists(path)) fs.delete(tmp, false)
          else if (!fs.rename(tmp, path))
            throw new java.io.IOException(s"rename $tmp -> $path failed")
        } catch { case t: Throwable =>
          fs.delete(tmp, false)
          throw t
        }
      })
  }

  /** Read WARC files under `path` (glob ok): one row per record.
    * `.gz` files are decompressed transparently — including the
    * Common Crawl layout of CONCATENATED per-record gzip members
    * (`GZIPInputStream` reads multi-member streams). Malformed
    * trailing bytes (a truncated final record) stop the scan for
    * THAT file without failing the job — partial crawl files are a
    * fact of life; the parsed prefix is kept. */
  def read(spark: SparkSession, path: String): DataFrame =
    parseBinary(spark.read.format("binaryFile").load(path))

  /** Read an explicit file list (the incremental-ingest shape: the
    * caller already knows WHICH files are new). Same row contract as
    * the glob form. */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame =
    parseBinary(spark.read.format("binaryFile").load(paths: _*))

  private def parseBinary(files: DataFrame): DataFrame = {
    val cols = files.select(col("path"), col("content"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(recordSchema)
    cols.mapPartitions { rows =>
      rows.flatMap { r =>
        val p = r.getString(0)
        val raw = r.getAs[Array[Byte]](1)
        // a corrupt gzip stream (bad magic, truncated member, CRC
        // mismatch) quarantines THIS file as zero records instead of
        // failing the whole job — one bad file in a ~90k-file
        // snapshot must not kill the trigger; an ingest manifest
        // records the 0 count, making the quarantine visible
        val bytes =
          if (p.endsWith(".gz"))
            try gunzip(raw)
            catch { case _: java.io.IOException => Array.emptyByteArray }
          else raw
        parseFile(p, bytes)
      }
    }(enc)
  }

  private def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  /** Parse one WARC file's bytes into record rows. Exposed for
    * tests; tolerant of a truncated final record (parsed prefix is
    * returned). */
  private[sources] def parseFile(file: String,
                                 bytes: Array[Byte]): Seq[Row] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var pos = 0
    var idx = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < bytes.length) i else -1
    }
    var ok = true
    while (ok && pos < bytes.length) {
      // version line
      val ve = lineEnd(pos)
      if (ve < 0 ||
          !new String(bytes, pos, ve - pos, "UTF-8").startsWith("WARC/")) {
        ok = false
      } else {
        pos = ve + 2
        var wType: String = null
        var uri: String = null
        var date: String = null
        var clen = -1L
        var headersDone = false
        while (ok && !headersDone) {
          val he = lineEnd(pos)
          if (he < 0) ok = false
          else if (he == pos) { headersDone = true; pos += 2 } // blank
          else {
            val line = new String(bytes, pos, he - pos, "UTF-8")
            pos = he + 2
            val sep = line.indexOf(':')
            if (sep > 0) {
              val k = line.substring(0, sep).trim.toLowerCase
              val v = line.substring(sep + 1).trim
              k match {
                case "warc-type" => wType = v
                case "warc-target-uri" => uri = v
                case "warc-date" => date = v
                case "content-length" => clen = v.toLong
                case _ => () // unknown headers pass through unread
              }
            }
          }
        }
        if (ok && clen >= 0 && pos + clen <= bytes.length) {
          val payload = java.util.Arrays.copyOfRange(
            bytes, pos, pos + clen.toInt)
          out += Row(file, idx, wType, uri, date, clen, payload)
          idx += 1
          pos += clen.toInt
          // skip the CRLF CRLF record terminator (tolerate EOF)
          var skipped = 0
          while (skipped < 4 && pos < bytes.length &&
            (bytes(pos) == '\r' || bytes(pos) == '\n')) {
            pos += 1; skipped += 1
          }
        } else ok = false // truncated record: keep the parsed prefix
      }
    }
    out.toSeq
  }
}
