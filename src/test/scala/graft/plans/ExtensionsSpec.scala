package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import sqlImplicits._

  // Register the EXACT builder lambdas production sessions get via
  // injectFunction (getOrCreate would hand back the shared test
  // session, ignoring withExtensions — so exercise the builders
  // through the live registry instead).
  private def registerAll(): Unit =
    GraftExtensions.functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        ident.funcName, builder, "scala_udf")
    }

  test("bounded_top_k callable from SQL via the extension builder") {
    registerAll()
    Seq(("g", 0.9, 1L), ("g", 0.5, 2L), ("g", 0.7, 3L))
      .toDF("g", "cos", "id").createOrReplaceTempView("scored")
    val out = spark.sql(
      "SELECT g, bounded_top_k(cos, id, 2) AS t FROM scored GROUP BY g")
      .select(explode(col("t")).as("e")).select("e.id")
      .as[Long].collect().toSeq
    assert(out == Seq(1L, 3L))
  }

  test("array_dot / sorted_intersect_size / minhash_signature from SQL") {
    registerAll()
    assert(spark.sql("SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head().getDouble(0) == 11.0)
    assert(spark.sql(
      "SELECT sorted_intersect_size(array(1L, 2L, 3L), array(2L, 3L, 9L))")
      .head().getInt(0) == 2)
    val sig = spark.sql(
      "SELECT minhash_signature(array(7L, 8L, 9L), 4)")
      .head().getSeq[Long](0)
    assert(sig.length == 4 && sig.distinct.length > 1)
  }

  test("tokenizer and content-filter kernels callable from SQL") {
    registerAll()
    // BPE maximal munch with the char fallback
    assert(spark.sql(
      "SELECT longest_match_encode('thable', array('the', 'th', 'ab'))")
      .head().getSeq[String](0) == Seq("th", "ab", "l", "e"))
    // WordPiece: position-split vocab, whole-word UNK, 4-arg form
    assert(spark.sql(
      "SELECT wordpiece_encode('table', array('t', '##able'))")
      .head().getSeq[String](0) == Seq("t", "##able"))
    assert(spark.sql(
      "SELECT wordpiece_encode('tx', array('t', '##able'))")
      .head().getSeq[String](0) == Seq("[UNK]"))
    assert(spark.sql(
      "SELECT wordpiece_encode('table', array('t', '##able'), '<unk>', 3)")
      .head().getSeq[String](0) == Seq("<unk>")) // over maxWordChars
    // Aho-Corasick: overlapping occurrences, struct output
    val m = spark.sql(
      "SELECT m.n_hits, m.n_patterns FROM (SELECT " +
        "multi_pattern_count('aaa ba', array('aa', 'ba')) AS m)")
      .head()
    assert((m.getLong(0), m.getInt(1)) == ((3L, 2)))
    // a non-constant vocab is rejected at analysis, not at runtime
    val e = intercept[Exception](spark.sql(
      "SELECT wordpiece_encode('x', array(CAST(rand() AS STRING)))")
      .collect())
    assert(e.getMessage.contains("constant array<string>"), e.getMessage)
    // a NULL array element fails with a clear message, not an NPE
    val eNull = intercept[Exception](spark.sql(
      "SELECT multi_pattern_count('x', array('a', NULL))").collect())
    assert(eNull.getMessage.contains("non-null string literals"),
      eNull.getMessage)
  }

  test("DotProductRewrite: HOF pattern becomes array_dot, results identical") {
    // parquet-backed source: a Seq-based LocalRelation gets evaluated
    // whole by ConvertToLocalRelation before the rewrite can show up
    val dir = java.nio.file.Files.createTempDirectory("graft_dot").toString
    Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, 0.0f, -1.0f), Array(2.0f, 8.0f, 2.0f)))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val hof = aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, v) => s + v).as("dot")
    val plain = df.select(hof).as[Double].collect().toSeq
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite
    try {
      val q = df.select(hof)
      assert(q.queryExecution.optimizedPlan.toString.contains("array_dot"),
        s"rewrite did not fire:\n${q.queryExecution.optimizedPlan}")
      assert(q.as[Double].collect().toSeq == plain) // bit-identical
      // float*float multiply (rounds each product) must NOT rewrite
      val floatMult = df.select(aggregate(
        zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (s, v) => s + v).as("dot"))
      assert(!floatMult.queryExecution.optimizedPlan.toString
        .contains("array_dot"))
      // non-zero seed must NOT rewrite
      val seeded = df.select(aggregate(
        zip_with(col("a"), col("b"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(1.0), (s, v) => s + v).as("dot"))
      assert(!seeded.queryExecution.optimizedPlan.toString
        .contains("array_dot"))
      // null parity on mismatched lengths: both spellings yield null
      val mm = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
      assert(mm.select(hof).head().isNullAt(0))
      // nullable-element arrays (the from_json/parquet default):
      // the rewrite still fires, and through the CODEGEN path a null
      // element nulls the sum exactly as the HOF spelling does
      val ndir = java.nio.file.Files.createTempDirectory("graft_dotn").toString
      Seq(
        (1, Seq(Option(1.0f), None, Option(3.0f)),
          Seq(Option(4.0f), Option(5.0f), Option(6.0f))),
        (2, Seq(Option(1.0f), Option(2.0f), Option(3.0f)),
          Seq(Option(4.0f), Option(5.0f), Option(6.0f))))
        .toDF("id", "a", "b").write.mode("overwrite").parquet(ndir)
      val ndf = spark.read.parquet(ndir)
      val nq = ndf.select(col("id"), hof)
      assert(nq.queryExecution.optimizedPlan.toString.contains("array_dot"),
        s"rewrite skipped nullable-element arrays:\n${nq.queryExecution.optimizedPlan}")
      val nrows = nq.orderBy("id").collect()
      assert(nrows(0).isNullAt(1), "null element did not poison the sum")
      assert(nrows(1).getDouble(1) == 32.0)
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
  }

  test("builders reject malformed argument shapes") {
    registerAll()
    // non-literal k must be refused at analysis, not silently bound
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array(1L), 1 + 1)").collect()
    }
    assert(err.getMessage.contains("minhash_signature") ||
      err.getCause != null)
  }
}
