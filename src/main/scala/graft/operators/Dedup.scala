package graft.operators

import graft.functions.{HashFunctions, TextFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus deduplication operators (documents table).
  *
  * Every candidate-generation step is an equi-join on a derived key
  * (hash, LSH band, blocking key) — never a cross join — so each
  * variant scales to 100 TB as shuffle-on-key + bounded per-bucket
  * fan-out.
  */
object Dedup {

  /** Exact dedup on normalized text: md5 hash-groupBy, keep the
    * minimum doc id, report copy counts. */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs
      .withColumn("text_hash", md5(lower(trim(col(textCol))).cast("binary")))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as("keeper_doc_id"),
        count(lit(1)).as("n_copies"))

  /** Inverted-index token-set Jaccard similarity join within blocking
    * keys: explode distinct tokens, self-join on (blocking, token),
    * count co-occurrences, derive |A∪B| = |A|+|B|−|A∩B|. The classic
    * scalable set-similarity join (no pairwise array ops, no cross
    * join); blocking keys bound the candidate space. */
  def ngramJaccardPairs(docs: DataFrame, blockingKeys: Seq[String],
                        threshold: Double, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val base = docs.select(
      (col(idCol).as("id") +: blockingKeys.map(col)) :+
        TextFunctions.tokenSet(col(textCol)).as("toks"): _*)
    val sizes = base.select(col("id"), size(col("toks")).as("sz"))
    val tok = base.select(
      (col("id") +: blockingKeys.map(col)) :+ explode(col("toks")).as("tok"): _*)
    val a = tok.toDF(tok.columns.map(c => s"a_$c"): _*)
    val b = tok.toDF(tok.columns.map(c => s"b_$c"): _*)
    val joinCond = (blockingKeys.map(k => col(s"a_$k") === col(s"b_$k")) :+
      (col("a_tok") === col("b_tok")) :+ (col("a_id") < col("b_id")))
      .reduce(_ && _)
    val inter = a.join(b, joinCond)
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "a_id").withColumnRenamed("sz", "a_sz"), "a_id")
      .join(sizes.withColumnRenamed("id", "b_id").withColumnRenamed("sz", "b_sz"), "b_id")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("a_sz") + col("b_sz") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** MinHash signatures + band keys + per-doc LSH candidate count.
    * Always non-empty (one row per doc); candidate generation is the
    * band-key equi-join. Verified near-dup pairs available via
    * [[minhashPairs]]. */
  def minhashProfile(docs: DataFrame, numHashes: Int = 16, bands: Int = 4,
                     shingleN: Int = 3, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val sigs = docs.select(
      col(idCol).as("id"),
      HashFunctions.minhashSignature(
        TextFunctions.shingles(TextFunctions.tokens(col(textCol)), shingleN),
        numHashes).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      explode(HashFunctions.bandKeys(col("sig"), bands, numHashes / bands)).as("bk"))
    val cands = banded.alias("x")
      .join(banded.alias("y"),
        col("x.bk") === col("y.bk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id"), col("y.id").as("cand"))
      .distinct()
    val counts = cands.groupBy("id").agg(count(lit(1)).as("n_candidates"))
    sigs
      .join(counts, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("sig")(0).as("mh0"), col("sig")(1).as("mh1"),
        col("sig")(2).as("mh2"), col("sig")(3).as("mh3"))
  }

  /** Verified MinHash near-dup pairs: LSH candidates → exact shingle
    * Jaccard filter. */
  def minhashPairs(docs: DataFrame, threshold: Double, numHashes: Int = 16,
                   bands: Int = 4, shingleN: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      array_distinct(TextFunctions.shingles(
        TextFunctions.tokens(col(textCol)), shingleN)).as("sh"))
    val sigs = base.select(col("id"), col("sh"),
      HashFunctions.minhashSignature(col("sh"), numHashes).as("sig"))
    val banded = sigs.select(col("id"), col("sh"),
      explode(HashFunctions.bandKeys(col("sig"), bands, numHashes / bands)).as("bk"))
    banded.alias("x").join(banded.alias("y"),
        col("x.bk") === col("y.bk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        col("x.sh").as("a_sh"), col("y.sh").as("b_sh"))
      .distinct()
      .withColumn("jaccard",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Per-doc 64-bit SimHash + hamming band keys (always non-empty);
    * near-dup pairs via [[simhashPairs]]. */
  def simhashProfile(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      HashFunctions.simhash(TextFunctions.tokens(col(textCol))).as("simhash"))
      .withColumn("bands", HashFunctions.hammingBands(col("simhash"), 4))
      .select(col("doc_id"), col("simhash"),
        col("bands")(0)("key").as("band0"), col("bands")(1)("key").as("band1"),
        col("bands")(2)("key").as("band2"), col("bands")(3)("key").as("band3"))

  /** SimHash near-dup pairs with hamming <= maxHamming (<= bands−1
    * guarantees exact recall via pigeonhole). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val coded = docs.select(col(idCol).as("id"),
      HashFunctions.simhash(TextFunctions.tokens(col(textCol))).as("code"))
    val banded = coded.select(col("id"), col("code"),
      explode(HashFunctions.hammingBands(col("code"), 4)).as("bk"))
    banded.alias("x").join(banded.alias("y"),
        col("x.bk") === col("y.bk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        col("x.code").as("a_code"), col("y.code").as("b_code"))
      .distinct()
      .withColumn("hamming", bit_count(col("a_code").bitwiseXOR(col("b_code"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Embedding-cosine near-dup pairs within a blocking key (label):
    * per-block self-join + exact cosine ≥ threshold. The blocked join
    * bounds fan-out; the 100 TB path swaps the block key for an LSH
    * code (see Similarity.lshTopK). */
  def embeddingCosinePairs(embs: DataFrame, threshold: Double,
                           blockCol: String = "label",
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val v = embs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      col(vecCol).as("vec"))
    v.alias("x").join(v.alias("y"),
        col("x.blk") === col("y.blk") && col("x.id") < col("y.id"))
      .withColumn("cos", VectorFunctions.cosine(col("x.vec"), col("y.vec")))
      .filter(col("cos") >= threshold)
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        round(col("cos"), 6).as("cos"))
  }
}
