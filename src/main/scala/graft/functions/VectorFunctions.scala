package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embeddings.
  *
  * The dot/norm hot path is the custom codegen'd
  * [[graft.expressions.ArrayDot]] expression (a tight primitive loop
  * in generated code); higher-order functions — which interpret
  * their lambda once per element — are used only for the per-row
  * transforms that are off the pair-scoring hot path. Accumulation
  * is left-to-right double addition everywhere, so results are
  * bit-identical to the HOF formulation and DuckDB's list_sum.
  */
object VectorFunctions {

  /** Codegen'd sequential dot product of two array<float> columns. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.ArrayDot.dot(a, b)

  /** Squared L2 norm (array<float>). */
  def normSq(a: Column): Column = graft.expressions.ArrayDot.dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity (0 when either norm is 0 — ANSI-safe). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** L2-normalize to a unit vector (zero vectors pass through as
    * zeros) — the standard pre-step before cosine/IP ANN indexing. */
  def l2normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, transform(a, x => x.cast("double")))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /** Symmetric int8 quantization: round-half-up of x·127/maxAbs,
    * clamped to [-127, 127]. Uses floor(v + 0.5) — identical
    * round-half-toward-+inf on every engine (`round()` differs
    * between engines on .5 ties). The training-data shrink step for
    * embedding storage: 4x smaller, error <= maxAbs/254. */
  def quantizeInt8(a: Column, maxAbs: Column): Column =
    transform(a, x =>
      greatest(lit(-127), least(lit(127),
        floor(x.cast("double") * 127.0 / maxAbs + 0.5).cast("int"))))

  /** The default hyperplane weight family: murmur3-derived
    * deterministic pseudo-random in [-0.5, 0.5) — no RNG state,
    * reproducible across executors. */
  def murmurWeight(table: Int, j: Int, i: Int): Double = {
    val h = scala.util.hashing.MurmurHash3
      .stringHash(s"graft-hp-$table-$j-$i")
    (math.abs(h.toLong) % 1000L).toDouble / 1000.0 - 0.5
  }

  /** An md5-derived weight family with the same distribution — every
    * step is standard-SQL-expressible (`md5` + hex parse + mod), so
    * an external engine can re-derive the hyperplanes and replay the
    * whole LSH pipeline (the oracle-checkable family; weights are
    * plan-time constants either way, so the executed plan is
    * identical to [[murmurWeight]]'s). */
  def md5Weight(table: Int, j: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hp_${table}_${j}_${i}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.take(15), 16) % 1000L).toDouble /
      1000.0 - 0.5
  }

  /** Random-hyperplane LSH code: `nBits` sign bits of dot products
    * with deterministic hash-derived hyperplanes. `table` salts the
    * hyperplane family so multi-table LSH gets independent codes;
    * `weight` picks the family ([[murmurWeight]] default,
    * [[md5Weight]] for engine-portable replay). */
  def hyperplaneCode(vec: Column, dim: Int, nBits: Int,
                     table: Int = 0,
                     weight: (Int, Int, Int) => Double = murmurWeight)
  : Column = {
    val bits = (0 until nBits).map { j =>
      val hp = (0 until dim).map(i => weight(table, j, i))
      val hpCol = typedlit(hp)
      val d = aggregate(
        zip_with(vec, hpCol, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }
}
