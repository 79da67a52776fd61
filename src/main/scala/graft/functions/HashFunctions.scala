package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hash-sketch column functions: MinHash signatures and SimHash.
  *
  * All sketches are built from `xxhash64` (codegen'd, 64-bit, seeded
  * by prepending a literal) — no UDFs, no RNG state, identical
  * results on any cluster layout.
  */
object HashFunctions {

  /** One minhash value: min over shingles of xxhash64(seed ⧺ s). */
  def minhash(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, s => xxhash64(lit(seed), s)))

  /** MinHash signature as `numHashes` independent minima. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map(minhash(shingles, _)): _*)

  /** LSH band keys: hash `rowsPerBand`-sized slices of the signature.
    * Two documents share a band key iff that signature slice matches
    * exactly → candidate pair via plain equi-join on (band, key). */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(signature, b * rowsPerBand + 1, rowsPerBand)).as("key"))
    }: _*)

  /** 64-bit SimHash of a token array: per-bit majority vote of token
    * hashes. Single pass: hash each token ONCE (`transform`), then
    * one `aggregate` fold carrying a 64-counter array (indexed
    * `transform` accumulates every bit per step); the finish lambda
    * assembles the majority bits into one long. O(64·n) adds but only
    * O(n) hash evaluations — vs 64 separate folds re-hashing every
    * token per bit. No explode, no shuffle. */
  def simhash(toks: Column): Column = {
    val hashes = transform(toks, t => xxhash64(t))
    val n = size(toks).cast("long")
    aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => transform(acc,
        (c, i) => c + call_function("shiftrightunsigned", h, i).bitwiseAND(1L)),
      counters => aggregate(
        zip_with(counters, sequence(lit(0), lit(63)),
          (cnt, b) => when(cnt * 2 >= n,
            call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
        lit(0L), (acc, bit) => acc.bitwiseOR(bit)))
  }

  /** Split a 64-bit code into `bands` equal bit-slices for hamming
    * LSH: two codes within hamming distance (bands−1) share at least
    * one identical slice (pigeonhole). */
  def hammingBands(code: Column, bands: Int): Column = {
    val width = 64 / bands
    val mask = (1L << width) - 1
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(code, b * width).bitwiseAND(mask).as("key"))
    }: _*)
  }
}
