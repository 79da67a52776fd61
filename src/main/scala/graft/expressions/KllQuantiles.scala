package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** Mergeable per-group quantile sketch — a KLL-style compactor
  * hierarchy (Karnin–Lang–Liberty 2016) as a custom Catalyst
  * `TypedImperativeAggregate`, the ONE-PASS scale path for the
  * order-statistics family.
  *
  * Why a custom expression: Spark's exact `percentile()` buffers
  * EVERY distinct value of a group in one task's aggregation buffer —
  * a single hot group (one language at 100 TB) OOMs that task however
  * the rest of the corpus is partitioned. `percentile_approx`
  * (Greenwald–Khanna) bounds state but its buffer still grows with
  * the compression parameter × log(n) and its merge is quadratic in
  * buffer count on skewed partitionings. A KLL compactor hierarchy
  * keeps O(k·log(n/k)) values per group with geometrically shrinking
  * level capacities (2/3 schedule), merges in O(state) by buffer
  * concatenation + re-compaction, and ships partial states through
  * the shuffle that are a few KB per group AT ANY GROUP SIZE — the
  * same "partial state bounded everywhere, not just at finalization"
  * discipline as [[BoundedTopK]].
  *
  * Determinism: compaction keeps odd/even survivors by a stored
  * alternating counter instead of KLL's random coin — replays of the
  * same partitioning are bit-identical. (The price is that the formal
  * randomized rank-error bound becomes an empirical one; the spec
  * pins measured rank error on uniform / zipf / sorted / constant
  * inputs, and the result is EXACT — the true order statistic —
  * whenever the group's value count stays ≤ the level-0 capacity,
  * i.e. small groups never pay any error at all.) Merge order across
  * partitions can shift which survivors a compaction keeps, so
  * cross-engine hash replay is out of scope: sketch consumers are
  * rows-only queries plus error-bound specs, the F8/B8 precedent.
  *
  * Semantics: `quantile(q)` returns the RETAINED value covering
  * weighted rank q·(n−1) of the ascending multiset — a discrete
  * (non-interpolating) quantile, exact when uncompacted. Nulls are
  * ignored by the aggregate; an all-null group evals to null.
  *
  * reference analog: the reference profiles per-group distributions
  * with pandas `quantile` over in-memory frames (proteofav relies on
  * whole-table describe()-style stats); this is that capability made
  * mergeable and bounded for the 100 TB per-group case.
  */
final class KllBuffer(val k: Int) {
  require(k >= 8, s"sketch parameter k must be >= 8, got $k")

  /** levels(l) holds unsorted values of weight 2^l. */
  private[expressions] var levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  /** Total values observed (== total retained weight: compaction
    * promotes pairs, conserving weight exactly). */
  private[expressions] var n: Long = 0L
  /** Deterministic alternating-parity counter for compaction offsets. */
  private[expressions] var flip: Long = 0L

  /** 2/3-geometric capacity schedule: the TOP level gets k, each
    * level below 2/3 of the one above, floor 8 — total retained
    * state O(3k) however many levels exist. */
  private def capacity(l: Int): Int = {
    val depth = levels.length - 1 - l
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, depth.toDouble)).toInt)
  }

  def insert(v: Double): Unit = {
    levels(0) += v
    n += 1
    if (levels(0).length >= capacity(0)) compress()
  }

  def merge(o: KllBuffer): Unit = {
    while (levels.length < o.levels.length)
      levels += ArrayBuffer.empty[Double]
    var l = 0
    while (l < o.levels.length) {
      levels(l) ++= o.levels(l)
      l += 1
    }
    n += o.n
    flip += o.flip
    compress()
  }

  /** Compact every over-capacity level until stable. Each compaction
    * sorts one level, promotes every other survivor (alternating
    * start parity) at doubled weight, and keeps an odd leftover in
    * place — weight is conserved exactly, so Σ retained weight == n
    * at all times. */
  private def compress(): Unit = {
    var changed = true
    while (changed) {
      changed = false
      var l = 0
      while (l < levels.length) {
        if (levels(l).length >= capacity(l) && levels(l).length >= 2) {
          compactLevel(l)
          changed = true
        }
        l += 1
      }
    }
  }

  private def compactLevel(l: Int): Unit = {
    if (l + 1 >= levels.length) levels += ArrayBuffer.empty[Double]
    val buf = levels(l)
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    val even = arr.length - (arr.length % 2)
    val off = (flip & 1L).toInt
    flip += 1
    val up = levels(l + 1)
    var i = off
    while (i < even) {
      up += arr(i)
      i += 2
    }
    val keep = ArrayBuffer.empty[Double]
    if (even < arr.length) keep += arr(arr.length - 1) // odd leftover
    levels(l) = keep
  }

  def isEmpty: Boolean = n == 0L

  /** Discrete quantile at q in [0,1]: the retained value whose
    * weighted coverage interval contains rank q·(n−1) of the
    * ascending order. */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    require(n > 0L, "quantile of an empty sketch")
    // gather (value, weight), sort by value
    var m = 0
    levels.foreach(m += _.length)
    val vs = new Array[Double](m)
    val ws = new Array[Long](m)
    var idx = 0
    var l = 0
    while (l < levels.length) {
      val w = 1L << l
      val buf = levels(l)
      var i = 0
      while (i < buf.length) {
        vs(idx) = buf(i); ws(idx) = w; idx += 1; i += 1
      }
      l += 1
    }
    val order = (0 until m).toArray.map(i => (vs(i), ws(i))).sortBy(_._1)
    val target = q * (n - 1).toDouble
    var cum = 0L
    var i = 0
    while (i < m) {
      cum += order(i)._2
      if (cum.toDouble > target) return order(i)._1
      i += 1
    }
    order(m - 1)._1
  }

  def toBytes: Array[Byte] = {
    var m = 0
    levels.foreach(m += _.length)
    val bb = ByteBuffer.allocate(4 + 8 + 8 + 4 + 4 * levels.length + 8 * m)
    bb.putInt(k); bb.putLong(n); bb.putLong(flip)
    bb.putInt(levels.length)
    levels.foreach { buf =>
      bb.putInt(buf.length)
      buf.foreach(bb.putDouble)
    }
    bb.array()
  }
}

object KllBuffer {
  def fromBytes(bytes: Array[Byte]): KllBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KllBuffer(bb.getInt())
    buf.n = bb.getLong()
    buf.flip = bb.getLong()
    val nl = bb.getInt()
    buf.levels = ArrayBuffer.fill(nl)(ArrayBuffer.empty[Double])
    var l = 0
    while (l < nl) {
      val c = bb.getInt()
      var i = 0
      while (i < c) { buf.levels(l) += bb.getDouble(); i += 1 }
      l += 1
    }
    buf
  }
}

/** Aggregate form: `kll_quantiles(value, qs, k)` → array<double> of
  * the sketch's discrete quantiles at each q, null for an all-null
  * group. Child must already be double-typed (callers cast). */
case class KllQuantiles(
    child: Expression,
    qs: Seq[Double],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] with UnaryLike[Expression] {

  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    s"quantiles must be in [0,1], got $qs")

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = {
    a.merge(b)
    a
  }

  override def eval(buf: KllBuffer): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(qs.map(buf.quantile).toArray)

  override def serialize(buf: KllBuffer): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.fromBytes(bytes)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): KllQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
  override def prettyName: String = "kll_quantiles"
}

/** Aggregate form: `kll_state(value, k)` → the SERIALIZED sketch
  * (binary) — the incremental half of the family: a daily job rolls
  * each (group, day) into one bounded state row, a stored STATE
  * table replaces re-scanning history, and any date range's
  * quantiles come from [[KllMergeQuantiles]] over the stored states
  * (the mergeability that justified the KLL design — now exposed as
  * data, the Ivf.saveCentroids "train once, reuse across sessions"
  * discipline applied to order statistics). */
case class KllState(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = {
    a.merge(b); a
  }

  override def eval(buf: KllBuffer): Any = buf.toBytes

  override def serialize(buf: KllBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): KllState =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllState =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllState =
    copy(child = newChild)
  override def prettyName: String = "kll_state"
}

/** Aggregate form: `kll_merge_quantiles(state, qs)` — merges stored
  * [[KllState]] binaries and answers quantiles, WITHOUT touching the
  * raw rows the states summarized: O(state) per input row instead of
  * O(history). An empty/absent group evals null; a corrupt or
  * truncated state fails loud in deserialization rather than
  * answering wrong. */
case class KllMergeQuantiles(
    child: Expression,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] with UnaryLike[Expression] {

  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    s"quantiles must be in [0,1], got $qs")

  /** Buffer starts empty with a sentinel k; the first merged state's
    * own k takes over (all states of one family share k). */
  override def createAggregationBuffer(): KllBuffer = new KllBuffer(8)

  private def mergeBytes(buf: KllBuffer, bytes: Array[Byte]): KllBuffer = {
    val other = KllBuffer.fromBytes(bytes)
    if (buf.isEmpty && buf.k != other.k) {
      other
    } else {
      buf.merge(other); buf
    }
  }

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v == null) buf
    else mergeBytes(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer =
    if (a.isEmpty && a.k != b.k) b
    else if (b.isEmpty) a
    else { a.merge(b); a }

  override def eval(buf: KllBuffer): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(qs.map(buf.quantile).toArray)

  override def serialize(buf: KllBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.fromBytes(bytes)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): KllMergeQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): KllMergeQuantiles = copy(child = newChild)
  override def prettyName: String = "kll_merge_quantiles"
}

object KllQuantiles {
  /** Aggregate Column: discrete sketch quantiles of a double column
    * at each q, with O(k·log(n/k)) partial state per group. */
  def kllQuantiles(value: Column, qs: Seq[Double], k: Int = 200): Column =
    GraftColumnBridge.column(
      KllQuantiles(GraftColumnBridge.expression(value), qs, k)
        .toAggregateExpression())

  /** Aggregate Column: the serialized sketch state of a double
    * column — store it, merge ranges later with [[mergeQuantiles]]. */
  def state(value: Column, k: Int = 200): Column =
    GraftColumnBridge.column(
      KllState(GraftColumnBridge.expression(value), k)
        .toAggregateExpression())

  /** Aggregate Column: quantiles from merged stored states. */
  def mergeQuantiles(state: Column, qs: Seq[Double]): Column =
    GraftColumnBridge.column(
      KllMergeQuantiles(GraftColumnBridge.expression(state), qs)
        .toAggregateExpression())
}
