package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Bounded top-k aggregate — a custom Catalyst
  * `TypedImperativeAggregate` whose partial state is a k-capped
  * binary heap of (score, id).
  *
  * Why a custom expression: the built-in route
  * (`slice(reverse(array_sort(collect_list(...))), 1, k)`) only
  * truncates at FINALIZATION — every partial buffer still collects
  * ALL candidates in its partition and ships them through the
  * shuffle. This aggregate caps the state at k everywhere, so
  * map-side combine emits <= k rows per group per task and the
  * shuffle carries |groups| × k × |tasks| worst-case — the property
  * that makes global top-k over 100 TB of scored candidates safe.
  *
  * Semantics: top k by (score DESC, id ASC) — deterministic
  * tie-break. Null scores/ids are ignored. Output:
  * array<struct<score:double, id:bigint>> sorted best-first.
  *
  * reference analog: ranked neighbour selection in contact/variant
  * queries (proteofav/structures.py:382 nearest-residue lookups).
  */
case class BoundedTopK(
    left: Expression, // score: double
    right: Expression, // id: bigint
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    b.foreach(a.insert)
    a
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.fromBytes(bytes)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bounded_top_k"
}

/** k-capped min-heap keyed by (score asc, id desc): the root is the
  * WORST kept entry, so a better candidate replaces it in O(log k).
  * Plain parallel arrays — no boxing on the hot path. */
final class TopKBuffer(val k: Int) {
  private var scores = new Array[Double](math.min(k, 16))
  private var ids = new Array[Long](math.min(k, 16))
  private var n = 0

  // heap order: a "less than" b means a is WORSE (lower score, or
  // equal score and higher id) — worst at the root.
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def size: Int = n

  def insert(score: Double, id: Long): Unit = {
    if (n < k) {
      if (n == scores.length) grow()
      scores(n) = score; ids(n) = id
      n += 1
      siftUp(n - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }
  }

  private def grow(): Unit = {
    val cap = math.min(k, scores.length * 2)
    scores = java.util.Arrays.copyOf(scores, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  def foreach(f: (Double, Long) => Unit): Unit = {
    var i = 0
    while (i < n) { f(scores(i), ids(i)); i += 1 }
  }

  /** Entries best-first: score desc, id asc. */
  def sortedDesc: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    scala.util.Sorting.stableSort(out,
      (a: (Double, Long), b: (Double, Long)) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
    out
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * n)
    bb.putInt(k); bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }
}

object BoundedTopK {
  /** Aggregate Column: top-k (score desc, id asc) pairs as
    * array<struct<score,id>>, with k-capped partial state. */
  def boundedTopK(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      BoundedTopK(GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(id), k).toAggregateExpression())
}
