package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass MinHash signature over a pre-hashed shingle set
  * (`array<bigint>`) — a custom codegen'd expression.
  *
  * The HOF formulation (`numHashes` separate
  * `array_min(transform(sh, s => xxhash64(lit(seed), s)))` columns)
  * traverses the array numHashes times, allocates numHashes
  * intermediate arrays per ROW, and interprets its lambda per
  * element. This expression makes ONE pass, carries a numHashes-long
  * running-minimum buffer, and allocates only the result.
  *
  * Hash compatibility: element j equals Spark's
  * `xxhash64(lit(j), s)` exactly — XxHash64 folds children over the
  * 42L default seed as hashInt(j, 42) then hashLong(s, ·); the
  * per-seed prefix hashInt(j, 42) is precomputed once.
  *
  * Empty input yields Long.MaxValue sentinels (a well-defined "no
  * shingles" signature; the HOF form yields nulls there). Null input
  * → null.
  */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val seedPrefix: Array[Long] =
    Array.tabulate(numHashes)(j => XXH64.hashInt(j, 42L))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashLong(v, seedPrefix(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val seeds = ctx.addReferenceObj("graftMinhashSeeds", seedPrefix, "long[]")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val v = ctx.freshName("v")
      val h = ctx.freshName("h")
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      s"""
         |int $n = $arr.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $arr.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $h = $xxh.hashLong($v, $seeds[$j]);
         |    if ($h < $mins[$j]) $mins[$j] = $h;
         |  }
         |}
         |${ev.value} = $uad.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

object MinHashSig {
  /** Column API entry: one-pass minhash signature of a pre-hashed
    * (array<bigint>) shingle set. */
  def of(shingleHashes: Column, numHashes: Int): Column =
    GraftColumnBridge.column(MinHashSig(
      GraftColumnBridge.expression(shingleHashes), numHashes))
}
