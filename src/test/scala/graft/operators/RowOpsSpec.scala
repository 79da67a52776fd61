package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

class RowOpsSpec extends SparkSpec {
  import sqlImplicits._

  private def df = Seq(
    ("A", 1, "x;y;z", 10.0),
    ("B", 2, "y;", 20.0),
    ("A", 3, "", 30.0)
  ).toDF("k", "id", "tags", "v")

  test("rowSelector eq / in / not") {
    assert(RowOps.rowSelector(df, "k", Seq("A")).count() == 2)
    assert(RowOps.rowSelector(df, "k", Seq("A", "B")).count() == 3)
    assert(RowOps.rowSelector(df, "k", Seq("A"), reverse = true)
      .select("k").as[String].collect().toSet == Set("B"))
  }

  test("excludeColumns drops present, ignores absent") {
    val out = RowOps.excludeColumns(df, Seq("tags", "nope"))
    assert(out.columns.toSeq == Seq("k", "id", "v"))
  }

  test("constrainColumnTypes casts and fills nulls") {
    val withNull = df.withColumn("v",
      when(col("id") === 2, lit(null)).otherwise(col("v")))
    val out = RowOps.constrainColumnTypes(withNull,
      casts = Map("id" -> LongType), fills = Map("v" -> 0.0))
    assert(out.schema("id").dataType == LongType)
    assert(out.filter(col("id") === 2).select("v").as[Double].head() == 0.0)
  }

  test("splitUpByKey explodes non-empty elements") {
    val out = RowOps.splitUpByKey(df.select("id", "tags"), "tags")
    assert(out.filter(col("id") === 1).count() == 3)
    assert(out.filter(col("id") === 2).count() == 1) // trailing empty dropped
    assert(out.filter(col("id") === 3).count() == 0) // all-empty row gone
  }

  test("mergeDownByKey collapses to sorted-unique concat") {
    val out = RowOps.mergeDownByKey(
      Seq(("A", "z"), ("A", "x"), ("A", "z"), ("B", "y")).toDF("k", "t"),
      Seq("k"))
    val a = out.filter(col("k") === "A").select("t").as[String].head()
    assert(a == "x;z")
  }

  test("deriveConcatKey builds composite key") {
    val out = RowOps.deriveConcatKey(df, Seq("k", "id"), "ck")
    assert(out.filter(col("id") === 1).select("ck").as[String].head() == "A_1")
  }

  test("recodeByThresholds classes + null passthrough") {
    val src = Seq(Some(5.0), Some(15.0), Some(40.0), None).toDF("v")
    val out = RowOps.recodeByThresholds(src, "v", "c",
      Seq(10.0, 25.0), Seq("low", "mid", "high"))
    assert(out.select("c").as[Option[String]].collect().toSeq ==
      Seq(Some("low"), Some("mid"), Some("high"), None))
  }

  test("recodeByMap with default") {
    val out = RowOps.recodeByMap(Seq("H", "G", "E").toDF("ss"), "ss", "r",
      Map("H" -> "Helix", "G" -> "Helix"), "Other")
    assert(out.select("r").as[String].collect().toSeq ==
      Seq("Helix", "Helix", "Other"))
  }

  test("snapshotDiff classifies added/removed/changed, null-safe") {
    val v1 = Seq((1L, "a", Some(10)), (2L, "b", Some(20)),
      (3L, "c", None: Option[Int])).toDF("id", "t", "x")
    val v2 = Seq((1L, "a", Some(10)),              // unchanged → dropped
      (2L, "b2", Some(20)),                        // changed payload
      (3L, "c", Some(5)),                          // null → value = changed
      (4L, "d", Some(40))).toDF("id", "t", "x")    // added; none removed? drop 2? keep
    val out = RowOps.snapshotDiff(v1, v2, Seq("id"), Seq("t", "x"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(2L -> "changed", 3L -> "changed", 4L -> "added"))
    // removal: v2 without id 1
    val out2 = RowOps.snapshotDiff(v1, v2.filter(col("id") =!= 1), Seq("id"),
      Seq("t", "x"))
      .as[(Long, String)].collect().toMap
    assert(out2(1L) == "removed")
  }

  test("snapshotDiff matches a null key to itself, not as added+removed") {
    val v1 = Seq((Option.empty[Long], "a")).toDF("id", "t")
    val v2 = Seq((Option.empty[Long], "b")).toDF("id", "t")
    val out = RowOps.snapshotDiff(v1, v2, Seq("id"), Seq("t"))
      .select("change").as[String].collect().toSeq
    assert(out == Seq("changed"))
  }

  test("applySequenceIndexMap re-keys through the map, None when unmapped") {
    // seq "s1": 1->10, 2->11 (3 unmapped = aligned to a gap);
    // seq "s2": 1->5. Same index, different sequence -> different key.
    val ann = Seq(("s1", 1, "a"), ("s1", 2, "b"), ("s1", 3, "c"),
      ("s2", 1, "d")).toDF("seq", "idx", "payload")
    val imaps = Seq(("s1", Map(1 -> 10, 2 -> 11)), ("s2", Map(1 -> 5)))
      .toDF("seq", "imap")
    val out = RowOps.applySequenceIndexMap(ann, imaps, Seq("seq"), "idx")
      .select("seq", "idx", "mapped_idx").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    assert(out == Map(("s1", 1) -> Some(10), ("s1", 2) -> Some(11),
      ("s1", 3) -> None, ("s2", 1) -> Some(5)))
  }

  test("dropConstantColumns: single-valued cols drop, '?' and varying stay") {
    val df = Seq(
      (1, "x", "?", Some("c"), Seq(1)),
      (2, "x", "?", None, Seq(2)),
      (3, "y", "?", Some("c"), Seq(3)))
      .toDF("id", "varies", "sentinel", "const_with_nulls", "arr")
    val (out, dropped) = RowOps.dropConstantColumns(df)
    // 'varies' has 2 values, '?' is the kept sentinel, the array
    // column is skipped (reference's list-like TypeError guard);
    // const_with_nulls collapses to one non-null value -> dropped
    assert(out.columns.toSeq == Seq("id", "varies", "sentinel", "arr"))
    assert(dropped == Map("const_with_nulls" -> "c"))
    // all-null column: zero distinct values -> kept (not one value)
    val df2 = Seq((1, None: Option[String]), (2, None)).toDF("id", "allnull")
    assert(RowOps.dropConstantColumns(df2)._1.columns.toSeq ==
      Seq("id", "allnull"))
  }

  test("scaledRatio divides by the category constant, null if unmapped") {
    val df = Seq(("A", 34.0), ("N", 47.0), ("X", 1.0)).toDF("k", "v")
    val out = RowOps.scaledRatio(df, "v", "k",
      Map("A" -> 17.0, "N" -> 23.5), "rsa")
    val rows = out.select("k", "rsa").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(rows == Map("A" -> Some(200.0), "N" -> Some(200.0), "X" -> None))
  }
}
