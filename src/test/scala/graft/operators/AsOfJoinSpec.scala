package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import sqlImplicits._

  test("asOf picks latest right row at-or-before, per key") {
    val left = Seq((1L, 100L, "l1"), (1L, 250L, "l2"), (2L, 50L, "l3"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, 100L, "r@100"), (1L, 200L, "r@200"),
      (2L, 60L, "r@60")).toDF("rk", "rts", "rv")
    val out = AsOfJoin.asOf(left, right, "k", "rk", "ts", "rts", Seq("rv"))
      .orderBy("ts").select("lv", "rv")
      .as[(String, Option[String])].collect().toSeq
    // l1@100 ties with r@100 → matched (<= semantics)
    // l2@250 → r@200; l3@50 → no error yet → null
    assert(out == Seq(("l3", None), ("l1", Some("r@100")),
      ("l2", Some("r@200"))))
  }

  test("asOf matches brute force on random data") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    // right ts globally unique (13 coprime to 991) → deterministic winner
    val right = (1 to 200).map(i =>
      (rnd.nextInt(5).toLong, ((i * 13) % 991).toLong, i.toLong))
    val lDf = left.toDF("k", "ts", "lid")
    val rDf = right.toDF("rk", "rts", "rid")
    val got = AsOfJoin.asOf(lDf, rDf, "k", "rk", "ts", "rts", Seq("rid"))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    val want = left.map { case (k, ts, lid) =>
      val cands = right.filter(r => r._1 == k && r._2 <= ts)
      lid -> (if (cands.isEmpty) None
        else Some(cands.maxBy(_._2)._3))
    }.toMap
    assert(got == want)
  }

  test("asOfForward picks earliest at-or-after; ties match") {
    val left = Seq((1L, 100L, "l1"), (1L, 250L, "l2"), (2L, 90L, "l3"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, 100L, "r@100"), (1L, 200L, "r@200"),
      (2L, 60L, "r@60")).toDF("rk", "rts", "rv")
    val out = AsOfJoin.asOfForward(left, right, "k", "rk", "ts", "rts",
        Seq("rv"))
      .orderBy("ts").select("lv", "rv")
      .as[(String, Option[String])].collect().toSeq
    // l3@90: the only error was earlier → null (forward looks ahead)
    assert(out == Seq(("l3", None), ("l1", Some("r@100")),
      ("l2", None)))
  }

  test("asOfForward and asOfNearest match brute force on random data") {
    val rnd = new scala.util.Random(29)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val right = (1 to 200).map(i =>
      (rnd.nextInt(5).toLong, ((i * 13) % 991).toLong, i.toLong))
    val lDf = left.toDF("k", "ts", "lid")
    val rDf = right.toDF("rk", "rts", "rid")
    val fGot = AsOfJoin.asOfForward(lDf, rDf, "k", "rk", "ts", "rts",
      Seq("rid")).select("lid", "rid")
      .as[(Long, Option[Long])].collect().toMap
    val fWant = left.map { case (k, ts, lid) =>
      val cands = right.filter(r => r._1 == k && r._2 >= ts)
      lid -> (if (cands.isEmpty) None else Some(cands.minBy(_._2)._3))
    }.toMap
    assert(fGot == fWant)
    val nGot = AsOfJoin.asOfNearest(lDf, rDf, "k", "rk", "ts", "rts",
      Seq("rid")).select("lid", "rid")
      .as[(Long, Option[Long])].collect().toMap
    val nWant = left.map { case (k, ts, lid) =>
      val cands = right.filter(_._1 == k)
      lid -> (if (cands.isEmpty) None
        else Some(cands.minBy(r =>
          // distance, then backward-wins, then the unique ts
          (math.abs(r._2 - ts), if (r._2 <= ts) 0 else 1, r._2))._3))
    }.toMap
    assert(nGot == nWant)
  }

  test("asOfNearest: exact-distance tie goes to the backward row") {
    val left = Seq((1L, 100L, "l")).toDF("k", "ts", "lv")
    val right = Seq((1L, 90L, "bwd"), (1L, 110L, "fwd"))
      .toDF("rk", "rts", "rv")
    val out = AsOfJoin.asOfNearest(left, right, "k", "rk", "ts", "rts",
      Seq("rv")).select("rv").as[String].head()
    assert(out == "bwd")
  }
}
