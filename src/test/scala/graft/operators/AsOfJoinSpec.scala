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

  test("rightTieBreak pins equal-ts right rows to the min id, all " +
    "directions") {
    // three right rows share key 1 / ts 100 — without a tie-break the
    // carried payload is partition-order-dependent; with one it must
    // be the min rid for backward, forward, and nearest alike
    val left = Seq((1L, 100L, "at"), (1L, 150L, "after"),
      (1L, 50L, "before")).toDF("k", "ts", "lv")
    val right = Seq((1L, 100L, 7L, "r7"), (1L, 100L, 3L, "r3"),
      (1L, 100L, 5L, "r5")).toDF("rk", "rts", "rid", "rv")
    def got(f: => org.apache.spark.sql.DataFrame) =
      f.orderBy("ts").select("lv", "rid")
        .as[(String, Option[Long])].collect().toSeq
    assert(got(AsOfJoin.asOf(left, right, "k", "rk", "ts", "rts",
      Seq("rid", "rv"), Seq("rid"))) ==
      Seq(("before", None), ("at", Some(3L)), ("after", Some(3L))))
    assert(got(AsOfJoin.asOfForward(left, right, "k", "rk", "ts", "rts",
      Seq("rid", "rv"), Seq("rid"))) ==
      Seq(("before", Some(3L)), ("at", Some(3L)), ("after", None)))
    assert(got(AsOfJoin.asOfNearest(left, right, "k", "rk", "ts", "rts",
      Seq("rid", "rv"), Seq("rid"))) ==
      Seq(("before", Some(3L)), ("at", Some(3L)), ("after", Some(3L))))
  }

  test("rightTieBreak matches brute force under heavy ts collisions") {
    val rnd = new scala.util.Random(47)
    val left = (1 to 200).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(30).toLong, i.toLong))
    // ts range of 30 over 150 right rows → many equal-(k, ts) groups
    val right = (1 to 150).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(30).toLong, i.toLong))
    val lDf = left.toDF("k", "ts", "lid").repartition(7)
    val rDf = right.toDF("rk", "rts", "rid").repartition(5)
    def want(pick: (Long, Long) => Option[Long]) =
      left.map { case (k, ts, lid) => lid -> pick(k, ts) }.toMap
    val bGot = AsOfJoin.asOf(lDf, rDf, "k", "rk", "ts", "rts",
      Seq("rid"), Seq("rid")).select("lid", "rid")
      .as[(Long, Option[Long])].collect().toMap
    assert(bGot == want((k, ts) => {
      val c = right.filter(r => r._1 == k && r._2 <= ts)
      if (c.isEmpty) None
      else Some(c.minBy(r => (-r._2, r._3))._3) // max ts, then min rid
    }))
    val fGot = AsOfJoin.asOfForward(lDf, rDf, "k", "rk", "ts", "rts",
      Seq("rid"), Seq("rid")).select("lid", "rid")
      .as[(Long, Option[Long])].collect().toMap
    assert(fGot == want((k, ts) => {
      val c = right.filter(r => r._1 == k && r._2 >= ts)
      if (c.isEmpty) None
      else Some(c.minBy(r => (r._2, r._3))._3) // min ts, then min rid
    }))
    val nGot = AsOfJoin.asOfNearest(lDf, rDf, "k", "rk", "ts", "rts",
      Seq("rid"), Seq("rid")).select("lid", "rid")
      .as[(Long, Option[Long])].collect().toMap
    assert(nGot == want((k, ts) => {
      val c = right.filter(_._1 == k)
      if (c.isEmpty) None
      else Some(c.minBy(r => (math.abs(r._2 - ts),
        if (r._2 <= ts) 0 else 1, r._3))._3)
    }))
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
