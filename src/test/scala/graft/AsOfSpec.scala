package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asofJoin: latest at-or-before build row per key, nulls before first") {
    val left = Seq(
      (1L, 10L, ts(5)),   // between builds at 3 and 7 → picks 3
      (2L, 10L, ts(7)),   // EQUAL to build ts 7 → <= includes it
      (3L, 10L, ts(1)),   // before any build → null
      (4L, 20L, ts(9)),   // different key, one build at 2
      (5L, 30L, ts(9)))   // key with no builds at all → null
      .toDF("id", "k", "ts")
    val right = Seq(
      (10L, ts(3), "a"), (10L, ts(7), "b"), (10L, ts(8), "c"),
      (20L, ts(2), "x"))
      .toDF("k", "ts", "v")
    val got = AsOf.asofJoin(left, right, Seq("k"), "ts", "ts")
      .select("id", "v_asof").as[(Long, Option[String])].collect().toMap
    assert(got == Map(
      1L -> Some("a"), 2L -> Some("b"), 3L -> None,
      4L -> Some("x"), 5L -> None))
  }

  test("asofJoin takes the latest build ROW whole — null fields not stitched") {
    // latest build row has label=null: the probe must see THAT row's
    // (null, 7), never a chimera of t1's label with t2's version
    val left = Seq((1L, "k", ts(9))).toDF("id", "k", "ts")
    val right = Seq(
      ("k", ts(1), Some("s1"), None: Option[Long]),
      ("k", ts(2), None: Option[String], Some(7L)))
      .toDF("k", "ts", "label", "version")
    val row = AsOf.asofJoin(left, right, Seq("k"), "ts", "ts").collect().head
    assert(row.isNullAt(row.fieldIndex("label_asof")))
    assert(row.getAs[Long]("version_asof") == 7L)
  }

  test("asofJoin carries multiple payload columns and keeps left columns") {
    val left = Seq((1L, "k1", ts(5), 99.0)).toDF("id", "k", "ts", "amount")
    val right = Seq(("k1", ts(4), "s1", 7L)).toDF("k", "ts", "label", "version")
    val row = AsOf.asofJoin(left, right, Seq("k"), "ts", "ts").collect().head
    assert(row.getAs[Long]("id") == 1L)
    assert(row.getAs[Double]("amount") == 99.0)
    assert(row.getAs[String]("label_asof") == "s1")
    assert(row.getAs[Long]("version_asof") == 7L)
  }
}
