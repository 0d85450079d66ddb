package graft

import org.apache.spark.sql.functions._
import graft.functions.{HashedLinearScore, HashedLinearScoreHelper, PortableHash}
import org.apache.spark.sql.graft.ColumnBridge

class HashedLinearScoreSpec extends SparkSpec {
  import spark.implicits._

  private def scoreCol = ColumnBridge.column(
    HashedLinearScore(ColumnBridge.expression(split(col("text"), " "))))

  private def referenceScore(tokens: Seq[String]): Long =
    tokens.map { t =>
      val b = PortableHash.slot(PortableHash.hash(t), HashedLinearScoreHelper.Slot) %
        HashedLinearScoreHelper.D
      HashedLinearScoreHelper.weight(b)
    }.sum

  test("codegen'd score matches the straight-loop reference") {
    val texts = Seq("the quick brown fox", "a a a", "spark joins shuffle sort merge")
    val got = texts.toDF("text").select(scoreCol.as("s")).as[Long].collect()
    assert(got.toSeq == texts.map(t => referenceScore(t.split(" ").toSeq)))
  }

  test("multiset semantics: every occurrence votes") {
    val one = Seq("tok").toDF("text").select(scoreCol.as("s")).as[Long].head()
    val three = Seq("tok tok tok").toDF("text").select(scoreCol.as("s")).as[Long].head()
    assert(three == 3 * one)
  }

  test("weights span negative and positive buckets") {
    val ws = (0L until HashedLinearScoreHelper.D)
      .map(HashedLinearScoreHelper.weight).distinct.sorted
    assert(ws.head < 0 && ws.last > 0 && ws.contains(0L))
  }
}
