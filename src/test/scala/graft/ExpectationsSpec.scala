package graft

import org.apache.spark.sql.functions._
import graft.ops.Expectations
import graft.ops.Expectations.Rule

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    Rule("id_present", col("id").isNotNull),
    Rule("value_positive", col("value") > 0),
    Rule("country_known", col("country").isin("US", "DE", "FR")))

  private def fixture = Seq(
    (Some(1L), Some(10.0), "US"),   // clean
    (Some(2L), Some(-3.0), "DE"),   // one failure
    (None, Some(5.0), "XX"),        // two failures
    (Some(4L), None, "FR")          // null predicate = violation
  ).toDF("id", "value", "country")

  test("enforce partitions rows exhaustively and exclusively") {
    val (clean, bad) = Expectations.enforce(fixture, rules)
    assert(clean.count() + bad.count() == 4)
    assert(clean.columns.toSeq == Seq("id", "value", "country"))
    assert(bad.columns.toSeq ==
      Seq("id", "value", "country", "failed_rules"))
    assert(clean.collect().map(_.getAs[Long]("id")).toSeq == Seq(1L))
  }

  test("quarantine carries the COMPLETE violated-rule list, in rule order") {
    val (_, bad) = Expectations.enforce(fixture, rules)
    val byId = bad.collect()
      .map(r => (Option(r.getAs[Any]("id")),
        r.getSeq[String](r.fieldIndex("failed_rules")).toList)).toMap
    assert(byId(Some(2L)) == List("value_positive"))
    assert(byId(None) == List("id_present", "country_known"))
  }

  test("a NULL-valued predicate is a violation, not a pass") {
    val (_, bad) = Expectations.enforce(fixture, rules)
    val row4 = bad.filter(col("id") === 4L).collect()
    assert(row4.length == 1)
    assert(row4(0).getSeq[String](row4(0).fieldIndex("failed_rules"))
      .toList == List("value_positive"))
  }

  test("tag refuses a colliding output column; enforce is rename-safe") {
    val withCol = fixture.withColumn("failed_rules", lit("x"))
    intercept[IllegalArgumentException] {
      Expectations.tag(withCol, rules)
    }
    val (clean, bad) =
      Expectations.enforce(withCol, rules, failedCol = "dq_failed")
    assert(clean.columns.contains("failed_rules")) // user data untouched
    assert(bad.columns.contains("dq_failed"))
  }
}
