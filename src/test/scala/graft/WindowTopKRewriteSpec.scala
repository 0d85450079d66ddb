package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{TopKPerGroup, WindowTopKRewrite}

/** The auto-rewrite of `row_number().over(...).filter(rank <= k)` into
  * the bounded-heap TopKPerGroup operator: plan shape, exact semantics
  * against the un-rewritten window path, and the negative cases that
  * must keep their WindowExec.
  */
class WindowTopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def fixture: DataFrame =
    (0L until 300L).map(i => (i, s"g${i % 7}", (i * 37 % 101).toInt))
      .toDF("id", "grp", "score")

  private def topkSpelled(df: DataFrame): DataFrame = df
    .withColumn("rk", row_number().over(
      Window.partitionBy(col("grp")).orderBy(col("score").desc, col("id"))))
    .filter(col("rk") <= 3)

  // assert at the optimized-logical level — the level the rule
  // transforms, and AQE-proof (executedPlan hides behind the adaptive
  // wrapper until execution)
  private def hasTopK(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(_.isInstanceOf[TopKPerGroup])

  private def hasWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Window])

  test("the window top-k idiom plans as TopKPerGroup with no Window") {
    val df = topkSpelled(fixture)
    assert(hasTopK(df), s"expected TopKPerGroup in:\n${df.queryExecution.optimizedPlan}")
    assert(!hasWindow(df), "the Window node must be gone")
  }

  test("rewritten results equal the pure window path exactly") {
    val expected = withFlag("false") { topkSpelled(fixture).collect().toSet }
    val got = topkSpelled(fixture).collect().toSet
    assert(got == expected)
    assert(got.size == 21) // 7 groups x top-3
  }

  test("SQL through the session gets the rewrite too") {
    fixture.createOrReplaceTempView("wtr_fixture")
    val df = spark.sql(
      """SELECT * FROM (
        |  SELECT id, grp, score, row_number() OVER (
        |    PARTITION BY grp ORDER BY score DESC, id) AS rk
        |  FROM wtr_fixture) WHERE rk <= 2""".stripMargin)
    assert(hasTopK(df), "SQL spelling must hit the same rewrite")
    assert(df.count() == 14)
  }

  test("equality and strict bounds keep exact filter semantics") {
    val base = fixture
    val eq = base.withColumn("rk", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("score").desc, col("id"))))
      .filter(col("rk") === 2)
    assert(hasTopK(eq), "rank = k is a valid top-k bound")
    val expected = withFlag("false") {
      topkSpelled(base).filter(col("rk") === 2).collect().toSet
    }
    assert(eq.collect().toSet == expected)
    assert(eq.count() == 7, "exactly the rank-2 row of each group")

    val lt = base.withColumn("rk", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("score").desc, col("id"))))
      .filter(col("rk") < 3)
    assert(hasTopK(lt) && lt.count() == 14)
  }

  test("rank(), multi-expression windows, and unbounded filters are untouched") {
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("id"))
    val rankFn = fixture.withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
    assert(!hasTopK(rankFn) && hasWindow(rankFn),
      "rank() has different tie semantics and must keep its window")
    val multi = fixture
      .withColumn("rk", row_number().over(w))
      .withColumn("mx", max(col("score")).over(w))
      .filter(col("rk") <= 3)
    assert(!hasTopK(multi) && hasWindow(multi),
      "a window computing more than row_number must stay")
    val lower = fixture.withColumn("rk", row_number().over(w))
      .filter(col("rk") >= 3)
    assert(!hasTopK(lower) && hasWindow(lower),
      "a lower bound on rank is not a top-k")
  }

  test("the conf flag disables the rewrite") {
    withFlag("false") {
      val df = topkSpelled(fixture)
      assert(!hasTopK(df) && hasWindow(df))
    }
  }

  private def withFlag[T](v: String)(body: => T): T = {
    val old = spark.conf.getOption(WindowTopKRewrite.ConfKey)
    spark.conf.set(WindowTopKRewrite.ConfKey, v)
    try body
    finally old match {
      case Some(o) => spark.conf.set(WindowTopKRewrite.ConfKey, o)
      case None => spark.conf.unset(WindowTopKRewrite.ConfKey)
    }
  }
}
