package graft

import org.apache.spark.sql.functions._
import graft.functions.{CountMinAgg, PortableHash}

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 64

  private def sketchOf(tokens: Seq[String], parts: Int): Seq[Long] =
    tokens.toDF("t").repartition(parts)
      .agg(CountMinAgg.udaf(depth, width)(col("t")).as("cm"))
      .as[Seq[Long]].collect().head

  private def estimate(cm: Seq[Long], token: String): Long = {
    val h = PortableHash.hash(token)
    (0 until depth)
      .map(i => cm(i * width + (PortableHash.slot(h, i) % width).toInt))
      .min
  }

  test("sketch is partition-invariant (linear merge)") {
    val tokens = (0 until 500).map(i => s"tok${i % 37}")
    assert(sketchOf(tokens, 1) == sketchOf(tokens, 8))
  }

  test("estimates never under-count and are exact without collisions") {
    val tokens = Seq.fill(20)("alpha") ++ Seq.fill(7)("beta") ++
      (0 until 30).map(i => s"noise$i")
    val cm = sketchOf(tokens, 4)
    val trueCounts = tokens.groupBy(identity).view.mapValues(_.size.toLong)
    trueCounts.foreach { case (t, n) =>
      assert(estimate(cm, t) >= n, s"CM under-counted $t")
    }
    // total mass per row is conserved: each row's counters sum to N
    val n = tokens.size.toLong
    (0 until depth).foreach { i =>
      assert(cm.slice(i * width, (i + 1) * width).sum == n)
    }
  }

  test("grouped sketches stay independent per group") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"))
      .toDF("g", "t")
    val rows = df.groupBy(col("g"))
      .agg(CountMinAgg.udaf(depth, width)(col("t")).as("cm"))
      .as[(String, Seq[Long])].collect().toMap
    assert(estimate(rows("a"), "x") >= 2L)
    assert(estimate(rows("b"), "x") == 1L)
    // group b never saw y's increments beyond collisions: row sums are 1
    (0 until depth).foreach { i =>
      assert(rows("b").slice(i * width, (i + 1) * width).sum == 1L)
    }
  }
}
