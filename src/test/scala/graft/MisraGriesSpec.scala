package graft

import org.apache.spark.sql.functions._
import graft.functions.MisraGriesAgg

import scala.util.Random

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  /** Direct (non-Spark) driver of the aggregator's algebra. */
  private def summarize(agg: MisraGriesAgg, items: Seq[String]): Map[String, Long] =
    items.foldLeft(agg.zero)(agg.reduce)

  test("MG guarantees hold on random streams: est <= true <= est + N/(k+1)") {
    val rnd = new Random(7)
    for (k <- Seq(4, 16, 64); trial <- 1 to 5) {
      val agg = new MisraGriesAgg(k)
      // Zipf-ish: token i drawn with weight ~ 1/(i+1)
      val n = 2000 + trial * 500
      val items = Seq.fill(n) {
        val i = math.min((1.0 / (rnd.nextDouble() + 1e-9)).toInt, 99)
        s"tok$i"
      }
      val sum = summarize(agg, items)
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(sum.size <= k)
      val bound = n.toDouble / (k + 1)
      exact.foreach { case (t, c) =>
        val est = sum.getOrElse(t, 0L)
        assert(est <= c, s"overestimate for $t: est=$est true=$c (k=$k)")
        assert(c - est <= bound, s"error above N/(k+1) for $t (k=$k)")
      }
    }
  }

  test("merge of split streams preserves the error bound and k-size cap") {
    val rnd = new Random(11)
    val k = 8
    val agg = new MisraGriesAgg(k)
    val items = Seq.fill(5000)(s"t${rnd.nextInt(40)}")
    // split into 7 shards, summarize each, merge pairwise in odd order
    val shards = items.grouped(800).map(sh => summarize(agg, sh)).toSeq
    val merged = shards.reduceLeft(agg.merge)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(merged.size <= k)
    val bound = items.size.toDouble / (k + 1)
    exact.foreach { case (t, c) =>
      val est = merged.getOrElse(t, 0L)
      assert(est <= c && c - est <= bound, s"merged bound broken for $t")
    }
  }

  test("every token above the N/(k+1) threshold is present in the summary") {
    val k = 4
    val agg = new MisraGriesAgg(k)
    // "hot" appears 40 times of N=100 > 100/5=20 -> must survive
    val items = Seq.fill(40)("hot") ++ (1 to 60).map(i => s"cold$i")
    val sum = summarize(agg, new Random(3).shuffle(items))
    assert(sum.contains("hot"))
  }

  test("udaf aggregates per group and matches exact counts within bound") {
    val rows = (1 to 1000).map { i =>
      val src = if (i % 2 == 0) "a" else "b"
      val tok = if (i % 3 == 0) "common" else s"rare${i % 97}"
      (src, tok)
    }
    val df = rows.toDF("source", "token")
    val out = df.groupBy($"source")
      .agg(MisraGriesAgg.udaf(16)($"token").as("summary"))
      .as[(String, Map[String, Long])].collect().toMap
    val exact = rows.groupBy(_._1).map { case (s, rs) =>
      s -> rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    }
    for ((src, sum) <- out; n = exact(src).values.sum) {
      assert(sum.size <= 16)
      exact(src).foreach { case (t, c) =>
        val est = sum.getOrElse(t, 0L)
        assert(est <= c && c - est <= n / 17.0)
      }
      // "common" has frequency ~1/3 >> 1/17 -> guaranteed resident
      assert(sum.contains("common"))
    }
  }
}
