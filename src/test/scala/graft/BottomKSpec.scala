package graft

import org.apache.spark.sql.functions._
import graft.functions.BottomKAgg

import scala.util.Random

class BottomKSpec extends SparkSpec {
  import spark.implicits._

  private def hash(id: Long): Long = (id * 48271L) % 2147483647L

  test("bottom-k equals the k globally-smallest hashes regardless of order") {
    val agg = new BottomKAgg(5)
    val ids = new Random(13).shuffle((0L until 200L).toVector)
    val got = ids.foldLeft(agg.zero)(agg.reduce)
    val want = ids.sortBy(hash).take(5).map(id => (hash(id), id))
    assert(got == want)
  }

  test("duplicate ids occupy one slot (sample of ids, not rows)") {
    val agg = new BottomKAgg(2)
    // hash(5) < hash(9) here; two observations of 5 must not crowd out 9
    val got = Seq(5L, 5L, 9L).foldLeft(agg.zero)(agg.reduce)
    assert(got.map(_._2) == Seq(5L, 9L))
    // same through merge
    val m = agg.merge(
      Seq(5L).foldLeft(agg.zero)(agg.reduce),
      Seq(5L, 9L).foldLeft(agg.zero)(agg.reduce))
    assert(m.map(_._2) == Seq(5L, 9L))
  }

  test("merge of shard summaries equals the unsharded bottom-k") {
    val agg = new BottomKAgg(7)
    val ids = new Random(17).shuffle((0L until 500L).toVector)
    val sharded = ids.grouped(90)
      .map(sh => sh.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    val direct = ids.foldLeft(agg.zero)(agg.reduce)
    assert(sharded == direct)
  }

  test("udaf sample is deterministic across repartitionings") {
    val df = (0L until 1000L).map(i => (s"g${i % 3}", i)).toDF("g", "id")
    def run(parts: Int): Map[String, Seq[Long]] = df.repartition(parts)
      .groupBy($"g").agg(BottomKAgg.udaf(4)($"id").as("s"))
      .as[(String, Seq[Long])].collect().toMap
    val a = run(1)
    val b = run(13)
    assert(a == b)
    // and each group's sample is its 4 smallest-hash ids
    a.foreach { case (g, s) =>
      val members = (0L until 1000L).filter(i => s"g${i % 3}" == g)
      assert(s == members.sortBy(hash).take(4))
    }
  }
}
