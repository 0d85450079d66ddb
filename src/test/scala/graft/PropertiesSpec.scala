package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.{Gen, rng}
import graft.functions.Exprs

/** Generator-driven property checks from SURVEY §5.4. Data is generated
  * with ScalaCheck Gens (fixed seed → deterministic) and evaluated in
  * one Spark pass per property.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    var seed = rng.Seed(42L)
    (0 until n).flatMap { _ =>
      seed = seed.next
      g.apply(params, seed)
    }
  }

  test("property: GREATEST(COALESCE(Δ,0),0) is never negative, any series") {
    val rows = sample(
      for {
        country <- Gen.oneOf("AA", "BB", "CC")
        day <- Gen.choose(1, 50)
        total <- Gen.choose(-1000000L, 1000000L)
      } yield (country, day, total), 400)
    val df = rows.toDF("country", "day", "total")
      .groupBy("country", "day").agg(max("total").as("total"))
    val w = Window.partitionBy($"country").orderBy($"day")
    val deltas = df.withColumn("clamped",
      greatest(coalesce($"total" - lag($"total", 1).over(w), lit(0L)), lit(0L)))
    assert(deltas.filter($"clamped" < 0).isEmpty)
    // and it equals max(raw delta, 0) wherever a predecessor exists
    val mismatch = deltas
      .withColumn("raw", $"total" - lag($"total", 1).over(w))
      .filter($"raw".isNotNull && $"clamped" =!= greatest($"raw", lit(0L)))
    assert(mismatch.isEmpty)
  }

  test("property: surrogate keys are 64-hex, injective per (name,year), case/pad-insensitive") {
    val pairs = sample(
      for {
        name <- Gen.alphaStr.map(_.take(12)).suchThat(_.nonEmpty)
        year <- Gen.choose(2000, 2030)
      } yield (name, year), 300).distinct
    val df = pairs.toDF("name", "year")
      .select($"name", $"year",
        Exprs.surrogateKey($"name", $"year").as("key"),
        Exprs.surrogateKey(concat(lit("  "), $"name", lit(" ")), $"year").as("padded"),
        Exprs.surrogateKey(upper($"name"), $"year").as("uppered"))
    // shape: 64 lowercase hex chars
    assert(df.filter(not($"key".rlike("^[0-9a-f]{64}$"))).isEmpty)
    // invariance under trim + case (the normalization inside the key)
    assert(df.filter($"key" =!= $"padded" || $"key" =!= $"uppered").isEmpty)
    // injectivity on the normalized domain: distinct (upper(name), year)
    // must give distinct keys
    val normDistinct = df.select(upper($"name"), $"year").distinct().count()
    val keyDistinct = df.select($"key").distinct().count()
    assert(keyDistinct == normDistinct)
  }

  test("property: sessionization matches a brute-force per-user reference") {
    val rows = sample(
      for {
        user <- Gen.choose(1L, 5L)
        tsOffsetSec <- Gen.choose(0L, 200000L)
        value <- Gen.choose(0, 100)
      } yield (user, tsOffsetSec, value.toDouble), 300)
      .zipWithIndex
      .map { case ((u, off, v), i) =>
        (i.toLong, u, new java.sql.Timestamp(1700000000000L + off * 1000L), v)
      }
    val df = rows.toDF("event_id", "user_id", "ts", "value")
    val got = graft.operators.Sessionize.withSessionIds(df, gapSec = 1800)
      .select($"event_id", $"session_seq").as[(Long, Long)].collect().toMap
    // brute force: per user, sort by (ts, event_id), bump on gap > 1800s
    rows.groupBy(_._2).foreach { case (_, evs) =>
      var seq = 0L
      var last = Long.MinValue
      evs.sortBy(e => (e._3.getTime, e._1)).foreach { case (id, _, ts, _) =>
        if (last == Long.MinValue || ts.getTime - last > 1800 * 1000L) seq += 1
        last = ts.getTime
        assert(got(id) == seq, s"event $id expected session $seq")
      }
    }
  }

  test("property: country normalization is total and idempotent over random strings") {
    val names = sample(Gen.asciiPrintableStr.map(_.take(20)), 300)
    val df = names.toDF("c")
      .select($"c", graft.ops.CountryMap.normalize($"c").as("n1"))
      .select($"c", $"n1", graft.ops.CountryMap.normalize($"n1").as("n2"))
    // total: never null for non-null input
    assert(df.filter($"n1".isNull).isEmpty)
    // idempotent: normalizing twice changes nothing
    assert(df.filter($"n1" =!= $"n2").isEmpty)
  }
}
