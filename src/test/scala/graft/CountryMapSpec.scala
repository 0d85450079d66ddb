package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.CountryMap

class CountryMapSpec extends SparkSpec {
  import spark.implicits._

  private def normalized(names: Seq[String]): Seq[String] =
    names.toDF("c").select(CountryMap.normalize(col("c"))).as[String].collect().toSeq

  test("all 15 reference mappings (process_covid_ods.py:42-59)") {
    val (from, to) = CountryMap.mapping.unzip
    assert(normalized(from) == to)
  }

  test("unmapped names pass through") {
    assert(normalized(Seq("France", "Japan")) == Seq("France", "Japan"))
  }

  test("property: normalization is idempotent (scalacheck-generated names)") {
    val gen = Gen.oneOf(
      Gen.oneOf(CountryMap.mapping.map(_._1)),
      Gen.alphaStr.suchThat(_.nonEmpty))
    val names = Gen.listOfN(60, gen).apply(Gen.Parameters.default, Seed(42L)).get
    val once = normalized(names)
    assert(normalized(once) == once)
  }
}
