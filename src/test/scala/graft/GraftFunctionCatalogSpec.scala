package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.queries.OracleIdioms

/** Catalog-scoped SQL functions ([[graft.sources.GraftFunctions]] via
  * the [[graft.sources.GraftCatalog]] FunctionCatalog surface):
  * `SELECT <cat>.fn.token_count(text)` resolving with no extension
  * install, the scalar magic-method path, and the V2 aggregate
  * partial/merge contract.
  */
class GraftFunctionCatalogSpec extends SparkSpec {

  private var n = 0
  private def freshCatalog(): String = {
    n += 1
    val name = s"gfn${n}_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", tmpDir(s"graft-fncat-$name"))
    name
  }

  test("token_count resolves by catalog name and matches the expression-tier semantics") {
    val cat = freshCatalog()
    import spark.implicits._
    val docs = Seq(
      "one two  three", "  lead and trail  ", "", "   ", "single",
      "tab\tsep\nnewline", null.asInstanceOf[String]).toDF("text")
    docs.createOrReplaceTempView("fn_docs")
    val got = spark.sql(s"SELECT $cat.fn.token_count(text) AS n FROM fn_docs")
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
    // the established portable tokenization: non-empty ws tokens; null in -> null out
    val want = docs.select(
      when(col("text").isNull, lit(-1))
        .otherwise(size(OracleIdioms.wsTokensNonEmpty(col("text")))).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == want)
    assert(got == Seq(3, 3, 0, 0, 1, 3, -1))
  }

  test("portable_hash matches the extension-injected expression on real text") {
    val cat = freshCatalog()
    import spark.implicits._
    Seq("alpha", "beta gamma", "", "x").toDF("s").createOrReplaceTempView("fn_hash")
    val rows = spark.sql(
      s"""SELECT $cat.fn.portable_hash(s) AS viaCatalog,
         |       portable_string_hash(s) AS viaExtension
         |FROM fn_hash""".stripMargin).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("simhash64 and cosine_sim match their extension-injected expression twins") {
    val cat = freshCatalog()
    import spark.implicits._
    Seq("alpha beta gamma", "alpha beta delta", "x")
      .toDF("text").createOrReplaceTempView("fn_sim")
    spark.sql(
      s"""SELECT $cat.fn.simhash64(split(text, ' ')) AS viaCatalog,
         |       simhash64(split(text, ' ')) AS viaExtension
         |FROM fn_sim""".stripMargin)
      .collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
    Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 2.0f, 3.0f))) // zero norm -> null
      .toDF("a", "b").createOrReplaceTempView("fn_cos")
    val rows = spark.sql(
      s"""SELECT $cat.fn.cosine_sim(a, b) AS viaCatalog,
         |       cosine_sim(a, b) AS viaExtension
         |FROM fn_cos""".stripMargin).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1)) // bit-identical
    }
    assert(rows.count(_.isNullAt(0)) == 1)
  }

  test("sum_sq aggregates with partial state across many partitions, skipping nulls") {
    val cat = freshCatalog()
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i % 7, if (i % 13 == 0) None else Some(i)))
      .toDF("g", "x").repartition(16)
    df.createOrReplaceTempView("fn_sumsq")
    val got = spark.sql(
      s"SELECT g, $cat.fn.sum_sq(x) AS ss FROM fn_sumsq GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (1L to 1000L).filter(_ % 13 != 0).groupBy(_ % 7)
      .view.mapValues(_.map(i => i * i).sum).toMap
    assert(got == want)
    // ungrouped + all-null group: additive identity, not NULL
    val empty = spark.sql(
      s"SELECT $cat.fn.sum_sq(x) AS ss FROM fn_sumsq WHERE x IS NULL")
      .collect().head
    assert(!empty.isNullAt(0) && empty.getLong(0) == 0L)
  }

  test("scalar functions compose inside ordinary aggregates and codegen plans") {
    val cat = freshCatalog()
    import spark.implicits._
    Seq(("en", "a b c"), ("en", "d e"), ("de", "f")).toDF("lang", "text")
      .createOrReplaceTempView("fn_compose")
    val got = spark.sql(
      s"""SELECT lang, sum($cat.fn.token_count(text)) AS toks
         |FROM fn_compose GROUP BY lang""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("en" -> 5L, "de" -> 1L))
  }

  test("unknown names and table namespaces refuse cleanly; fn namespace is reserved") {
    val cat = freshCatalog()
    val e1 = intercept[AnalysisException](
      spark.sql(s"SELECT $cat.fn.no_such_fn(1)").collect())
    assert(e1.getMessage.toLowerCase.contains("no_such_fn"))
    // functions live only under fn (or the bare catalog): a data
    // namespace does not serve them
    spark.sql(s"CREATE NAMESPACE $cat.ods")
    val e2 = intercept[AnalysisException](
      spark.sql(s"SELECT $cat.ods.token_count('a b')").collect())
    assert(e2.getMessage.toLowerCase.contains("token_count"))
    // the reserved namespace cannot be created (Spark's pre-check sees
    // it as already existing) or dropped (the catalog refuses)
    val e3 = intercept[Exception](spark.sql(s"CREATE NAMESPACE $cat.fn"))
    assert(e3.getMessage.contains("reserved") ||
      e3.getMessage.contains("already exists"))
    assert(intercept[Exception](
      spark.sql(s"DROP NAMESPACE $cat.fn")).getMessage.contains("reserved"))
    // but it lists, and lists its functions
    assert(spark.sql(s"SHOW NAMESPACES IN $cat").collect()
      .map(_.getString(0)).contains("fn"))
    assert(spark.sql(s"SHOW FUNCTIONS IN $cat.fn").collect()
      .map(_.getString(0).toLowerCase).exists(_.contains("token_count")))
  }
}
