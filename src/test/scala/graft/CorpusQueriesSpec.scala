package graft

import org.apache.spark.sql.functions._
import graft.queries.CorpusQueries

class CorpusQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q90 prefix filter finds exactly the all-pairs qualifying set") {
    // completeness check independent of the DuckDB oracle: brute-force
    // within-source all-pairs Jaccard at τ = 0.8 over the real testdata
    // must equal the prefix-filtered join's output
    val docs = graft.runtime.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        array_distinct(graft.operators.TextAnalysis.wsTokens(col("text")))
          .as("toks"))
    val brute = docs.as("a").join(docs.as("b"),
        col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.source").as("source"),
        col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        size(array_intersect(col("a.toks"), col("b.toks"))).cast("long")
          .as("n_common"),
        size(array_union(col("a.toks"), col("b.toks"))).cast("long")
          .as("n_union"))
      .filter(col("n_common") * 5 >= col("n_union") * 4)
    val fast = CorpusQueries.q90PrefixJoin(spark, sfDir)
    assert(fast.count() > 0, "no qualifying pairs in testdata — weak test")
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty,
      "prefix-filtered join must equal brute-force all-pairs")
  }

  test("q91 BM25: rarer term outscores a commoner term at equal tf/dl") {
    import spark.implicits._
    val rows = CorpusQueries.q91Bm25(spark, sfDir)
    assert(rows.count() > 0)
    // same doc, same tf: the rarer (lower-df) term must score higher —
    // idf is strictly decreasing in df while the tf/dl factor is fixed
    val perDoc = rows.select("doc_id", "term", "tf", "df", "score")
      .as[(Long, String, Long, Long, Double)].collect()
      .groupBy(_._1).values
    perDoc.foreach { docRows =>
      for {
        a <- docRows; b <- docRows
        if a._3 == b._3 && a._4 < b._4
      } assert(a._5 > b._5,
        s"doc ${a._1}: term ${a._2} (df=${a._4}) must outscore ${b._2} (df=${b._4}) at equal tf")
    }
  }

  test("q92 gap fill: spine is dense, fills carry forward, gaps flagged") {
    import spark.implicits._
    val out = CorpusQueries.q92GapFill(spark, sfDir)
    val types = out.select("event_type").distinct().count()
    val days = out.select("day").distinct().count()
    assert(out.count() === types * days * 24, "spine must be dense")
    // flagged gaps exist in hourly granularity at sf0.001 and every
    // filled value is non-negative
    assert(out.filter(col("was_gap") === 1).count() > 0)
    assert(out.filter(col("n_filled") < 0).count() === 0)
    // forward fill: a gap slot's n_filled equals the previous slot's
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day", "hr")
    val bad = out.withColumn("prev", lag(col("n_filled"), 1).over(w))
      .filter(col("was_gap") === 1 && col("prev").isNotNull &&
        col("n_filled") =!= col("prev"))
    assert(bad.isEmpty, "gap slots must carry the previous filled value")
  }
}
