package graft

import org.apache.spark.sql.functions._
import graft.queries.RelationalQueries
import graft.runtime.Tables

/** Semantic checks for the round-4 relational tier, independent of the
  * DuckDB oracle (which is the primary gate at 3 SFs): each assertion
  * recomputes the claim a different way or checks a structural
  * invariant the query must satisfy on any input.
  */
class RelationalQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("q51: per-source ranks are contiguous from 1 and capped at 3") {
    val rows = RelationalQueries.q51Tfidf(spark, sfDir)
      .select($"source", $"rk").as[(String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    rows.foreach { case (src, rks) =>
      assert(rks == (1 to rks.size), s"$src ranks not contiguous: $rks")
      assert(rks.size <= 3)
    }
  }

  test("q51: a token present in every source scores exactly zero") {
    val nSources = Tables.load(spark, sfDir, "documents")
      .select($"source").distinct().count()
    val d = RelationalQueries.q51Tfidf(spark, sfDir)
    assert(d.filter($"df" === nSources && $"score_q" =!= 0).isEmpty,
      "ln(N/df)=ln(1)=0 must zero the score when df = n_sources")
  }

  test("q52: grand-total row equals corpus count; cells sum to it") {
    val cube = RelationalQueries.q52Cube(spark, sfDir)
    val total = Tables.load(spark, sfDir, "documents").count()
    val grand = cube.filter($"gid" === 3).select($"n_docs").as[Long].head()
    val cells = cube.filter($"gid" === 0).agg(sum($"n_docs")).as[Long].head()
    assert(grand == total && cells == total)
  }

  test("q53: cohorts partition the viewer/purchaser universe disjointly") {
    val r = RelationalQueries.q53SetOps(spark, sfDir)
      .as[(String, Long)].collect()
    val byCohort = r.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val both = byCohort.getOrElse("both", Set())
    val vOnly = byCohort.getOrElse("view_only", Set())
    val pOnly = byCohort.getOrElse("purchase_only", Set())
    assert((both & vOnly).isEmpty && (both & pOnly).isEmpty && (vOnly & pOnly).isEmpty)
    // no user appears twice anywhere (the three branches are disjoint)
    assert(r.length == both.size + vOnly.size + pOnly.size)
  }

  test("q54: semi join equals the distinct inner-join projection") {
    val viaSemi = RelationalQueries.q54SemiJoin(spark, sfDir)
      .select($"c_custkey").as[Long].collect().toSet
    val c = Tables.load(spark, sfDir, "customer")
    val o = Tables.load(spark, sfDir, "orders").filter($"o_totalprice" > 400000.0)
    val viaInner = c.join(o, c("c_custkey") === o("o_custkey"))
      .select($"c_custkey").distinct().as[Long].collect().toSet
    assert(viaSemi == viaInner && viaSemi.nonEmpty)
  }

  test("q55: rank-family invariants hold per partition") {
    val r = RelationalQueries.q55WindowRank(spark, sfDir)
    assert(r.filter($"pct_rank" < 0 || $"pct_rank" > 1).isEmpty)
    assert(r.filter($"cume" <= 0 || $"cume" > 1).isEmpty)
    // first-of-partition is the doc with the minimal (n_chars, doc_id)
    val firsts = r.groupBy($"source").agg(
      min(struct($"n_chars", $"doc_id")).getField("doc_id").as("expect"),
      first($"shortest_doc").as("got"))
    assert(firsts.filter($"expect" =!= $"got").isEmpty)
    // ntile quartile sizes differ by at most one
    val spread = r.groupBy($"source", $"quartile").count()
      .groupBy($"source").agg((max($"count") - min($"count")).as("d"))
    assert(spread.filter($"d" > 1).isEmpty)
  }

  test("q56: tumbling windows cover every event exactly once, 1h wide") {
    val r = RelationalQueries.q56TimeWindow(spark, sfDir)
    val total = r.agg(sum($"n_events")).as[Long].head()
    assert(total == Tables.load(spark, sfDir, "events").count())
    val widths = r.select(
      (unix_timestamp($"window_end") - unix_timestamp($"window_start")).as("w"))
    assert(widths.filter($"w" =!= 3600L).isEmpty)
  }

  test("q58: two-phase distinct equals the direct count-distinct") {
    val twoPhase = RelationalQueries.q58SkewDistinct(spark, sfDir)
      .as[(String, Long, Long)].collect().toSet
    val direct = Tables.load(spark, sfDir, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_distinct"), count(lit(1)).as("n_rows"))
      .as[(String, Long, Long)].collect().toSet
    assert(twoPhase == direct)
  }

  test("q60: RANGE-frame rolling sums equal an inequality-join recomputation") {
    val r = RelationalQueries.q60RollingWindow(spark, sfDir)
      .transform(graft.runtime.Materialize.once)
    val a = r.select($"user_id", $"day", $"rolling_cents", $"rolling_events")
    val b = r.select($"user_id".as("u2"), $"day".as("d2"),
      $"cents".as("c2"), $"n_events".as("n2"))
    val recomputed = a.join(b,
        $"user_id" === $"u2" &&
          $"d2" >= date_sub($"day", 6) && $"d2" <= $"day")
      .groupBy($"user_id", $"day", $"rolling_cents", $"rolling_events")
      .agg(sum($"c2").as("rc"), sum($"n2").as("rn"))
    assert(recomputed
      .filter($"rc" =!= $"rolling_cents" || $"rn" =!= $"rolling_events")
      .isEmpty)
    assert(r.count() > 0)
  }

  test("q61: grouping sets = per-source plus per-lang aggregates, nothing else") {
    val r = RelationalQueries.q61GroupingSets(spark, sfDir)
    val d = Tables.load(spark, sfDir, "documents")
    val nSources = d.select($"source").distinct().count()
    val nLangs = d.select($"lang").distinct().count()
    // gid 1 = grouped by source (lang aggregated), gid 2 = by lang
    assert(r.filter($"gid" === 1).count() == nSources)
    assert(r.filter($"gid" === 2).count() == nLangs)
    assert(r.count() == nSources + nLangs)
    // each axis independently accounts for every document
    val total = d.count()
    assert(r.filter($"gid" === 1).agg(sum($"n_docs")).as[Long].head() == total)
    assert(r.filter($"gid" === 2).agg(sum($"n_docs")).as[Long].head() == total)
  }

  test("q62: schema'd JSON parse equals get_json_object extraction") {
    val viaFromJson = RelationalQueries.q62JsonExtract(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    val viaPath = Tables.load(spark, sfDir, "events")
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"),
        countDistinct($"k").as("n_distinct_k"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(viaFromJson == viaPath && viaFromJson.nonEmpty)
  }

  test("q63: aggregated id strings are sorted and sized with the rank filter") {
    val r = RelationalQueries.q63StringAgg(spark, sfDir)
      .as[(String, Long, String)].collect()
    assert(r.nonEmpty)
    r.foreach { case (src, n, ids) =>
      val parts = ids.split(",").map(_.toLong).toSeq
      assert(parts.size == n && n <= 3, s"$src: $ids")
      assert(parts == parts.sorted, s"$src ids not sorted: $ids")
    }
  }

  test("q59: thresholds hold and identical-text block pairs surface with dist 0") {
    val r = RelationalQueries.q59EditDedup(spark, sfDir)
    // recompute lengths to confirm the kept pairs satisfy the contract
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", length($"text").as("len"), $"text")
    val joined = r
      .join(docs.select($"doc_id".as("id1"), $"len".as("l1"), $"text".as("t1")), "id1")
      .join(docs.select($"doc_id".as("id2"), $"len".as("l2"), $"text".as("t2")), "id2")
    assert(joined.filter($"dist" * 5 > greatest($"l1", $"l2")).isEmpty)
    assert(joined.filter($"dist" =!= levenshtein($"t1", $"t2")).isEmpty)
    // exact duplicates (same text ⇒ same prefix block) must appear at dist 0
    val dupPairs = docs.as("a").join(docs.as("b"),
        $"a.text" === $"b.text" && $"a.doc_id" < $"b.doc_id")
      .count()
    assert(r.filter($"dist" === 0).count() >= dupPairs)
  }
}
