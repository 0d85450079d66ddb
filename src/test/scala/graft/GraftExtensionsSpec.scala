package graft

/** The custom expressions are reachable from plain SQL via the
  * SparkSessionExtensions installed in SparkTestBase (the same
  * installer a cluster would load with
  * --conf spark.sql.extensions=graft.runtime.GraftExtensions).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("cosine_sim is callable from SQL") {
    val cos = spark.sql(
      "SELECT cosine_sim(array(1.0f, 2.0f, 0.0f), array(2.0f, 4.0f, 0.0f)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-15)
  }

  test("minhash_bands / simhash64 / sorted_array_jaccard from SQL") {
    val row = spark.sql(
      """SELECT
        |  minhash_bands(array('a b c', 'b c d'), 16, 4) AS mh,
        |  simhash64(array('alpha', 'beta')) AS sh,
        |  sorted_array_jaccard(array('a', 'b', 'c'), array('b', 'c', 'd')) AS j
        |""".stripMargin).collect()(0)
    assert(row.getSeq[Long](0).length == 4)
    assert(row.getLong(1) != 0L)
    assert(row.getDouble(2) == 0.5)
  }

  test("sorted_array_intersect_count from SQL agrees with the jaccard twin") {
    val row = spark.sql(
      """SELECT
        |  sorted_array_intersect_count(array('a', 'b', 'c'),
        |                               array('b', 'c', 'd')) AS c,
        |  sorted_array_intersect_count(array('a'), array('b')) AS z
        |""".stripMargin).collect()(0)
    assert(row.getInt(0) == 2)
    assert(row.getInt(1) == 0)
  }

  test("morton_code is callable from SQL and matches the helper") {
    val z = spark.sql("SELECT morton_code(3L, 5L) AS z").collect()(0).getLong(0)
    assert(z == graft.functions.ZOrderHelper.morton(3, 5))
  }

  test("portable_string_hash / hashed_linear_score from SQL match the helpers") {
    val h = spark.sql("SELECT portable_string_hash('spark') AS h")
      .collect()(0).getLong(0)
    assert(h == graft.functions.PortableHash.hash("spark"))
    val s = spark.sql(
      "SELECT hashed_linear_score(array('the', 'quick', 'the')) AS s")
      .collect()(0).getLong(0)
    val one = (t: String) => graft.functions.HashedLinearScoreHelper.weight(
      graft.functions.PortableHash.slot(graft.functions.PortableHash.hash(t),
        graft.functions.HashedLinearScoreHelper.Slot) %
        graft.functions.HashedLinearScoreHelper.D)
    assert(s == one("the") * 2 + one("quick"))
  }

  test("portable_minhash_signature from SQL matches the helper slots") {
    val sig = spark.sql(
      "SELECT portable_minhash_signature(array('a b c', 'b c d'), 8) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sig.length == 8)
    val expected = (0 until 8).map { j =>
      Seq("a b c", "b c d")
        .map(s => graft.functions.PortableHash.slot(
          graft.functions.PortableHash.hash(s), j)).min
    }
    assert(sig.toSeq == expected)
    // empty shingle set is the documented -1 sentinel signature
    val empty = spark.sql(
      "SELECT portable_minhash_signature(array(), 4) AS s")
      .collect()(0).getSeq[Long](0)
    assert(empty.toSeq == Seq(-1L, -1L, -1L, -1L))
  }

  test("identical inputs give identical sketches through the SQL surface") {
    val rows = spark.sql(
      """SELECT minhash_bands(array('x y z'), 32, 8) AS mh FROM range(2)""")
      .collect()
    assert(rows(0).getSeq[Long](0) == rows(1).getSeq[Long](0))
  }

  test("JaccardLengthPrune injects the size prefilter and never changes results") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefghij"), (2L, "abcdefghix"),       // near-dup pair
      (3L, "ab"), (4L, "abcdefghijklmnopqrstuvwxyz")) // wildly different sizes
      .toDF("id", "text")
      .select($"id", graft.operators.Dedup.packedNgrams($"text", 3).as("g"))
    val a = docs.select($"id".as("id1"), $"g".as("g1"))
    val b = docs.select($"id".as("id2"), $"g".as("g2"))
    val q = a.crossJoin(b).filter($"id1" < $"id2")
      .filter(graft.operators.Dedup.sortedIntJaccard($"g1", $"g2") >= 0.6)
      .select($"id1", $"id2")
    // the rule rewrote the predicate: size() guards appear in the plan
    val optimized = q.queryExecution.optimizedPlan
    assert(optimized.toString.contains("size("), optimized.toString)
    // and semantics are unchanged: only the planted near-dup survives
    assert(q.as[(Long, Long)].collect().toSet == Set((1L, 2L)))
    // idempotence is structural (tags do not survive Filter rebuilds by
    // other fixed-point rules): each guard appears EXACTLY once in the
    // final plan, and re-applying the rule to its own output is a no-op
    // two guards, each reading both sizes → exactly 4 size() calls; any
    // more means a fixed-point iteration re-injected its own conjuncts
    val sizeCalls = "size\\(".r.findAllIn(optimized.toString).length
    assert(sizeCalls == 4, s"expected 4 size calls (2 guards), got $sizeCalls")
    val again = graft.plans.JaccardLengthPrune(optimized)
    assert(again.fastEquals(optimized),
      s"rule re-application changed an already-guarded plan:\n$again")
  }
}
