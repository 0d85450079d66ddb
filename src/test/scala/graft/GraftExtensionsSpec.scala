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

  test("identical inputs give identical sketches through the SQL surface") {
    val rows = spark.sql(
      """SELECT minhash_bands(array('x y z'), 32, 8) AS mh FROM range(2)""")
      .collect()
    assert(rows(0).getSeq[Long](0) == rows(1).getSeq[Long](0))
  }
}
