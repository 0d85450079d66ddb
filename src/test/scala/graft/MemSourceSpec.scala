package graft

import org.apache.spark.sql.functions._

import graft.sources.MemSource

/** The DSv2 batch-write protocol on the in-memory table: commit
  * atomicity, append-vs-truncate, round-trip fidelity, and the
  * failed-job abort path leaving prior state untouched.
  */
class MemSourceSpec extends SparkSpec {
  import spark.implicits._

  private def write(df: org.apache.spark.sql.DataFrame, name: String,
                    mode: String): Unit =
    df.write.format("graft-mem").option("name", name).mode(mode).save()

  private def read(name: String) =
    spark.read.format("graft-mem").option("name", name).load()

  test("overwrite write + read-back round-trips a multi-partition frame") {
    val name = "mem_rt"
    MemSource.drop(name)
    val df = (0L until 1000L).map(i => (i, s"v$i", i * 3 % 7))
      .toDF("id", "s", "m").repartition(8)
    write(df, name, "overwrite")
    val back = read(name)
    assert(back.count() == 1000)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
      "read-back must equal the written frame")
    // a second overwrite replaces, not accumulates
    write(df.filter($"id" < 10), name, "overwrite")
    assert(read(name).count() == 10)
  }

  test("append accumulates across commits") {
    val name = "mem_app"
    MemSource.drop(name)
    write(Seq((1L, "a")).toDF("id", "s"), name, "overwrite")
    write(Seq((2L, "b"), (3L, "c")).toDF("id", "s"), name, "append")
    val got = read(name).as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("a failed job aborts without touching committed state") {
    val name = "mem_abort"
    MemSource.drop(name)
    write(Seq((1L, "keep")).toDF("id", "s"), name, "overwrite")
    val poisoned = (0L until 100L).toDF("id").repartition(4)
      .select($"id", when($"id" === 57L,
        raise_error(lit("injected task failure")))
        .otherwise($"id".cast("string")).as("s"))
    intercept[Exception] { write(poisoned, name, "overwrite") }
    val got = read(name).as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "keep")),
      s"aborted overwrite must leave prior state intact, got $got")
    assert(MemSource.rowCount(name) == 1L)
  }

  test("reading a never-written table demands a schema") {
    MemSource.drop("mem_missing")
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-mem").option("name", "mem_missing").load()
    }
    assert(e.getMessage.contains("no committed data"))
  }
}
