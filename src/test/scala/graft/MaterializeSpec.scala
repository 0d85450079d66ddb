package graft

import graft.runtime.Materialize

/** Both materialization policies must produce correct frames; the
  * reliable one must actually land on the (cluster) filesystem, since
  * that is the whole point of selecting it under dynamic allocation.
  */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  test("default policy: localCheckpoint, no checkpoint dir required") {
    val df = Seq(1, 2, 3).toDF("x").transform(Materialize.once)
    assert(df.as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("reliable policy: materializes through the checkpoint dir") {
    val dir = tmpDir("reliable-ckpt")
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Materialize.PolicyKey, "reliable")
    try {
      val df = Seq(4, 5, 6).toDF("x").transform(Materialize.once)
      assert(df.as[Int].collect().sorted.toSeq == Seq(4, 5, 6))
      // the intermediate exists as checkpoint FILES, not executor
      // blocks — the property that survives losing an executor
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(files) else Seq(f)
      assert(files(new java.io.File(dir)).nonEmpty)
      // freeing a reliable generation is a safe no-op on the files
      Materialize.free(df)
      assert(df.count() == 3)
    } finally spark.conf.unset(Materialize.PolicyKey)
  }

  test("unknown policy value fails loudly") {
    spark.conf.set(Materialize.PolicyKey, "bogus")
    try intercept[IllegalArgumentException] {
      Seq(1).toDF("x").transform(Materialize.once)
    } finally spark.conf.unset(Materialize.PolicyKey)
  }
}
