package graft

import org.apache.spark.sql.functions._
import graft.functions.{HllAgg, PortableHash}

class HllSpec extends SparkSpec {
  import spark.implicits._

  private def registersOf(tokens: Seq[String], parts: Int): Seq[Int] =
    tokens.toDF("t").repartition(parts)
      .agg(HllAgg.udaf(col("t")).as("reg"))
      .as[Seq[Int]].collect().head

  private def referenceRegisters(tokens: Seq[String]): Seq[Int] = {
    val regs = new Array[Int](HllAgg.M)
    tokens.foreach { t =>
      val h = PortableHash.slot(PortableHash.hash(t), 1)
      val b = (h & (HllAgg.M - 1)).toInt
      val payload = h >>> 6
      val rho =
        if (payload == 0L) HllAgg.Width + 1
        else HllAgg.Width + 1 - (64 - java.lang.Long.numberOfLeadingZeros(payload))
      if (rho > regs(b)) regs(b) = rho
    }
    regs.toSeq
  }

  private def rawEstimate(regs: Seq[Int]): Long = {
    val denom = regs.map(m => 1L << (HllAgg.Width + 1 - m)).sum
    val num = (HllAgg.AlphaMilli * HllAgg.M * HllAgg.M) << (HllAgg.Width + 1)
    num / (1000L * denom)
  }

  test("registers are partition-invariant (max merge)") {
    val tokens = (0 until 2000).map(i => s"tok${i % 311}")
    assert(registersOf(tokens, 1) == registersOf(tokens, 16))
  }

  test("duplicates are free: registers depend only on the distinct set") {
    val distinct = (0 until 97).map(i => s"w$i")
    val dupped = distinct ++ distinct ++ distinct.take(13)
    assert(registersOf(dupped, 4) == registersOf(distinct, 2))
  }

  test("registers match the straight-loop reference definition") {
    val tokens = (0 until 500).map(i => s"item-$i")
    assert(registersOf(tokens, 8) == referenceRegisters(tokens))
  }

  test("raw estimate tracks true cardinality within HLL error on large sets") {
    // m=64 → relative error ~1.04/sqrt(64) = 13%; allow 3 sigma
    Seq(500, 2000, 8000).foreach { n =>
      val est = rawEstimate(referenceRegisters((0 until n).map(i => s"card$i")))
      assert(math.abs(est - n).toDouble / n < 0.40,
        s"estimate $est too far from true $n")
    }
  }

  test("empty group: all registers zero, denominator is m * 2^26") {
    val regs = registersOf(Nil, 1)
    assert(regs == Seq.fill(HllAgg.M)(0))
    val denom = regs.map(m => 1L << (HllAgg.Width + 1 - m)).sum
    assert(denom == HllAgg.M.toLong << (HllAgg.Width + 1))
  }
}
