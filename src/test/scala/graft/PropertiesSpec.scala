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

  test("property: sorted_array_intersect_count equals array_intersect size, any arrays") {
    val rows = sample(
      for {
        a <- Gen.listOfN(20, Gen.oneOf("a", "b", "cc", "d", "ee", "f", "g", ""))
        b <- Gen.listOfN(20, Gen.oneOf("a", "b", "cc", "d", "ee", "x", "y", ""))
      } yield (a, b), 300)
    val df = rows.toDF("a", "b").select(
      array_sort(array_distinct($"a")).as("sa"),
      array_sort(array_distinct($"b")).as("sb"))
    val cnt = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.SortedArrayIntersectCount(
        org.apache.spark.sql.graft.ColumnBridge.expression($"sa"),
        org.apache.spark.sql.graft.ColumnBridge.expression($"sb")))
    val mismatch = df.select(cnt.as("merged"),
        size(array_intersect($"sa", $"sb")).as("builtin"))
      .filter($"merged" =!= $"builtin")
    assert(mismatch.isEmpty,
      "merge-count must agree with array_intersect on sorted-distinct input")
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

  test("property: asofJoin equals the naive latest-at-or-before reference") {
    import java.sql.Timestamp
    // distinct (key, ts) build rows (equal-ts build ties have no defined
    // winner in either implementation); nullable payload exercises the
    // whole-row carry
    val builds = sample(
      for {
        k <- Gen.choose(1, 6)
        t <- Gen.choose(0L, 1000L)
        v <- Gen.option(Gen.choose(1L, 99L))
      } yield (k, t, v), 200)
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val probes = sample(
      for { k <- Gen.choose(1, 8); t <- Gen.choose(0L, 1000L) } yield (k, t),
      200).distinct.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
    def ts(ms: Long) = new Timestamp(ms)
    val left = probes.map { case (id, k, t) => (id, k, ts(t)) }.toDF("id", "k", "ts")
    val right = builds.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "ts", "v")
    val got = graft.operators.AsOf.asofJoin(left, right, Seq("k"), "ts", "ts")
      .select("id", "v_asof").as[(Long, Option[Long])].collect().toMap
    probes.foreach { case (id, k, t) =>
      val expect = builds.filter(b => b._1 == k && b._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(id) == expect.getOrElse(None),
        s"probe $id (k=$k, t=$t): got ${got(id)}, want $expect")
    }
    assert(got.size == probes.size)
  }

  test("property: pointInInterval equals the naive inequality join") {
    import java.sql.Timestamp
    val intervals = sample(
      for {
        k <- Gen.choose(1, 5)
        s <- Gen.choose(0L, 5000L)
        len <- Gen.choose(0L, 3000L)
      } yield (k, s, s + len), 60)
      .zipWithIndex.map { case ((k, s, e), i) => (i.toLong, k, s, e) }
    val points = sample(
      for { k <- Gen.choose(1, 6); t <- Gen.choose(0L, 8000L) } yield (k, t),
      150).distinct.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
    def ts(ms: Long) = new Timestamp(ms)
    val pdf = points.map { case (id, k, t) => (id, k, ts(t)) }.toDF("pid", "k", "t")
    val idf = intervals.map { case (id, k, s, e) => (id, k, ts(s), ts(e)) }
      .toDF("iv", "k", "s", "e")
    // bucket width deliberately small so intervals span many buckets
    val got = graft.operators.RangeJoin.pointInInterval(
        pdf, idf, Seq("k"), "t", "s", "e", bucketSeconds = 1)
      .select("pid", "iv").as[(Long, Long)].collect().toSet
    val want = (for {
      (pid, pk, t) <- points
      (iv, ik, s, e) <- intervals if pk == ik && s <= t && t <= e
    } yield (pid, iv)).toSet
    assert(got == want)
  }

  test("property: simHashNearPairs equals brute force on clustered fingerprints") {
    // clustered fingerprints: a few bases plus 0-4 random bit flips, so
    // near/far pairs and duplicate groups all occur
    val bases = Seq(0x0123456789ABCDEFL, 0x5555AAAA5555AAAAL, -1L)
    val fps = sample(
      for {
        b <- Gen.oneOf(bases)
        nFlips <- Gen.choose(0, 4)
        flips <- Gen.listOfN(nFlips, Gen.choose(0, 63))
      } yield flips.foldLeft(b)((h, i) => h ^ (1L << i)), 120)
      .zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val got = graft.operators.Dedup.simHashNearPairs(
        fps.toDF("doc_id", "simhash"), "doc_id", "simhash")
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (i, hi) <- fps; (j, hj) <- fps if i < j
      d = java.lang.Long.bitCount(hi ^ hj) if d <= 3
    } yield (i, j, d)).toSet
    assert(got == want)
  }

  test("property: connectedComponents equals a union-find reference on random graphs") {
    // sparse random graphs over a 60-node id space: isolated nodes,
    // chains, merged blobs and self-loops all occur across the sample
    val edges = sample(
      for {
        a <- Gen.choose(0L, 59L)
        b <- Gen.choose(0L, 59L)
      } yield (a, b), 70)
    val got = graft.operators.Clusters
      .connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    // reference: classic path-compressing union-find on the driver
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-relabel the reference roots so both sides name a component by
    // its minimum member id
    val members = parent.keys.toSeq.groupBy(find)
    val want = members.flatMap { case (_, ms) =>
      val lo = ms.min; ms.map(_ -> lo)
    }.toMap
    assert(got == want)
  }

  test("property: pagerankInt equals the sequential integer reference on cyclic graphs") {
    import graft.operators.Graphs
    // random directed multigraphs over 12 nodes, cycles included
    val edgeSets = sample(
      Gen.listOfN(40, for {
        s <- Gen.choose(0L, 11L); t <- Gen.choose(0L, 11L)
        if s != t
      } yield (s, t)), 4)
    edgeSets.foreach { es =>
      val got = Graphs.pagerankInt(es.toDF("src", "dst"), iterations = 3)
        .as[(Long, Long)].collect().toMap
      assert(got == Graphs.pagerankRef(es, iterations = 3), s"edges=$es")
    }
  }

  test("pagerank broadcast auto-sizing: both join paths agree exactly") {
    import graft.operators.Graphs
    val es = (0L until 30L).map(i => (i, (i * 7 + 1) % 30)) ++
      (0L until 30L).map(i => (i, (i * 11 + 3) % 30))
    val edges = es.filter { case (s, t) => s != t }.toDF("src", "dst")
    val want = Graphs.pagerankRef(es.filter { case (s, t) => s != t },
      iterations = 3)
    // auto mode under a tiny cap must take the SHUFFLE path (30 nodes
    // > cap of 5) and still match; an explicit broadcast override and
    // the auto-broadcast default must match too — the join strategy can
    // never change the integer masses
    val shuffled = Graphs.pagerankInt(edges, iterations = 3,
      broadcastMaxNodes = 5L).as[(Long, Long)].collect().toMap
    val broadcasted = Graphs.pagerankInt(edges, iterations = 3,
      broadcastRanks = Some(true)).as[(Long, Long)].collect().toMap
    val auto = Graphs.pagerankInt(edges, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(shuffled == want)
    assert(broadcasted == want)
    assert(auto == want)
  }

  test("property: SCD2 versions tile the key's timeline with change points only") {
    import graft.operators.Scd2
    val rows = sample(
      for {
        user <- Gen.choose(0L, 5L)
        t <- Gen.choose(0L, 10000L)
        attr <- Gen.oneOf("a", "b", "c")
      } yield (user, t, attr), 400)
      // unique (user, ts) so ordering is total and the reference is exact
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val df = rows.zipWithIndex
      .map { case ((u, t, a), i) => (u, t, a, i.toLong) }
      .toDF("user_id", "ts", "attr0", "event_id")
    val got = Scd2.fromEvents(df, $"user_id", $"ts", $"attr0", $"event_id")
      .as[(Long, Int, String, Long, Option[Long], Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    rows.groupBy(_._1).foreach { case (user, evs) =>
      val ordered = evs.sortBy(_._2)
      // reference: collapse runs of the same attr
      val changes = ordered.foldLeft(Vector.empty[(Long, String)]) {
        case (acc, (_, t, a)) =>
          if (acc.nonEmpty && acc.last._2 == a) acc else acc :+ (t, a)
      }
      val versions = got(user)
      assert(versions.map(v => (v._4, v._3)) == changes, s"user=$user")
      // versions are 1..n, intervals chain exactly, one open version
      assert(versions.map(_._2) == (1 to changes.size))
      versions.sliding(2).foreach {
        case Seq(p, n) => assert(p._5.contains(n._4))
        case _ =>
      }
      assert(versions.last._5.isEmpty && versions.last._6 == 1)
      assert(versions.init.forall(_._6 == 0))
    }
  }

  test("property: fused TextFeatures equals the split-based reference") {
    // whitespace-rich strings; reference replicates wsTokens exactly:
    // UTF8String.trim strips ASCII SPACES only, then Java split("\\s+")
    val texts = sample(
      Gen.listOf(Gen.oneOf("the", "a", "and", "of", "cat", " ", "\t", "\n"))
        .map(_.mkString("")), 300)
    def strip(s: String) = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = rows.toDF("id", "text")
      .select($"id", graft.operators.TextAnalysis.textFeatures($"text").as("tf"))
      .select($"id", $"tf.n_tokens", $"tf.occ_the", $"tf.occ_a",
        $"tf.occ_and", $"tf.occ_of", $"tf.prefix_key")
      .as[(Long, Int, Int, Int, Int, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    rows.foreach { case (id, text) =>
      val toks = strip(text).split("\\s+", -1)
      val expect = (id, toks.length,
        toks.count(_ == "the"), toks.count(_ == "a"),
        toks.count(_ == "and"), toks.count(_ == "of"),
        toks.take(2).mkString(" "))
      assert(got(id) == expect, s"id=$id text=${text.replace("\n", "\\n")}")
    }
  }

  test("property: q90's asymmetric prefix filter equals brute force on random corpora") {
    // adversarial shape for the round-6 candidate generator: a tiny
    // vocabulary forces heavy token collisions, short docs hit the
    // prefix-length floors, and equal-size documents exercise the
    // (size, id) orientation tiebreak of the asymmetric indexing prefix
    val corpus = sample(
      for {
        src <- Gen.oneOf("s1", "s2")
        nTok <- Gen.choose(1, 15)
        toks <- Gen.listOfN(nTok, Gen.oneOf(
          "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l"))
      } yield (src, toks.mkString(" ")), 120)
      .zipWithIndex.map { case ((src, text), i) => (i.toLong, src, text) }
    // brute-force reference over distinct token sets, within source
    val sets = corpus.map { case (id, src, text) =>
      (id, src, text.trim.split("\\s+", -1).toSet)
    }
    val want = (for {
      (id1, s1, t1) <- sets
      (id2, s2, t2) <- sets
      if s1 == s2 && id1 < id2
      common = (t1 & t2).size
      union = (t1 | t2).size
      if 5 * common >= 4 * union
    } yield (s1, id1, id2, common.toLong, union.toLong)).toSet
    // run the real query against the same data via a temp documents dir
    val dir = tmpDir("q90prop")
    corpus.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.CorpusQueries.q90PrefixJoin(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("property: portable minhash signature = per-slot min over shingle hashes") {
    val rows = sample(
      Gen.listOfN(12, Gen.oneOf("a b", "c d", "e f", "gg hh", "i j", "")),
      200)
    val df = rows.map(Tuple1(_)).toDF("sh")
    val sig = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.PortableMinHashSignature(
        org.apache.spark.sql.graft.ColumnBridge.expression($"sh"), 16))
    val got = df.select($"sh", sig.as("sig"))
      .as[(Seq[String], Seq[Long])].collect()
    got.foreach { case (sh, sigv) =>
      assert(sigv.length == 16)
      val expected =
        if (sh.isEmpty) Seq.fill(16)(-1L)
        else (0 until 16).map { j =>
          sh.map(x => graft.functions.PortableHash.slot(
            graft.functions.PortableHash.hash(x), j)).min
        }
      assert(sigv == expected, s"input=$sh")
    }
    // monotonicity: adding a shingle can only LOWER (or keep) each slot
    val pairs = sample(for {
      base <- Gen.listOfN(6, Gen.oneOf("a", "b", "c", "d"))
      extra <- Gen.oneOf("e", "f", "g")
    } yield (base, base :+ extra), 100)
    pairs.foreach { case (base, bigger) =>
      def sigOf(xs: Seq[String]) =
        if (xs.isEmpty) Seq.fill(16)(Long.MaxValue)
        else (0 until 16).map(j => xs.map(x =>
          graft.functions.PortableHash.slot(
            graft.functions.PortableHash.hash(x), j)).min)
      sigOf(base).zip(sigOf(bigger)).foreach { case (b, bg) =>
        assert(bg <= b)
      }
    }
  }

  // --- portable idiom properties (VERDICT r07 item 4): the four
  // engine/oracle mismatch classes, each pinned against an in-JVM
  // reference so a red from these classes is structurally impossible.
  // The DuckDB twins of each form are documented (and empirically
  // verified against duckdb 1.0) in graft.queries.OracleIdioms.

  test("portable idiom: div truncates and floorDiv floors, any signs") {
    import graft.queries.OracleIdioms
    val rows = sample(
      for {
        a <- Gen.choose(-1000000L, 1000000L)
        b <- Gen.choose(1L, 9999L) // all engine divisors are positive
      } yield (a, b), 500) ++ Seq((-7L, 2L), (7L, 2L), (0L, 5L),
      (Long.MaxValue, 3L)) // MinValue-adjacent excluded: a - pmod(a,b)
      // would overflow, and ANSI mode (Spark 4 default) throws on it
    val got = rows.toDF("a", "b")
      .select($"a", $"b", expr("a div b").as("trunc_div"),
        OracleIdioms.floorDiv($"a", $"b").as("floor_div"),
        pmod($"a", $"b").as("pos_mod"), ($"a" % $"b").as("signed_mod"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    got.foreach { case (a, b, td, fd, pm, sm) =>
      assert(td == a / b, s"div must truncate like JVM /: $a div $b")
      assert(fd == Math.floorDiv(a, b), s"floorDiv($a, $b)")
      assert(pm == Math.floorMod(a, b), s"pmod($a, $b)")
      assert(sm == a % b, s"% must keep dividend sign: $a % $b")
    }
  }

  test("portable idiom: whitespace split incl. empty and whitespace-only") {
    import graft.queries.OracleIdioms
    val ws = Gen.oneOf(" ", "\t", "\n", "  ")
    val word = Gen.oneOf("a", "bb", "c-d", "0", "é")
    val rows = sample(
      Gen.listOf(Gen.oneOf(ws, word)).map(_.mkString), 400) ++
      Seq("", " ", "\t\t", "a", " a ", "a  b", "\na\tb\n")
    val got = rows.toDF("s")
      .select($"s", split(trim($"s"), "\\s+").as("toks"),
        OracleIdioms.wsTokensNonEmpty($"s").as("toks_ne"))
      .as[(String, Seq[String], Seq[String])].collect()
    got.foreach { case (s, toks, toksNe) =>
      // in-JVM reference. Verified engine semantics this reference
      // models (and String.trim does NOT): both Spark's trim and
      // DuckDB's trim strip ASCII SPACES ONLY — a text edged by \t or
      // \n keeps it, and the \s+ split then yields an EMPTY edge token
      // on both engines ('\ta b\n' → ['', 'a', 'b', '']). Java split
      // with limit -1 likewise keeps edge empties ([""] on "").
      val ref = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
        .reverse.split("\\s+", -1).toSeq
      assert(toks == ref, s"split([${s.map(_.toInt).mkString(",")}])")
      assert(toksNe == ref.filter(_.nonEmpty), s"nonEmpty([${s.map(_.toInt).mkString(",")}])")
    }
    assert(got.collectFirst { case ("", t, _) => t }.get == Seq(""))
  }

  test("portable idiom: isqrt double+correction equals exact BigInt sqrt") {
    // q168's exact integer square root: floor(sqrt(double)) plus a
    // one-step correction. The correction must absorb any ulp error in
    // the double sqrt — compare against BigInt ground truth, leaning on
    // values near perfect squares where doubles round worst.
    val cases = sample(Gen.oneOf(
      Gen.choose(0L, 1000000L),
      Gen.choose(0L, 3037000498L).map(s => s * s), // exact squares
      Gen.choose(1L, 3037000498L).map(s => s * s - 1),
      Gen.choose(0L, 3037000498L).map(s => s * s + 1)), 2000)
      .filter(_ >= 0)
    val got = cases.toDF("n").select($"n", expr(
      """CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)
        |  - (CASE WHEN CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)
        |            * CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) > n
        |     THEN 1 ELSE 0 END)
        |  + (CASE WHEN (CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) + 1)
        |            * (CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) + 1) <= n
        |     THEN 1 ELSE 0 END)""".stripMargin).as("w"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, w) =>
      val exact = java.math.BigInteger.valueOf(n).sqrt().longValueExact()
      assert(w == exact, s"isqrt($n): got $w, exact $exact")
    }
  }

  test("portable idiom: inverse-CDF threshold tables are strictly monotone and unbiased") {
    // the q164 Poisson and q169 discrete-Laplace draws are defined by
    // interpolated threshold constants; both definitions break if a
    // table is non-monotone (double-counted bins) or the slot hash is
    // clustered. Check monotonicity structurally and the realized
    // mean on a large uniform slot sweep.
    val mod = graft.functions.PortableHash.Mod
    def draws(thresholds: Seq[Long], shift: Long): Seq[Int] = {
      assert(thresholds == thresholds.sorted &&
        thresholds.distinct.length == thresholds.length,
        "threshold table must be strictly increasing")
      assert(thresholds.head > 0 && thresholds.last < mod)
      (0 until 20000).map { i =>
        val h = (i.toLong * 2654435761L + shift) % mod // uniform-ish slots
        thresholds.count(t => h >= t)
      }
    }
    // Poisson(1): mean 1 (truncated at 6 — bias < 1e-4)
    val pThresholds = {
      var term = math.exp(-1.0); var cdf = 0.0
      (0 to 5).map { k =>
        if (k > 0) term /= k
        cdf += term
        math.floor(cdf * mod).toLong
      }
    }
    val pMean = draws(pThresholds, 17L).sum.toDouble / 20000
    assert(math.abs(pMean - 1.0) < 0.05, s"Poisson(1) mean drifted: $pMean")
    // discrete Laplace eps=ln2: symmetric around 0 after the -8 shift
    val dThresholds = {
      val M = BigInt(mod)
      val neg = (-8 to -1).map(k => (M / (BigInt(3) * BigInt(2).pow(-k - 1))).toLong)
      val zero = (M * 2 / 3).toLong
      val pos = (1 to 7).map { k =>
        val d = BigInt(3) * BigInt(2).pow(k)
        ((M * (d - 1)) / d).toLong
      }
      neg ++ Seq(zero) ++ pos
    }
    val dMean = draws(dThresholds, 23L).map(_ - 8).sum.toDouble / 20000
    assert(math.abs(dMean) < 0.05, s"discrete Laplace mean drifted: $dMean")
  }

  test("portable idiom: cumulative ROWS window equals scanLeft prefix on a distinct spine") {
    // cumulative frames are only portable over a spine with DISTINCT
    // order keys (each engine breaks peer ties arbitrarily under ROWS);
    // every production cumsum groups to the key first — mirror that.
    val rows = sample(
      for {
        g <- Gen.oneOf("x", "y", "z")
        k <- Gen.choose(0, 60)
        v <- Gen.choose(-500L, 500L)
      } yield (g, k, v), 600)
    val spine = rows.toDF("g", "k", "v")
      .groupBy($"g", $"k").agg(sum($"v").as("v"))
    val w = Window.partitionBy($"g").orderBy($"k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = spine
      .select($"g", $"k", sum($"v").over(w).as("cum"),
        min($"v").over(w).as("runmin"))
      .as[(String, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val ref = rows.groupBy(r => (r._1, r._2))
      .map { case ((g, k), vs) => (g, k, vs.map(_._3).sum) }
      .groupBy(_._1).view.mapValues(_.toSeq.sortBy(_._2)).toMap
    ref.foreach { case (g, seq) =>
      val cums = seq.scanLeft(0L)(_ + _._3).tail
      val mins = seq.map(_._3).scanLeft(Long.MaxValue)(math.min).tail
      val gotSeq = got(g).toSeq
      assert(gotSeq.map(_._3) == cums, s"cumsum group $g")
      assert(gotSeq.map(_._4) == mins, s"runmin group $g")
    }
  }
}
