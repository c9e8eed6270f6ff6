package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.NativeFunctions.kmvMins
import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("kmvMins keeps the k smallest DISTINCT values, sorted, across partitions") {
    val vals = Seq(9L, 3L, 7L, 3L, 1L, 8L, 1L, 5L, 2L, 6L, 4L, 9L)
    val out = vals.toDF("v").repartition(4)
      .agg(kmvMins(col("v"), 4).as("mins"))
      .collect()(0).getSeq[Long](0)
    assert(out == Seq(1L, 2L, 3L, 4L))
  }

  test("BloomHash: no false negatives ever; fp rate near the (1-e^-kn/m)^k bound") {
    val rnd = new scala.util.Random(42)
    val m = 1 << 14 // 16384 bits
    val k = 5
    val n = 1000
    val members = Array.fill(n)(rnd.nextLong())
    val bits = new Array[Long](m / 64)
    members.foreach(v => graft.plans.BloomHash.set(bits, v, k))
    val bytes = graft.plans.BloomHash.toBytes(bits)
    // zero false negatives, by construction — every inserted key probes true
    assert(members.forall(v => graft.plans.BloomHash.contains(bytes, v, k)))
    // fp rate on 100k disjoint keys stays near theory (~0.9% here);
    // 3x headroom keeps the assertion seed-robust
    val memberSet = members.toSet
    val probes = Iterator.continually(rnd.nextLong())
      .filterNot(memberSet).take(100000).toArray
    val fp = probes.count(v => graft.plans.BloomHash.contains(bytes, v, k))
    val bound = math.pow(1 - math.exp(-k.toDouble * n / m), k)
    assert(fp.toDouble / probes.length < 3 * bound,
      s"fp rate ${fp.toDouble / probes.length} vs theoretical $bound")
    // OR-merge == building from the union (the partial-aggregate contract)
    val half1 = new Array[Long](m / 64)
    val half2 = new Array[Long](m / 64)
    members.take(n / 2).foreach(v => graft.plans.BloomHash.set(half1, v, k))
    members.drop(n / 2).foreach(v => graft.plans.BloomHash.set(half2, v, k))
    val merged = half1.zip(half2).map { case (a, b) => a | b }
    assert(java.util.Arrays.equals(merged, bits))
  }

  test("kmvMins with fewer than k distinct values returns them all") {
    val out = Seq(5L, 5L, 2L).toDF("v")
      .agg(kmvMins(col("v"), 8).as("mins"))
      .collect()(0).getSeq[Long](0)
    assert(out == Seq(2L, 5L))
  }

  test("KMV estimate: exact when nd < k; within 35% of truth at k=64 on a 10k-key group") {
    // small group: exact pass-through
    val small = Seq.tabulate(20)(i => ("a", i.toLong)).toDF("g", "user_id")
    val h = (lit(Sketches.M) * col("user_id")) % lit(Sketches.P)
    val estSmall = small.groupBy(col("g"))
      .agg(kmvMins(h, 64).as("mins"))
      .select(size(col("mins"))).as[Int].collect()(0)
    assert(estSmall == 20)
    // large group: multiplicative-hash uniformity gives a (k-1)*P/h_k
    // estimate with relative sd ~ 1/sqrt(k-2) ~ 12.7%; 35% is ~2.7 sd
    val n = 10000L
    val big = spark.range(n).select(lit("b").as("g"), col("id").as("user_id"))
    val mins = big.groupBy(col("g"))
      .agg(kmvMins((lit(Sketches.M) * col("user_id")) % lit(Sketches.P), 64).as("mins"))
      .select(get(col("mins"), lit(63))).as[Long].collect()(0)
    val est = 63L * Sketches.P / mins
    assert(math.abs(est - n).toDouble / n < 0.35, s"estimate $est for true $n")
  }

  test("aggregates are SQL-registered via GraftExtensions (kmv_mins, top_k_by_score)") {
    graft.plans.GraftExtensions.registerAll(spark)
    Seq(9L, 3L, 7L, 1L, 3L).toDF("v").createOrReplaceTempView("t_kmv")
    val mins = spark.sql("SELECT kmv_mins(v, 3) AS m FROM t_kmv")
      .collect()(0).getSeq[Long](0)
    assert(mins == Seq(1L, 3L, 7L))
    Seq((0.9, 1L), (0.5, 2L), (0.9, 0L)).toDF("s", "i").createOrReplaceTempView("t_topk")
    val top = spark.sql("SELECT top_k_by_score(s, i, 2) AS t FROM t_topk")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(r => (r.getDouble(0), r.getLong(1))) == Seq((0.9, 0L), (0.9, 1L)))
  }

  test("full native-expression surface is SQL-registered (scalar + repair + embed)") {
    graft.plans.GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT word_bigrams('a b c a b') AS wb,
                sorted_intersect_count(array('a', 'c', 'e'), array('c', 'd', 'e')) AS ic,
                size(pseudo_embed('hello', 8)) AS pe,
                is_valid_json('{"a":1}') AS vj,
                largest_valid_json('x {"a":1} y {"delta":22} z') AS lj""")
      .collect()(0)
    assert(r.getSeq[String](0).toSet == Set("a b", "b c", "c a"))
    assert(r.getInt(1) == 2)
    assert(r.getInt(2) == 8)
    assert(r.getBoolean(3))
    // E3 contract: candidates are the NON-GREEDY {...} spans (a nested
    // object is cut at its first '}' and fails validation), largest
    // valid wins — matching /root/reference/src/utils.py:180-198
    assert(r.getString(4) == """{"delta":22}""")
  }

  test("SQL-first user path: temp views + registered functions reproduce a flagship operator") {
    graft.plans.GraftExtensions.registerAll(spark)
    Tables.registerAll(spark, TestSession.sfDir)
    val viaSql = spark.sql(
      """SELECT poly_hash(text) AS text_hash, min(doc_id) AS keeper_id,
         count(*) AS n_copies FROM documents GROUP BY 1 ORDER BY keeper_id""")
      .collect().map(_.toSeq)
    val viaApi = graft.operators.Dedup.exactDedup(spark, TestSession.sfDir)
      .collect().map(_.toSeq)
    assert(viaSql.length == viaApi.length && viaSql.nonEmpty)
    assert(viaSql.map(s => (s(0), s(1), s(2))).toSet ==
      viaApi.map(s => (s(0), s(1), s(2))).toSet)
  }

  test("topFreq: exact counts and (cnt DESC, item ASC) order while distinct <= cap") {
    import graft.functions.NativeFunctions.topFreq
    val words = Seq("b", "a", "a", "c", "b", "a", "c", "d")
    val out = words.toDF("w").repartition(3)
      .agg(topFreq(col("w"), 16).as("tf"))
      .selectExpr("inline(tf)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a", 3L), ("b", 2L), ("c", 2L), ("d", 1L)))
  }

  test("topFreq: buffer never exceeds cap; heavy hitter survives decrement pressure (MG bound)") {
    import graft.functions.NativeFunctions.topFreq
    // 200 distinct one-off items + one item appearing 50 times, cap 8,
    // n = 250: Misra-Gries guarantees any item with true count >
    // n/(cap+1) = 27.7 is retained, with cnt in [true - n/(cap+1), true]
    val rows = (1 to 200).map(i => s"rare_$i") ++ Seq.fill(50)("hot")
    val out = rows.toDF("w").repartition(1) // single partition: sequential decrement path
      .agg(topFreq(col("w"), 8).as("tf"))
      .selectExpr("inline(tf)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.length <= 8)
    assert(out.head._1 == "hot" &&
      out.head._2 <= 50L && out.head._2 >= 50L - 250L / 9L) // under-estimate-only error
  }

  test("topFreq merge: under-estimate direction survives multi-buffer merges (MG restore step)") {
    import graft.functions.NativeFunctions.topFreq
    // many partitions, each contributing partial buffers over a skewed
    // stream: merged counts must never exceed the truth, and every item
    // above the n/(cap+1) threshold must be present
    // 40 'hot' rows push one item ABOVE n/(cap+1) = 200/9 = 22, so the
    // retention loop below is non-vacuous (without it no item crosses
    // the threshold and the guarantee goes untested)
    val rows = (1 to 64).flatMap(i => Seq.fill(i % 4 + 1)(s"w${i % 16}")) ++
      Seq.fill(40)("hot")
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val cap = 8
    assert(truth.values.max > n / (cap + 1), "fixture must cross the MG threshold")
    val out = rows.toDF("w").repartition(16)
      .agg(topFreq(col("w"), cap).as("tf"))
      .selectExpr("inline(tf)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    out.foreach { case (item, cnt) =>
      assert(cnt <= truth(item), s"$item over-estimated: $cnt > ${truth(item)}")
    }
    truth.filter(_._2 > n / (cap + 1)).keys.foreach { hh =>
      assert(out.exists(_._1 == hh), s"heavy hitter $hh lost")
    }
  }

  test("topFreq: NULL items are skipped") {
    import graft.functions.NativeFunctions.topFreq
    val out = Seq(Some("x"), None, Some("x"), None).toDF("w")
      .agg(topFreq(col("w"), 4).as("tf"))
      .selectExpr("inline(tf)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("x", 2L)))
  }

  test("top_freq is SQL-registered via GraftExtensions") {
    graft.plans.GraftExtensions.registerAll(spark)
    Seq("a", "b", "a").toDF("w").createOrReplaceTempView("t_tf")
    val out = spark.sql("SELECT inline(top_freq(w, 4)) FROM t_tf")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a", 2L), ("b", 1L)))
  }

  test("topFreq exact regime is partitioning-independent (property, seeded)") {
    import graft.functions.NativeFunctions.topFreq
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(400)(s"w${rnd.nextInt(30)}") // 30 distinct << cap
    val results = Seq(1, 4, 16, 32).map { p =>
      rows.toDF("w").repartition(p)
        .agg(topFreq(col("w"), 64).as("tf"))
        .selectExpr("inline(tf)")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    // same counts, same (cnt DESC, item ASC) order, under every layout
    assert(results.distinct.size == 1)
    assert(results.head.map(_._2).sum == 400L)
  }

  test("mixtureSample: down- and up-sampling from one mechanism; realized rates track weights") {
    val out = graft.operators.TextAnalytics.mixtureSample(spark, TestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.nonEmpty)
    // weights span 20%..197%: someone must be dropped, someone replicated
    val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    assert(perDoc.values.max == 2, "a >100% source must emit copy=2 rows")
    val total = spark.read.parquet(s"${TestSession.sfDir}/documents.parquet").count()
    assert(perDoc.size < total, "a <100% source must drop some docs")
    // copies are dense 1..n per doc (no gaps)
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.size).toSeq)
    }
  }

  test("kmvSetOps: below-k unions collapse to EXACT set algebra (div-by-|U| regime)") {
    // two 30-user types overlapping in 10 users: every hash fits the
    // k=64 sketch, so union AND intersection estimates must be exact
    val rows = (0L until 30L).map(u => ("click", u)) ++
      (20L until 50L).map(u => ("purchase", u))
    val out = Sketches.kmvSetOpsOn(rows.toDF("event_type", "user_id"), 64).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(2) == 50L && r.getLong(3) == 50L) // est_union == exact
    assert(r.getLong(4) == 10L && r.getLong(5) == 10L) // est_intersect == exact
  }

  test("kmvSetOps on the fixture: 10 pairs; estimates track exact counts") {
    val out = Sketches.kmvSetOps(spark, TestSession.sfDir).collect()
    assert(out.length == 10) // C(5 event types, 2)
    out.foreach { r =>
      val (estU, exU) = (r.getLong(2), r.getLong(3))
      val (estI, exI) = (r.getLong(4), r.getLong(5))
      assert(exU >= exI && estU >= estI)
      if (exU < 64) assert(estU == exU)
      else assert(math.abs(estU - exU).toDouble / exU < 0.5,
        s"union est $estU vs exact $exU")
      // intersection carries the union's error times the match-fraction
      // noise: additive tolerance in units of the union size
      assert(math.abs(estI - exI).toDouble <= 0.35 * exU + 1,
        s"intersect est $estI vs exact $exI (union $exU)")
    }
  }

  test("distinctUsersKmv returns one row per event_type with exact counts alongside") {
    val out = Sketches.distinctUsersKmv(spark, TestSession.sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getLong(1)
      val exact = r.getLong(2)
      // k=64: groups under 64 distinct users must be EXACT
      if (exact < 64) assert(est == exact)
      else assert(math.abs(est - exact).toDouble / exact < 0.5)
    }
  }

  test("quantileSketch exact regime: type-1 quantiles match a sort, any partitioning") {
    import graft.functions.NativeFunctions.quantileSketch
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(999)(rnd.nextInt(100000).toLong)
    val sorted = vals.sorted
    def t1(q: Double): Long = sorted(math.floor(q * (vals.size - 1)).toInt)
    Seq(1, 4, 13).foreach { parts =>
      val out = vals.toDF("v").repartition(parts)
        .agg(quantileSketch(col("v"), 2048, Seq(0.25, 0.5, 0.75)).as("qs"))
        .collect()(0).getSeq[Long](0)
      assert(out == Seq(t1(0.25), t1(0.5), t1(0.75)), s"parts=$parts")
    }
  }

  test("quantileSketch compacting regime: rank error small, weight preserved (property, seeded)") {
    // direct buffer exercise: 100k inserts at k=256 forces many
    // compactions; the deterministic parity alternation must keep every
    // quantile's weighted rank within a few percent of truth
    val rnd = new scala.util.Random(42)
    Seq(0, 1, 2).foreach { trial =>
      val n = 100000
      val vals = Array.fill(n)(rnd.nextLong(1000000000L))
      val parts = 8
      val bufs = Array.fill(parts)(new graft.plans.QSketchBuffer(256))
      vals.zipWithIndex.foreach { case (v, i) => bufs(i % parts).insert(v) }
      val merged = bufs.reduce { (a, b) => a.mergeIn(b); a }
      assert(merged.totalWeight == n.toLong, s"trial $trial: weight drift")
      val sorted = vals.sorted
      val qs = merged.quantiles(Array(0.1, 0.25, 0.5, 0.75, 0.9))
      qs.zip(Array(0.1, 0.25, 0.5, 0.75, 0.9)).foreach { case (est, q) =>
        // realized rank of the estimate vs target rank, relative to n
        val rank = sorted.count(_ <= est)
        assert(math.abs(rank - q * n) / n < 0.05,
          s"trial $trial q=$q: rank $rank vs ${q * n}")
      }
    }
  }

  test("CmsAgg: estimates never under-count, are exact without collisions, and merge across partitions") {
    import graft.functions.NativeFunctions.cmsAgg
    // known multiplicities: key i occurs i+1 times, 50 keys
    val rows = (0 until 50).flatMap(i => Seq.fill(i + 1)(i.toLong))
    val depth = 4
    val width = 512
    val mat = rows.toDF("k").repartition(8)
      .agg(cmsAgg(col("k"), depth, width).as("cms"))
    val est = (0 until 50).map { i =>
      mat.select(Sketches.cmsEstimate(col("cms"), lit(i.toLong), depth, width))
        .collect()(0).getLong(0)
    }
    // never an under-count
    (0 until 50).foreach(i => assert(est(i) >= i + 1))
    // 50 keys into 512 buckets x 4 rows: all-rows collision is
    // overwhelmingly unlikely with this fixed hash family — exact here
    (0 until 50).foreach(i => assert(est(i) == i + 1, s"key $i: ${est(i)}"))
    // matrix total = depth * n rows (each row counted once per depth row)
    val total = mat.select(aggregate(col("cms"), lit(0L), (a, x) => a + x))
      .collect()(0).getLong(0)
    assert(total == depth.toLong * rows.length)
  }

  test("eventsCmsCounts: probe estimates bound the exact counts on the fixture") {
    val out = Sketches.eventsCmsCounts(spark, TestSession.sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2),
        s"CMS under-counted ${r.getString(0)}/${r.getLong(1)}")
    }
  }

  test("orderQuantilesSketch: fixture groups are in the exact regime; p25<=p50<=p75") {
    val out = Sketches.orderQuantilesSketch(spark, TestSession.sfDir).collect()
    assert(out.length >= 1)
    out.foreach { r =>
      val (p25, p50, p75) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p25 <= p50 && p50 <= p75)
      assert(r.getLong(4) > 0)
    }
  }
}
