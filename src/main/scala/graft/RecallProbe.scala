package graft

import org.apache.spark.sql.SparkSession

/** ANN recall probe: recall@k of each approximate index against the
  * exact brute-force top-k, on the same fixture and query set the bench
  * uses. Complements ScaleProbe (wall-clock growth) with the quality
  * axis: an ANN path is only "the scale path" if its candidate pruning
  * keeps the answers.
  *
  * Not part of the correctness gate (the oracle already hash-checks
  * each operator's OWN contract); run manually:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.RecallProbe"
  */
object RecallProbe {

  private def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** splitmix64 — the standard 64-bit mix; deterministic across JVMs,
    * no seeded java.util.Random involved. */
  private def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** A CLUSTERED embedding fixture — mixture of `nClusters` well-
    * separated centers with small per-point noise, every coordinate a
    * fixed-point integer over 1024 (the cross-engine determinism
    * protocol, though this probe is engine-only): the geometry the
    * word-salad fixture lacks, where HNSW's hierarchy claim can be
    * MEASURED instead of asserted. Centers span [-1, 1); noise is
    * ±1/8 — intra-cluster cosine >> inter-cluster cosine. */
  private def clusteredFixtureDir(spark: SparkSession, n: Int = 2000,
                                  dim: Int = 64,
                                  nClusters: Int = 16,
                                  noiseRange: Long = 257L): String = {
    import spark.implicits._
    val half = (noiseRange / 2).toInt
    val rows = (0L until n.toLong).map { i =>
      val c = (i % nClusters).toLong
      val emb = Array.tabulate(dim) { j =>
        val center = (Math.floorMod(mix64(c * 1000003L + j), 2048L) - 1024L) / 1024.0f
        val noise = (Math.floorMod(mix64(i * 7919L + j + 17), noiseRange) - half) / 1024.0f
        center + noise
      }
      (i, emb, (i % 3).toInt)
    }
    val dir = java.nio.file.Files.createTempDirectory("clustered_fix").toString
    rows.toDF("vec_id", "embedding", "label")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_RECALL_K", "3").toInt
    val nQ = sys.env.getOrElse("SPARK_GRAFT_RECALL_QUERIES", "10").toInt
    val only = sys.env.get("SPARK_GRAFT_RECALL_ONLY")
    if (only.contains("clustered")) {
      val spark: SparkSession = GraftSession.get("graft-recall-probe")
      try clusteredSection(spark, k, nQ) finally spark.stop()
      return
    }
    val spark: SparkSession = GraftSession.get("graft-recall-probe")
    try {
      import graft.operators.Similarity
      val exact = resultSet(Similarity.topK(spark, sfDir, k = k, nQueries = nQ))
      require(exact.nonEmpty,
        s"no exact baseline: topK returned 0 rows for $sfDir (empty corpus " +
          "or zero-norm query vectors) — recall would be 0/0")
      val probes: Seq[(String, () => Set[(Long, Long)])] = Seq(
        "vector_lsh_topk (adaptive bits)" ->
          (() => resultSet(Similarity.lshTopK(spark, sfDir, k = k, nQueries = nQ))),
        "vector_lsh_topk (bits=6)" ->
          (() => resultSet(Similarity.lshTopK(spark, sfDir, k = k, nQueries = nQ,
            bitsOpt = Some(6)))),
        "vector_lsh_topk_mp (multi-probe)" ->
          (() => resultSet(Similarity.lshTopKMultiProbe(spark, sfDir, k = k, nQueries = nQ))),
        "vector_ivf_topk" ->
          (() => resultSet(Similarity.ivfTopK(spark, sfDir, k = k, nQueries = nQ))),
        "vector_ivf_trained (exact k-means, 1 iter, nProbe=3)" ->
          (() => resultSet(Similarity.ivfTrainedTopK(spark, sfDir, k = k, nQueries = nQ))),
        "vector_pq_topk (raw ADC)" ->
          (() => resultSet(Similarity.pqTopK(spark, sfDir, k = k, nQueries = nQ))),
        "vector_pq_rerank (ADC + exact rerank)" ->
          (() => resultSet(Similarity.pqRerankTopK(spark, sfDir, k = k, nQueries = nQ))),
        "vector_ivfpq_topk (IVFADC)" ->
          (() => resultSet(Similarity.ivfPqTopK(spark, sfDir, k = k, nQueries = nQ))),
        "vector_ivfpq_rerank (IVFADC + exact rerank)" ->
          (() => resultSet(Similarity.ivfPqRerankTopK(spark, sfDir, k = k, nQueries = nQ))),
        "vector_sq8_topk (int8 codes, integer dot)" ->
          (() => resultSet(Similarity.sq8TopK(spark, sfDir, k = k, nQueries = nQ))))
      println(s"| index | recall@$k over $nQ queries |")
      println("|---|---|")
      probes.foreach { case (name, fn) =>
        val got = fn()
        val recall = (exact & got).size.toDouble / exact.size
        println(f"| $name | $recall%.3f |")
      }
      // the graph family answers top-1 (one walk terminal per query):
      // measure recall@1 against the exact top-1, at 1 and at nEntries
      // starts — multi-start is the graph family's recall knob
      val exact1 = resultSet(Similarity.topK(spark, sfDir, k = 1, nQueries = nQ))
      Seq(1, 8).foreach { ne =>
        val got = Similarity.graphGreedySearch(spark, sfDir, nQueries = nQ,
            nEntries = ne)
          .select("qid", "node").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (exact1 & got).size.toDouble / exact1.size
        println(f"| graph_greedy_search (deg=8, $ne%d starts) | $recall%.3f @1 |")
      }
      // beam search answers top-k: measured on the family's recall@k axis
      Seq((4, 6), (8, 8), (16, 8)).foreach { case (b, st) =>
        val beam = resultSet(Similarity.graphBeamSearch(spark, sfDir,
            nQueries = nQ, beamWidth = b, steps = st, k = k)
          .withColumnRenamed("node", "vec_id"))
        val beamRecall = (exact & beam).size.toDouble / exact.size
        val b1 = Similarity.graphBeamSearch(spark, sfDir, nQueries = nQ,
            beamWidth = b, steps = st, k = 1)
          .select("qid", "node").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val r1 = (exact1 & b1).size.toDouble / exact1.size
        println(f"| graph_beam_search (deg=8, beam $b%d, $st%d steps) | $beamRecall%.3f @$k, $r1%.3f @1 |")
      }
      // hierarchical search: hash-drawn layers route the entry instead
      // of the multi-start spread
      Seq((8, 8), (16, 8)).foreach { case (b, st) =>
        // ONE search per config: the rn==1 rows of the k-result ARE the
        // k=1 result (same visited set and window, only the rn filter
        // differs) — each hnsw call rebuilds three graphs, so don't pay
        // it twice
        val rows = Similarity.hnswSearch(spark, sfDir,
            nQueries = nQ, beamWidth = b, steps = st, k = k)
          .select("qid", "rn", "node").collect()
        val hn = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
        val h1 = rows.filter(_.getInt(1) == 1)
          .map(r => (r.getLong(0), r.getLong(2))).toSet
        val hr = (exact & hn).size.toDouble / exact.size
        val hr1 = (exact1 & h1).size.toDouble / exact1.size
        println(f"| graph_hnsw_search (deg=8, beam $b%d, $st%d steps) | $hr%.3f @$k, $hr1%.3f @1 |")
      }
      clusteredSection(spark, k, nQ)
    } finally spark.stop()
  }

  /** HNSW vs multi-start beam on CLUSTERED embeddings, at equal base
    * budget (beam 8 × 8 steps × deg 8 on both; HNSW additionally pays
    * its width-1 upper-layer routing, multi-start its 8 spread
    * entries) — the measurement behind README's "the hierarchy's win
    * needs clustered embeddings" claim. */
  private def clusteredSection(spark: SparkSession, k: Int, nQ: Int): Unit = {
    import graft.operators.Similarity
    val cdir = clusteredFixtureDir(spark)
    val exact = resultSet(Similarity.topK(spark, cdir, k = k, nQueries = nQ))
    val exact1 = resultSet(Similarity.topK(spark, cdir, k = 1, nQueries = nQ))
    require(exact.nonEmpty, "clustered fixture produced no exact baseline")
    println(s"| clustered fixture (16 centers x 125 pts, dim 64, noise 1/8) | recall@$k over $nQ queries |")
    println("|---|---|")
    val beamRows = Similarity.graphBeamSearch(spark, cdir, nQueries = nQ,
        beamWidth = 8, steps = 8, k = k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val beam = beamRows.map(r => (r._1, r._3)).toSet
    val beam1 = beamRows.filter(_._2 == 1).map(r => (r._1, r._3)).toSet
    println(f"| graph_beam_search (8 starts, beam 8, 8 steps) | ${(exact & beam).size.toDouble / exact.size}%.3f @$k, ${(exact1 & beam1).size.toDouble / exact1.size}%.3f @1 |")
    val hnswRows = Similarity.hnswSearch(spark, cdir, nQueries = nQ,
        beamWidth = 8, steps = 8, k = k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val hn = hnswRows.map(r => (r._1, r._3)).toSet
    val h1 = hnswRows.filter(_._2 == 1).map(r => (r._1, r._3)).toSet
    println(f"| graph_hnsw_search (hierarchy routing, beam 8, 8 steps) | ${(exact & hn).size.toDouble / exact.size}%.3f @$k, ${(exact1 & h1).size.toDouble / exact1.size}%.3f @1 |")
    // IVF seeded vs TRAINED codebook at EQUAL nProbe — the README claim
    // "on clustered embeddings training raises recall at equal nProbe",
    // measured (published either way it comes out) on TWO geometries:
    // the well-separated fixture above, and a BLURRED variant (noise
    // ±1/2 vs center spread ~±1) where clusters overlap and cell
    // boundaries cut through mass — the regime where codebook placement
    // can matter at all. On well-separated clusters assignment
    // co-locates each whole cluster with its neighbors no matter where
    // the centroids sit, so any codebook is recall-perfect there.
    val blurDir = clusteredFixtureDir(spark, noiseRange = 1025L)
    val dissDir = clusteredFixtureDir(spark, noiseRange = 2049L)
    val dissExact = resultSet(Similarity.topK(spark, dissDir, k = k,
      nQueries = nQ))
    val blurExact = resultSet(Similarity.topK(spark, blurDir, k = k,
      nQueries = nQ))
    for ((tag, dirX, ex) <- Seq(("separated", cdir, exact),
           ("blurred", blurDir, blurExact),
           ("dissolved", dissDir, dissExact));
         nc <- Seq(8, 16); np <- Seq(1, 2)) {
      val seed = resultSet(Similarity.ivfTopK(spark, dirX, k = k,
        nQueries = nQ, nCells = nc, nProbe = np))
      val t1 = resultSet(Similarity.ivfTrainedTopK(spark, dirX, k = k,
        nQueries = nQ, nCells = nc, nProbe = np, iters = 1))
      val t3 = resultSet(Similarity.ivfTrainedTopK(spark, dirX, k = k,
        nQueries = nQ, nCells = nc, nProbe = np, iters = 3))
      def r(s: Set[(Long, Long)]) = (ex & s).size.toDouble / ex.size
      println(f"| ivf $tag nCells=$nc nProbe=$np: seed ${r(seed)}%.3f, " +
        f"trained(1) ${r(t1)}%.3f, trained(3) ${r(t3)}%.3f |")
    }
  }
}
