package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Calibration harness for the jaccardPrefixPairs dispatch thresholds
  * (`quadBudget`, `minPruneFactor`) — times both exact-pair shapes
  * across five candidate-volume regimes and prints candFull (count-join
  * output) vs candPrefix (prefix-join output) alongside wall times.
  * Committed so the numbers in the Dedup scaladoc are reproducible:
  * `sbt -batch "runMain graft.CalibrateJaccard"` on an idle box. */
object CalibrateJaccard {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("calibrate-jaccard")
    import spark.implicits._

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def run(name: String, docs: org.apache.spark.sql.DataFrame, minJ: Double): Unit = {
      import org.apache.spark.sql.expressions.Window
      val sh = docs.select(col("doc_id"), array_sort(graft.operators.Dedup.shingles(col("text"))).as("sh"))
      val inv = sh.select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
      val dfreq = inv.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val st = dfreq.agg(
        coalesce(sum(col("df").cast("double") *
          (col("df") - 1L).cast("double") / lit(2.0)), lit(0.0)),
        coalesce(sum(col("df")), lit(0L))).head()
      val candFull = st.getDouble(0)
      val indexRows = st.getLong(1)
      val prefixLen = (col("n_sh") - ceil(lit(minJ) * col("n_sh") - lit(1e-9)) + 1).cast(IntegerType)
      val ranked = inv.join(dfreq, "s")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
        .filter(col("rn") <= prefixLen)
      val candPrefix = ranked.groupBy(col("s")).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c").cast("double") *
          (col("c") - 1L).cast("double") / lit(2.0)), lit(0.0)))
        .head().getDouble(0)
      // both gates forced off: the harness must time the PREFIX path
      // itself — quadBudget's default would reroute three of the five
      // regimes to the count-join and time the same plan twice
      def prefixPath() = graft.operators.Dedup
        .jaccardPrefixPairsOn(docs, minJ, quadBudget = 0.0, minPruneFactor = 0.0)
        .write.format("noop").mode("overwrite").save()
      def countPath() = graft.operators.Dedup.jaccardPairsOn(docs, minJ)
        .write.format("noop").mode("overwrite").save()
      prefixPath(); countPath()
      val tPrefix = (1 to 2).map(_ => time(prefixPath())._2).min
      val tCount = (1 to 2).map(_ => time(countPath())._2).min
      println(f"[calib] $name%-14s candFull=$candFull%14.0f candPrefix=$candPrefix%12.0f " +
        f"index=$indexRows%10d quad=${candFull / math.max(indexRows, 1L)}%8.1fx " +
        f"prune=${candFull / math.max(candPrefix, 1.0)}%10.1fx tPrefix=$tPrefix%7.2fs tCount=$tCount%7.2fs")
    }

    // flat-df corpus: the word-salad fixture
    run("sf0.01-flat", Tables.loadWide(spark, "/root/testdata/sf0.01", "documents"), 0.9)
    run("sf0.1-flat", Tables.loadWide(spark, "/root/testdata/sf0.1", "documents"), 0.9)

    // mild Zipf: 5000 docs x 40 words, vocab 30k, s=1.1, planted near-dups
    val rnd = new scala.util.Random(7)
    def zipfCorpus(nDocs: Int, vocabN: Int, s: Double, docLen: Int) = {
      val weights = (1 to vocabN).map(r => 1.0 / math.pow(r, s))
      val cum = weights.scanLeft(0.0)(_ + _).tail.toArray
      val total = cum.last
      def draw(): Int = {
        val x = rnd.nextDouble() * total
        val i = java.util.Arrays.binarySearch(cum, x)
        if (i >= 0) i else -i - 1
      }
      val raw = (0 until nDocs).map { i =>
        (i.toLong, (0 until docLen).map(_ => s"w${draw()}"))
      }
      raw.map { case (i, w) =>
        if (i % 10 == 9) (i, (raw((i - 1).toInt)._2.take(docLen - 4) ++
          (0 until 4).map(_ => s"w${draw()}")).mkString(" "))
        else (i, w.mkString(" "))
      }.toDF("doc_id", "text")
    }
    run("zipf-5k", zipfCorpus(5000, 30000, 1.1, 40), 0.9)

    // boilerplate regime (real-text shape: stock phrases / license
    // headers shared corpus-wide): 15 unique-tail words + one 12-word
    // stock phrase from a pool of 5 -> phrase bigrams have df ~ n/5 and
    // candFull goes quadratic while the unique tails keep prefixes cold
    def boiler(nDocs: Int) = {
      val phrases = (0 until 5).map(p => (0 until 12).map(w => s"p${p}_$w"))
      val raw = (0 until nDocs).map { i =>
        val words = (0 until 15).map(w => s"u${i}_$w") ++ phrases(rnd.nextInt(5))
        (i.toLong, words.mkString(" "))
      }
      raw.map { case (i, t) =>
        if (i % 10 == 9) (i, raw((i - 1).toInt)._2) else (i, t)
      }.toDF("doc_id", "text")
    }
    run("boiler-10k", boiler(10000), 0.9)
    run("boiler-20k", boiler(20000), 0.9)
    spark.stop()
  }
}
