package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Automatic inverted-vs-prefix plan selection for Jaccard dedup
  * (VERDICT r4 #2): [[Dedup.jaccardDfFanout]] measures the fraction of
  * inverted-index mass in hot shingles on a bounded doc sample;
  * [[Dedup.jaccardPairsAuto]] dispatches on the measured crossover.
  * These specs pin (a) the statistic separates the two corpus shapes,
  * including on the REAL driver fixtures, (b) auto output equals both
  * physical plans, and (c) the sampled probe is deterministic and
  * layout-independent. */
class JaccardAutoSpec extends SparkTestBase {

  import spark.implicits._

  private def flatCorpus = (0L until 300L)
    .map(i => (i, (1 to 10).map(j => s"w${i}x$j").mkString(" ")))
    .toDF("doc_id", "text")

  private def skewCorpus = (0L until 300L)
    .map(i => (i, (1 to 10).map(j => s"w${i}x$j").mkString(" ") +
      " all rights reserved site footer text"))
    .toDF("doc_id", "text")

  test("df fan-out separates flat and boilerplate corpora") {
    val hmFlat = Dedup.jaccardDfFanout(flatCorpus, "doc_id", "text")
    val hmSkew = Dedup.jaccardDfFanout(skewCorpus, "doc_id", "text")
    info(f"fanout flat=$hmFlat%.2f skew=$hmSkew%.2f crossover=${Dedup.PrefixFanoutCrossover}")
    assert(hmFlat < Dedup.PrefixFanoutCrossover)
    assert(hmSkew > Dedup.PrefixFanoutCrossover)
  }

  test("real driver fixtures land on the measured sides of the crossover") {
    val dir01 = "/root/testdata/sf0.01"
    val dir1 = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$dir01/documents.parquet").exists())
    assume(new java.io.File(s"$dir1/documents.parquet").exists())
    val docs = graft.queries.Tables(spark, dir01, "documents").select("doc_id", "text")
    // the flat fixture: documents + near-copies (same shape as the
    // dedup_jaccard_pairs corpus)
    val flat = docs.unionByName(docs.filter(col("doc_id") < 25)
      .select((col("doc_id") + 10000000).as("doc_id"),
        concat(col("text"), lit(" extra token padding")).as("text")))
    // the skewed Zipf-boilerplate footer of dedup_jaccard_skew, on BOTH
    // corpus sizes: at 525 docs its measured fan-out (~13) sits BELOW
    // the crossover — the blowup is real but small and inverted is
    // genuinely faster there (bench: 0.49 vs 0.67 s) — while at 5k docs
    // (~99) the quadratic growth has crossed over and prefix must win
    val u = col("doc_id") % 100
    val tpl = when(u < 35, lit(0L)).when(u < 45, lit(1L)).when(u < 51, lit(2L))
      .when(u < 55, lit(3L)).when(u < 58, lit(4L)).when(u < 60, lit(5L))
      .when(u < 61, lit(6L)).otherwise(col("doc_id") + 100)
    val k = tpl.cast("string")
    def skewed(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
      concat(col("text"), lit(" rights t"), k, lit(" reserved t"), k,
        lit(" terms t"), k, lit(" service t"), k, lit(" privacy t"), k).as("text"))
    val docs1 = graft.queries.Tables(spark, dir1, "documents").select("doc_id", "text")
    val hmFlat = Dedup.jaccardDfFanout(flat, "doc_id", "text")
    val hmSkewSmall = Dedup.jaccardDfFanout(skewed(flat), "doc_id", "text")
    val hmSkewBig = Dedup.jaccardDfFanout(skewed(docs1), "doc_id", "text")
    info(f"real-fixture fanout flat=$hmFlat%.2f skew525=$hmSkewSmall%.2f skew5k=$hmSkewBig%.2f")
    assert(hmFlat < Dedup.PrefixFanoutCrossover,
      f"flat fixture measured skewed ($hmFlat%.2f) — dispatcher would mis-pick prefix")
    assert(hmSkewSmall < Dedup.PrefixFanoutCrossover,
      f"small skew fixture ($hmSkewSmall%.2f) crossed over — inverted is measured faster there")
    assert(hmSkewBig > Dedup.PrefixFanoutCrossover,
      f"5k-doc skew fixture measured flat ($hmSkewBig%.2f) — dispatcher would mis-pick inverted")
  }

  test("auto output equals both physical plans on both corpora") {
    for (corpus <- Seq(flatCorpus, skewCorpus)) {
      val auto = Dedup.jaccardPairsAuto(corpus, "doc_id", "text",
          n = 3, threshold = 0.5)
        .collect().toSet
      val inv = Dedup.jaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.5)
        .collect().toSet
      val pre = Dedup.jaccardPairsPrefix(corpus, "doc_id", "text", n = 3, threshold = 0.5)
        .collect().toSet
      assert(auto == inv && auto == pre)
    }
  }

  test("sampled probe detects the hot footer and is layout-independent") {
    val big = (0L until 1200L)
      .map(i => (i, (1 to 10).map(j => s"w${i}x$j").mkString(" ") +
        " all rights reserved site footer text"))
      .toDF("doc_id", "text")
    val hm1 = Dedup.jaccardDfFanout(big, "doc_id", "text", targetSample = 200L)
    val hm2 = Dedup.jaccardDfFanout(big.repartition(13), "doc_id", "text",
      targetSample = 200L)
    info(f"sampled fanout=$hm1%.2f (repartitioned: $hm2%.2f)")
    assert(hm1 > Dedup.PrefixFanoutCrossover)
    // the doc-hash sample is a function of ids, not partition layout
    assert(hm1 == hm2)
    // knownRows (cataloged corpora) skips the count job but must land on
    // the SAME deterministic sample, hence the same statistic
    val hm3 = Dedup.jaccardDfFanout(big, "doc_id", "text",
      targetSample = 200L, knownRows = 1200L)
    assert(hm3 == hm1, s"knownRows probe diverged: $hm3 vs $hm1")
  }
}
