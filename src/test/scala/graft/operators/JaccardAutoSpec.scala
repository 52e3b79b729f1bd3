package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Automatic inverted-vs-prefix plan selection for Jaccard dedup
  * (VERDICT r4 #2): [[Dedup.jaccardHotMass]] measures the fraction of
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

  test("hot mass separates flat and boilerplate corpora") {
    val hmFlat = Dedup.jaccardHotMass(flatCorpus, "doc_id", "text")
    val hmSkew = Dedup.jaccardHotMass(skewCorpus, "doc_id", "text")
    info(f"hotMass flat=$hmFlat%.4f skew=$hmSkew%.4f crossover=${Dedup.PrefixHotMassCrossover}")
    assert(hmFlat < Dedup.PrefixHotMassCrossover)
    assert(hmSkew > Dedup.PrefixHotMassCrossover)
  }

  test("real driver fixtures land on the intended sides of the crossover") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = graft.queries.Tables(spark, dir, "documents").select("doc_id", "text")
    // the flat fixture: documents + near-copies (same shape as the
    // dedup_jaccard_pairs corpus)
    val flat = docs.unionByName(docs.filter(col("doc_id") < 25)
      .select((col("doc_id") + 10000000).as("doc_id"),
        concat(col("text"), lit(" extra token padding")).as("text")))
    // the skewed fixture: same Zipf boilerplate footer as
    // dedup_jaccard_skew (integer CASE on doc_id % 100)
    val u = col("doc_id") % 100
    val tpl = when(u < 35, lit(0L)).when(u < 45, lit(1L)).when(u < 51, lit(2L))
      .when(u < 55, lit(3L)).when(u < 58, lit(4L)).when(u < 60, lit(5L))
      .when(u < 61, lit(6L)).otherwise(col("doc_id") + 100)
    val k = tpl.cast("string")
    val skew = flat.select(col("doc_id"),
      concat(col("text"), lit(" rights t"), k, lit(" reserved t"), k,
        lit(" terms t"), k, lit(" service t"), k, lit(" privacy t"), k).as("text"))
    val hmFlat = Dedup.jaccardHotMass(flat, "doc_id", "text")
    val hmSkew = Dedup.jaccardHotMass(skew, "doc_id", "text")
    info(f"real-fixture hotMass flat=$hmFlat%.4f skew=$hmSkew%.4f")
    assert(hmFlat < Dedup.PrefixHotMassCrossover,
      f"flat fixture measured hot ($hmFlat%.4f) — dispatcher would mis-pick prefix")
    assert(hmSkew > Dedup.PrefixHotMassCrossover,
      f"skew fixture measured flat ($hmSkew%.4f) — dispatcher would mis-pick inverted")
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
    val hm1 = Dedup.jaccardHotMass(big, "doc_id", "text", targetSample = 200L)
    val hm2 = Dedup.jaccardHotMass(big.repartition(13), "doc_id", "text",
      targetSample = 200L)
    info(f"sampled hotMass=$hm1%.4f (repartitioned: $hm2%.4f)")
    assert(hm1 > Dedup.PrefixHotMassCrossover)
    // the doc-hash sample is a function of ids, not partition layout
    assert(hm1 == hm2)
  }
}
