package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{DsirFeatures, DsirGramBuckets, TextHash}
import org.apache.spark.unsafe.types.UTF8String

/** DSIR importance resampling: kernel/reference parity, model fit
  * accounting, resample == rank cut, and the target-shift property. */
class DsirSpec extends SparkTestBase {

  import spark.implicits._

  private val B = 64

  /** Independent reference: gram sequence in position order. */
  private def refGrams(text: String): Seq[String] = {
    val t = TextHash.WS.split(text.toLowerCase).filter(_.nonEmpty).toSeq
    t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private def refBucket(g: String): Int =
    (TextHash.poly(g, DsirFeatures.GramMult) % B).toInt

  test("gramBuckets: position order, unigrams then bigrams, occurrences kept") {
    val texts = Seq("the cat sat on the mat", "one", "", "a a a",
      "Tabs\tand\nnewlines  collapse")
    val got = texts.toDF("text")
      .select(DsirGramBuckets(col("text"), B).as("bs"))
      .as[Seq[Int]].collect()
    texts.zip(got).foreach { case (t, bs) =>
      assert(bs == refGrams(t).map(refBucket), s"mismatch for '$t'")
    }
  }

  test("fit: counts sum to total, total == sum over docs of 2n-1 grams") {
    val docs = Seq("alpha beta gamma", "alpha beta", "delta").toDF("text")
    val m = Dsir.fit(docs, "text", B)
    assert(m.total == (5 + 3 + 1))
    assert(m.counts.sum == m.total)
    // the alpha-beta bigram appears twice; its bucket carries both
    val ab = refBucket("alpha beta")
    assert(m.counts(ab) >= 2)
  }

  test("fitBoth == (fit(filtered), fit(all)), in one scan") {
    val docs = Seq(
      (1L, true, "alpha beta gamma"),
      (2L, false, "alpha delta"),
      (3L, true, "epsilon"),
      (4L, false, "")).toDF("doc_id", "is_t", "text")
    val (t2, r2) = Dsir.fitBoth(docs, "text", col("is_t"), B)
    val t1 = Dsir.fit(docs.filter($"is_t"), "text", B)
    val r1 = Dsir.fit(docs, "text", B)
    assert(t2.counts.toSeq == t1.counts.toSeq && t2.total == t1.total)
    assert(r2.counts.toSeq == r1.counts.toSeq && r2.total == r1.total)
    // a null predicate value counts toward RAW only, like filter would
    val withNull = Seq((1L, Some(true), "x y"), (2L, None, "x")).toDF("doc_id", "is_t", "text")
    val (tn, rn) = Dsir.fitBoth(withNull, "text", col("is_t"), B)
    assert(tn.total == 3L && rn.total == 4L)
  }

  test("update == retrain EXACTLY (integer counts over a fixed space)") {
    val a = Seq("alpha beta gamma", "delta epsilon").toDF("text")
    val b = Seq("alpha beta", "zeta eta theta iota").toDF("text")
    val updated = Dsir.update(Dsir.fit(a, "text", B), b, "text")
    val retrained = Dsir.fit(a.unionByName(b), "text", B)
    assert(updated.counts.toSeq == retrained.counts.toSeq)
    assert(updated.total == retrained.total)
    // and merge order is irrelevant (addition commutes)
    val other = Dsir.merge(Dsir.fit(b, "text", B), Dsir.fit(a, "text", B))
    assert(other.counts.toSeq == retrained.counts.toSeq)
  }

  test("save/load round-trips the model exactly") {
    val dir = java.nio.file.Files.createTempDirectory("dsir_model").toString
    val m = Dsir.fit(Seq("alpha beta gamma", "beta beta").toDF("text"), "text", B)
    Dsir.save(spark, dir, m)
    val back = Dsir.load(spark, dir)
    assert(back.buckets == m.buckets && back.total == m.total)
    assert(back.counts.toSeq == m.counts.toSeq)
    // corrupt header fails loudly naming the file (drop the Hadoop
    // checksum sibling too — a raw rewrite would otherwise trip the
    // CRC check before the header parse runs)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, ".dsir_bow.tsv.crc"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "dsir_bow.tsv"), "not_a_model\t9\n1\t2\n")
    val e = intercept[IllegalArgumentException](Dsir.load(spark, dir))
    assert(e.getMessage.contains("dsir_bow.tsv"))
  }

  test("fit rejects an unbounded bucket space loudly") {
    val docs = Seq("x").toDF("text")
    val e = intercept[IllegalArgumentException](
      Dsir.fit(docs, "text", Dsir.MaxBuckets + 1))
    assert(e.getMessage.contains("driver-bounded"))
  }

  test("scoreDocs == driver-side position-ordered fold, fold order pinned") {
    val texts = Seq("the cat sat", "dog dog dog dog", "un deux trois quatre")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val target = Dsir.fit(docs.filter($"doc_id" === 0L), "text", B)
    val raw = Dsir.fit(docs, "text", B)
    val ratios = Dsir.logRatios(target, raw)
    val got = Dsir.scoreDocs(docs, "text", ratios)
      .select("doc_id", "logw").as[(Long, Double)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      // EXACT equality: the kernel must fold left-to-right from 0.0 —
      // any reordering of addends shows up here as a last-ulp diff
      val want = refGrams(t).foldLeft(0.0)((a, g) => a + ratios(refBucket(g)))
      assert(got(i.toLong) == want, s"fold drifted for '$t'")
    }
  }

  test("logRatios: uniform when target == raw; guards bucket mismatch") {
    val docs = Seq("a b c", "d e").toDF("text")
    val m = Dsir.fit(docs, "text", B)
    assert(Dsir.logRatios(m, m).forall(_ == 0.0))
    val other = Dsir.fit(docs, "text", B * 2)
    val e = intercept[IllegalArgumentException](Dsir.logRatios(m, other))
    assert(e.getMessage.contains("bucket spaces differ"))
  }

  test("gumbelNoise: finite and deterministic across the id range") {
    val ids = Seq(0L, 1L, 42L, -7L, Long.MaxValue, Long.MinValue + 1).toDF("id")
    val g = ids.select(Dsir.gumbelNoise($"id").as("g")).as[Double].collect()
    assert(g.forall(v => !v.isNaN && !v.isInfinite))
    val g2 = ids.select(Dsir.gumbelNoise($"id").as("g")).as[Double].collect()
    assert(g.toSeq == g2.toSeq)
  }

  test("resample == the rank-cut spelling, exactly") {
    val n = 2000
    val docs = (0 until n).map { i =>
      (i.toLong, if (i % 3 == 0) "alpha beta gamma delta" else "omega psi chi")
    }.toDF("doc_id", "text")
    val target = Dsir.fit(docs.filter($"doc_id" % 3 === 0), "text", B)
    val raw = Dsir.fit(docs, "text", B)
    val scored = Dsir.scoreDocs(docs, "text", Dsir.logRatios(target, raw))
    val k = 150L
    val got = Dsir.resample(scored, "doc_id", "logw", k)
      .select("doc_id").as[Long].collect().toSet
    val want = scored
      .withColumn("k", $"logw" + Dsir.gumbelNoise($"doc_id"))
      .orderBy(desc("k"), asc("doc_id")).limit(k.toInt)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    assert(got.size == k)
  }

  test("resample shifts the draw toward the target distribution") {
    val n = 3000
    // half the corpus is target-like, half is not; target model fits on
    // a small target-like slice
    val docs = (0 until n).map { i =>
      val t = if (i % 2 == 0) "science method experiment result analysis"
        else "lorem ipsum dolor sit amet"
      (i.toLong, i % 2 == 0, t)
    }.toDF("doc_id", "is_t", "text")
    val target = Dsir.fit(docs.filter($"is_t" && $"doc_id" < 100), "text", 1024)
    val raw = Dsir.fit(docs, "text", 1024)
    val scored = Dsir.scoreDocs(docs, "text", Dsir.logRatios(target, raw))
    val sel = Dsir.resample(scored, "doc_id", "logw", 300L)
    val tFrac = sel.filter($"is_t").count().toDouble / 300.0
    // corpus is 50% target-like; the importance draw must lean hard into
    // the target (the two vocabularies are disjoint, so weights separate
    // by many nats — the draw is effectively all target-like)
    assert(tFrac > 0.9, s"target fraction $tFrac did not shift")
  }

  test("scoreDocs guards the output-column clash loudly") {
    val docs = Seq((1L, "x", 0.0)).toDF("doc_id", "text", "logw")
    val e = intercept[IllegalArgumentException](
      Dsir.scoreDocs(docs, "text", new Array[Double](B)))
    assert(e.getMessage.contains("rename"))
  }

  test("resample guards non-integral ids and reserved key column") {
    val bad = Seq(("a", 0.1)).toDF("doc_id", "logw")
    val e = intercept[IllegalArgumentException](
      Dsir.resample(bad, "doc_id", "logw", 1L))
    assert(e.getMessage.contains("integral id column"))
    val clash = Seq((1L, 0.1, 2.0)).toDF("doc_id", "logw", "__gkey")
    val e2 = intercept[IllegalArgumentException](
      Dsir.resample(clash, "doc_id", "logw", 1L))
    assert(e2.getMessage.contains("__gkey"))
  }
}
