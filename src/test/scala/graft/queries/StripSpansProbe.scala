package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev-only two-scale probe for [[Dedup.stripHotSpans]] (r5 verdict #3:
  * name the cause of the rehearsal's superlinear growth). Times the full
  * operator AND its stages in isolation at 5k/10k/20k boilerplate docs:
  * gram explode+checkpoint, hot-gram aggregate, covSets join+aggregate,
  * and the rebuild join. Results → BASELINE.md round 6.
  * sbt "Test/runMain graft.queries.StripSpansProbe" */
object StripSpansProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    import spark.implicits._
    val skew = spark.read.parquet("/tmp/graft_sf1/documents_skew.parquet")
    def timeIt(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[strip] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s (rows=$n)")
    }
    // first 5k pass is a discarded JVM/codegen warmup (the r5 two-point
    // comparison was contaminated by exactly this)
    for (nDocs <- Seq(5000L, 5000L, 10000L, 20000L)) {
      val part = skew.filter($"doc_id" < nDocs).localCheckpoint(true)
      println(s"[strip] ---- nDocs=${part.count()}")
      timeIt(s"full_strip_$nDocs")(
        Dedup.stripHotSpans(part, "doc_id", "text", n = 5, minDf = 20L).count())
      // stage 1: positional grams (the first checkpoint)
      val toks = filter(split(lower($"text"), graft.functions.TextHash.WsRegex),
        t => t =!= "")
      val tk = part.select($"doc_id".as("id"), toks.as("__tk"))
      var grams: org.apache.spark.sql.DataFrame = null
      timeIt(s"grams_checkpoint_$nDocs") {
        grams = tk.filter(size($"__tk") >= 5)
          .select($"id", posexplode(
            transform(sequence(lit(0), size($"__tk") - 5),
              i => Dedup.tokHash61(
                array_join(slice($"__tk", i + lit(1), lit(5)), " "))))
            .as(Seq("pos", "h")))
          .localCheckpoint(true)
        grams.count()
      }
      var hot: org.apache.spark.sql.DataFrame = null
      timeIt(s"hot_agg_$nDocs") {
        hot = grams.select($"id", $"h").distinct()
          .groupBy("h").agg(count(lit(1)).as("__df"))
          .filter($"__df" >= 20L).select("h").localCheckpoint(true)
        hot.count()
      }
      timeIt(s"covsets_$nDocs") {
        grams.join(hot, Seq("h"))
          .select($"id", explode(sequence($"pos", $"pos" + 4)).as("pos"))
          .groupBy("id").agg(collect_set($"pos").as("__cov"))
          .count()
      }
    }
    spark.stop()
  }
}
