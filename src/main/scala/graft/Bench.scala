package graft

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with total + per-query seconds.
  * A warmup action first absorbs JVM/parquet-footer/codegen startup so the
  * per-query numbers measure the plans, not Spark boot. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()

    // evaluate = noop-sink write, NOT count(): under count() the optimizer
    // column-prunes the projections away entirely, so a map-only query
    // (text_redact's regexes, the quality kernels) benchmarks a bare
    // row-count scan and a 10× kernel regression is invisible. The noop
    // sink forces every output column through the full plan.
    def evaluate(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warmup: small end-to-end query (JIT, codegen, parquet footers)
    try evaluate(SparkEntry.queries("knn_l2")(spark, sfDir))
    catch { case _: Throwable => () }

    // best of 3 runs per query: single-run numbers were ±30% noisy and
    // best-of-2 still swung individual queries 2× between bench
    // invocations on a shared box. A query that throws is reported as -1
    // and EXCLUDED from the total (round-1 summed the exception path's
    // elapsed time, which could mask failures as plausible numbers).
    // driver contract: no args. Extra args are a local dev convenience:
    // bench only the named queries.
    val only = args.toSet
    val bestOf = 3
    // VERDICT r12 #7: best-of-3 left ±9% total noise on a shared box, and
    // the noise budget is dominated by the multi-second queries. Queries
    // whose best-of-3 min is still above the cutoff get TWO extra runs
    // (best of 5). Bounded wall-clock cost (only the slow tail pays),
    // sub-cutoff queries measure exactly as before.
    val slowBestOf = 5
    val slowCutoffSec = 1.5
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try { evaluate(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
      val runs0 = Seq.fill(bestOf)(once()).flatten
      val runs = if (runs0.nonEmpty && runs0.min > slowCutoffSec)
        runs0 ++ Seq.fill(slowBestOf - bestOf)(once()).flatten
      else runs0
      name -> (if (runs.isEmpty) -1d else runs.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // sfDir is user input on the one-line JSON protocol — escape like
    // Verify.q does (query names are identifier-safe and need none)
    val sfJson = sfDir.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfJson"}"""
    println(line)
    // VERDICT r12 #2: the full line above is ~7 KB for 182 queries and the
    // driver's log capture keeps only a short output TAIL — two rounds
    // running the line's head was cut off and the driver parsed nothing
    // (BENCH_r11/r12 `parsed: null`). Print a SECOND, short summary line
    // LAST — total, query count, failed list, no per-query map — so any
    // tail window of a few hundred bytes still contains one complete,
    // parseable JSON line. The full line keeps the original contract; the
    // complete per-query map is also persisted in BENCH_SELF.json below.
    val short = s"""{"metric":"total","value":$total,"unit":"sec","queries_n":${results.size},"failed":$failed,"sf":"$sfJson"}"""
    println(short)
    // ALSO persist the complete artifact at the repo root (VERDICT r7 #3):
    // the driver's log capture has head-truncated the printed line two
    // rounds running, so cross-round comparison gets a self-written file
    // that never depends on a log tail. Same payload plus run config —
    // one line, matching the BENCH_rXX convention, and bestOf derived
    // from the SAME constant the timing loop uses (ADVICE r8). ONLY the
    // contract-shaped no-arg run writes it: an arg-filtered dev run would
    // silently clobber the full-set artifact with a partial one.
    val self =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""failed":$failed,"sf":"$sfJson",""" +
        s""""config":{"spark":"${spark.version}",""" +
        s""""master":"${spark.sparkContext.master}",""" +
        s""""shufflePartitions":"${spark.conf.get("spark.sql.shuffle.partitions")}",""" +
        s""""queryCount":${results.size},"bestOf":$bestOf,""" +
        s""""slowBestOf":$slowBestOf,"slowCutoffSec":$slowCutoffSec,""" +
        s""""wallClockUtc":"${java.time.Instant.now()}"}}"""
    // ... and only at the driver's bench SF: a no-arg run pointed at a
    // smaller dev SF dir would clobber the sf0.1 artifact with numbers
    // that cannot be compared across rounds (this happened once — the
    // committed artifact silently became an sf0.01 run)
    val benchGradeSf = sfDir.replaceAll("/+$", "").endsWith("sf0.1")
    if (only.isEmpty && benchGradeSf)
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SELF.json"),
        self.getBytes("UTF-8"))
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] could not write BENCH_SELF.json: $e") }
    else if (only.isEmpty)
      System.err.println(s"[bench] dev SF dir $sfDir — BENCH_SELF.json not written")
    spark.stop()
  }
}
