package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Optimization-round measurement harness (guide §1): runs named queries
  * (or all) against a data dir, timing each with the noop sink and
  * counting Spark jobs / stages / tasks / shuffle bytes via a listener —
  * the local-mode stand-in for the Spark UI's stage table. Optionally
  * writes `.explain("formatted")` to plans/<tag>/<query>_<suffix>.txt.
  *
  * Usage: runMain graft.tools.Profile <dataDir> [--plans <dir> <suffix>] [query...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val (plansDir, suffix, rest) = args.toList match {
      case d :: "--plans" :: p :: s :: qs => (Some(p), s, d :: qs)
      case other => (None, "", other)
    }
    val dataDir = rest.head
    val only = rest.tail.toSet
    val spark = graft.GraftSession.local()

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var shuffleRead = 0L
    @volatile var shuffleWrite = 0L
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          stages += 1
          tasks += sc.stageInfo.numTasks
          shuffleRead += sc.stageInfo.taskMetrics.shuffleReadMetrics.remoteBytesRead +
            sc.stageInfo.taskMetrics.shuffleReadMetrics.localBytesRead
          shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def evaluate(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warmup (JIT, codegen, parquet footers) — same as Bench
    try evaluate(graft.SparkEntry.queries("knn_l2")(spark, dataDir))
    catch { case _: Throwable => () }

    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    qs.foreach { case (name, fn) =>
      plansDir.foreach { pd =>
        try {
          val df = fn(spark, dataDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val p = java.nio.file.Paths.get(pd)
          java.nio.file.Files.createDirectories(p)
          java.nio.file.Files.write(p.resolve(s"${name}_$suffix.txt"),
            txt.getBytes("UTF-8"))
        } catch { case e: Throwable =>
          System.err.println(s"[profile] $name explain failed: $e") }
      }
      // one timed run AFTER the explain (the explain itself plans but
      // does not execute; model caches warm on the first run below)
      spark.sparkContext.setJobDescription(name)
      synchronized { jobs = 0; stages = 0; tasks = 0; shuffleRead = 0; shuffleWrite = 0 }
      val t0 = System.nanoTime()
      val ok = try { evaluate(fn(spark, dataDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[profile] $name failed: $e"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      // second timed run: caches/stored indexes warm — the bench's
      // best-of-3 effectively measures this one
      val t1 = System.nanoTime()
      val j1 = jobs; val s1 = stages; val k1 = tasks
      val sr1 = shuffleRead; val sw1 = shuffleWrite
      synchronized { jobs = 0; stages = 0; tasks = 0; shuffleRead = 0; shuffleWrite = 0 }
      if (ok) try evaluate(fn(spark, dataDir)) catch { case _: Throwable => () }
      val dt2 = (System.nanoTime() - t1) / 1e9
      println(f"PROF $name%-28s run1=$dt%7.3fs jobs=$j1%3d stages=$s1%4d tasks=$k1%5d shR=${sr1 / 1024}%8dK shW=${sw1 / 1024}%8dK | run2=$dt2%7.3fs jobs=$jobs%3d stages=$stages%4d tasks=$tasks%5d shR=${shuffleRead / 1024}%8dK shW=${shuffleWrite / 1024}%8dK")
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
