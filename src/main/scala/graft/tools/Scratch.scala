package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r13 throwaway measurement main: decompose the prefix-jaccard pipeline
  * and report per-step shuffle volume. Not a query; not wired anywhere. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    val lock = new Object
    var shW = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        lock.synchronized {
          shW += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
    })
    def step(name: String)(f: => Unit): Unit = {
      Thread.sleep(400); lock.synchronized { shW = 0L }
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      val w = lock.synchronized(shW)
      println(f"STEP $name%-28s ${dt}%7.3fs shW=${w / 1024}%9dK")
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // replicate jaccardSkewPrefixQ's input (docsWithSkewedBoilerplate,
    // inlined — the query helper is private)
    val base = graft.queries.Tables(spark, dataDir, "documents")
      .select("doc_id", "text")
    val nearDups = base.unionByName(base.filter(col("doc_id") < 25)
      .select((col("doc_id") + 10000000).as("doc_id"),
        concat(col("text"), lit(" extra token padding")).as("text")))
    val u = col("doc_id") % 100
    val tpl = when(u < 35, lit(0L)).when(u < 45, lit(1L)).when(u < 51, lit(2L))
      .when(u < 55, lit(3L)).when(u < 58, lit(4L)).when(u < 60, lit(5L))
      .when(u < 61, lit(6L)).otherwise(col("doc_id") + 100)
    val k = tpl.cast("string")
    val docs = nearDups.select(col("doc_id"),
      concat(col("text"), lit(" rights t"), k, lit(" reserved t"), k,
        lit(" terms t"), k, lit(" service t"), k, lit(" privacy t"), k).as("text"))
    val t = 0.5 - 1e-6
    var sh: DataFrame = null
    step("sh checkpoint") {
      // hashedShingles uncapped, inlined (private): explode + 61-bit hash
      sh = docs.select(col("doc_id").as("id"),
          explode(graft.operators.Dedup.shingles(col("text"), 3)).as("sh"))
        .select(col("id"), graft.operators.Dedup.tokHash61(col("sh")).as("h"))
        .localCheckpoint(true)
    }
    step("count sh") { println("  sh rows = " + sh.count()) }
    var dfByH: DataFrame = null
    step("dfByH agg") {
      dfByH = sh.groupBy("h").agg(count(lit(1)).as("__df"))
      noop(dfByH)
    }
    step("count dfByH") { println("  dfByH rows = " + dfByH.count()) }
    var sets: DataFrame = null
    step("sets build (df join + groupBy id)") {
      sets = sh.join(dfByH.hint("shuffle_hash"), Seq("h"))
        .groupBy("id")
        .agg(sort_array(collect_list(struct(col("__df"), col("h")))).as("__arr"))
        .select(col("id"),
          transform(col("__arr"), x => x.getField("h")).as("shs"),
          size(col("__arr")).as("sz"))
        .withColumn("__plen", (col("sz") - ceil(col("sz") * t) + 1).cast("int"))
        .localCheckpoint(true)
    }
    val inv = sets.select(col("id"), col("sz"),
        posexplode(slice(col("shs"), lit(1), col("__plen"))))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "h")
    step("inv count") { println("  inv rows = " + inv.count()) }
    var cand: DataFrame = null
    step("cand self-join + pos filter + distinct + ckpt") {
      cand = inv.as("a").join(inv.as("b"),
          col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
            greatest(col("a.sz"), col("b.sz")) * t <= least(col("a.sz"), col("b.sz")) &&
            least(col("a.sz") - col("a.p"), col("b.sz") - col("b.p")) >=
              (col("a.sz") + col("b.sz")) * (t / (1 + t)))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
        .localCheckpoint(true)
    }
    step("cand count") { println("  cand rows = " + cand.count()) }
    step("verify") {
      val candIds = cand.select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
      val vsets = sets.join(broadcast(candIds), Seq("id"), "left_semi")
      val vsetsA = vsets.select(col("id").as("id_a"), col("shs").as("shs_a"), col("sz").as("sz_a"))
      val vsetsB = vsets.select(col("id").as("id_b"), col("shs").as("shs_b"), col("sz").as("sz_b"))
      noop(cand.join(vsetsA.hint("shuffle_hash"), "id_a")
        .join(vsetsB.hint("shuffle_hash"), "id_b")
        .withColumn("inter", size(array_intersect(col("shs_a"), col("shs_b"))))
        .withColumn("jaccard", round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 6))
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard"))
    }
    spark.stop()
  }
}
