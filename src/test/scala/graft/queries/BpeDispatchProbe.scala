package graft.queries

import graft.operators.Bpe

/** Dev probe: chain vs kernel wall clock at small merge counts — where
  * (if anywhere) the literal replace chain still wins, to place the
  * [[Bpe.ReplaceChainMax]] dispatch honestly.
  * sbt "Test/runMain graft.queries.BpeDispatchProbe" */
object BpeDispatchProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    import spark.implicits._
    val docs = spark.read.parquet("/tmp/graft_sf1/documents.parquet")
    val wf = Bpe.wordFreq(docs, "text", maxWordTypes = 20000)
    val m = Bpe.trainMerges(wf, numMerges = 100)
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-20s best=${runs.min}%6.2f s")
    }
    for (k <- Seq(4, 16, 64)) {
      val mk = m.take(k)
      time(s"chain$k")(docs.select($"doc_id",
        Bpe.tokenCountFromSegments(Bpe.segmentTokensChain($"text", mk)).as("n")))
      time(s"kernel$k")(docs.select($"doc_id",
        Bpe.tokenCountFromSegments(Bpe.segmentTokensKernel($"text", mk)).as("n")))
    }
    spark.stop()
  }
}
