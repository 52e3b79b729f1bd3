package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev-only calibration probe for [[Dedup.simhashAutoBlocks]]: measures,
  * per block count B, the pigeonhole join's candidate volume (pairs
  * surviving the first-agree dedup BEFORE the hamming filter) and wall
  * time on the rehearsal corpus — the evidence the auto dispatcher's
  * cost model is calibrated against (BASELINE.md round 6).
  * sbt "Test/runMain graft.queries.SimhashProbe" */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    import spark.implicits._
    val docs = spark.read.parquet("/tmp/graft_sf1/documents.parquet")
    val withH = docs.select($"doc_id",
      Dedup.simhash($"text").as("simhash")).localCheckpoint(true)
    println(s"[probe] n=${withH.count()}")
    for (scale <- Seq(5000L, 55125L); b <- Seq(5, 6, 7)) {
      val part = withH.filter($"doc_id" % lit(55125L / scale) === 0)
        .localCheckpoint(true)
      val n = part.count()
      val t0 = System.nanoTime()
      val np = Dedup.simhashPairs(part, "doc_id", "simhash",
        maxHamming = 4, blocks = b).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] n=$n%-6d B=$b%-2d pairs=$np%-8d ${sec}%6.2f s")
    }
    spark.stop()
  }
}
