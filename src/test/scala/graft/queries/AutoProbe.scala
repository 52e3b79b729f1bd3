package graft.queries
import org.apache.spark.sql.functions._
import graft.operators.Dedup
/** Dev probe: df fan-out + auto-dispatch timing on the sf1 rehearsal
  * corpora (see ScaleRehearsal; numbers recorded in BASELINE.md r5). */
object AutoProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val skew = spark.read.parquet("/tmp/graft_sf1/documents_skew.parquet")
    var t0 = System.nanoTime()
    val f = Dedup.jaccardDfFanout(skew, "doc_id", "text")
    println(f"[probe] sf1_skew fanout=$f%.2f in ${(System.nanoTime()-t0)/1e9}%.2f s")
    t0 = System.nanoTime()
    val n = Dedup.jaccardPairsAuto(skew, "doc_id", "text", n = 3, threshold = 0.5).count()
    println(f"[probe] auto(skew) pairs=$n in ${(System.nanoTime()-t0)/1e9}%.2f s (must track the 3.6s prefix, not the 47s inverted)")
    spark.stop()
  }
}
