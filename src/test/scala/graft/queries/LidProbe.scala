package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{LangId, LangIdFixture}

object LidProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    import spark.implicits._
    val tr = LangIdFixture.Train.toDF("lang", "text")
    val grams = tr.select(explode(LangId.charGrams(col("text"), 3)).as("g"))
    println(s"total grams=${grams.count()} distinct=${grams.distinct().count()}")
    for (cap <- Seq(4000, 8000, 16000, 30000)) {
      val m = LangId.train(tr, "lang", "text", 3, cap)
      val held = LangIdFixture.HeldOut.zipWithIndex
        .map { case ((l, t), i) => (i.toLong, l, t) }.toDF("sid", "truth", "text")
      val rows = LangId.scoreDocs(held, "sid", "text", m, Seq("truth"))
        .select("truth", "lang_pred").as[(String, String)].collect()
      val acc = rows.count(r => r._1 == r._2).toDouble / rows.length
      val miss = rows.filter(r => r._1 != r._2).map(r => s"${r._1}->${r._2}").mkString(",")
      println(f"cap=$cap vocab=${m.vocabSize} acc=$acc%.3f miss=$miss")
    }
    spark.stop()
  }
}
