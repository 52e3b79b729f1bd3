package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Scratch: which stage shapes allow OptimizeSkewedJoin on a hinted SHJ? */
class SkewProbe2Spec extends SparkTestBase {

  import spark.implicits._

  test("probe: bare join vs join+distinct vs join+groupBy") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val rows = (0 until 5000).map(i => (i.toLong, 0L)) ++
        (0 until 1000).map(i => (100000L + i, 1L + i % 100))
      val df = rows.toDF("id", "k").repartition(8).localCheckpoint(true)
      def joined = df.as("a").join(df.as("b").hint("shuffle_hash"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
        .select(col("a.id").as("x"), col("b.id").as("y"))
      def skewOf(name: String, q: org.apache.spark.sql.DataFrame): Unit = {
        q.queryExecution.toRdd.count()
        val p = q.queryExecution.executedPlan.toString
        info(s"$name skew=true: ${p.contains("skew=true")}")
      }
      skewOf("bare", joined)
      skewOf("distinct", joined.distinct())
      skewOf("groupBy", joined.groupBy("x").count())
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
