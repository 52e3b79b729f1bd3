package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** ANN recall vs the exact brute-force oracle (SURVEY.md §5 test 5) on the
  * real sf0.001 embeddings, plus the reference's name-prefix routing. */
class AnnSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def cfg(fn: String, higher: Boolean) = SearchConfig(
    scoreFuncName = fn, higherIsBetter = higher, limit = 10,
    featureCol = "embedding", keyCols = Seq("vec_id"), tieBreakCol = Some("vec_id"))

  private def queryVec(id: Long): Seq[Float] =
    emb.filter($"vec_id" === id).select("embedding").as[Seq[Float]].head

  private def recallAt10(fn: String, higher: Boolean,
      approx: (Seq[Float], SearchConfig) => org.apache.spark.sql.DataFrame): Double = {
    val queries = Seq(0L, 7L, 23L, 111L, 200L)
    val scores = queries.map { qid =>
      val q = queryVec(qid)
      val c = cfg(fn, higher)
      val exact = Search.search(emb, q, c).select("vec_id").as[Long].collect().toSet
      val got = approx(q, c).select("vec_id").as[Long].collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    scores.sum / scores.size
  }

  test("LSH recall@10 >= 0.8 vs brute force (euclidean)") {
    val r = recallAt10("VectorDistance", higher = false,
      (q, c) => Ann.lshSearch(emb, q, c))
    assert(r >= 0.8, s"mean recall $r")
  }

  test("LSH recall@10 >= 0.8 vs brute force (angular, normalized)") {
    val r = recallAt10("AngularDistance", higher = true,
      (q, c) => Ann.lshSearch(emb, q, c))
    assert(r >= 0.8, s"mean recall $r")
  }

  test("IVF: probing all cells is exact; few cells trades recall for scan fraction") {
    val (indexed, centroids) = Ann.ivfBuild(emb, "embedding", k = 8, normalize = false)
    indexed.cache()
    val full = recallAt10("VectorDistance", higher = false,
      (q, c) => Ann.ivfSearch(indexed, centroids, q, c, nProbe = 8))
    assert(full == 1.0, s"probing every cell must be exact, got $full")
    val partial = recallAt10("VectorDistance", higher = false,
      (q, c) => Ann.ivfSearch(indexed, centroids, q, c, nProbe = 3))
    assert(partial >= 0.6, s"nProbe=3 recall $partial")
    indexed.unpersist()
  }

  test("LSH recall on REAL 512-dim news embeddings (the reference's fixture)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("title", StringType),
      StructField("embedding", ArrayType(FloatType))))
    val news = spark.read.schema(schema)
      .json(getClass.getResource("/news_title_embeddings.jsonl").getPath)
    val c = SearchConfig(scoreFuncName = "AngularDistance", higherIsBetter = true,
      limit = 10, featureCol = "embedding", keyCols = Seq("title"),
      tieBreakCol = Some("title"))
    val q = news.limit(1).select("embedding").as[Seq[Float]].head
    val exact = Search.search(news, q, c).select("title").as[String].collect().toSet
    val approx = Ann.lshSearch(news, q, c, bucketLength = 2.0)
      .select("title").as[String].collect().toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"512-dim news recall $recall")
  }

  test("IVF stored partitioned by cluster: probes prune partitions (the 100TB layout)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val catalog = new graft.model.DatasetCatalog(spark, dir)
    val (indexed, centroids) = Ann.ivfBuild(emb, "embedding", k = 8, normalize = false)
    catalog.writePartitioned("ivf_idx", indexed, "cluster")

    val stored = catalog.table("ivf_idx")
    val res = Ann.ivfSearch(stored, centroids, queryVec(0L),
      cfg("VectorDistance", higher = false), nProbe = 2)
    val scan = res.queryExecution.executedPlan.toString
    // partition pruning: the cluster IN filter lands in PartitionFilters
    assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(scan).isDefined,
      s"no partition pruning in:\n$scan")
    assert(res.count() == 10)
  }

  test("route: Annoy* names go approximate, others exact (search.go:136-141)") {
    val q = queryVec(0L)
    val exactPlan = Ann.route(emb, q, cfg("VectorDistance", higher = false))
    assert(exactPlan.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val approx = Ann.route(emb, q, cfg("AnnoyVectorDistance", higher = false))
    assert(approx.count() == 10)
  }
}
