package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.{DataConfig, DatasetCatalog, Datum}
import graft.operators._
import graft.operators.Ingest.IngestConfig

/** The reference's full lifecycle end-to-end through this engine's public
  * API (SURVEY.md §3): create dataset → insert (upsert+TTL) → background
  * Process (stats + index) → SearchStream (grouped multi-score search) →
  * DataStream (export). One integration path touching every subsystem. */
class WorkflowSpec extends SparkTestBase {

  import spark.implicits._

  test("veri lifecycle: create -> insert -> stats -> search -> export") {
    val root = Files.createTempDirectory("graft-e2e").toString
    val catalog = new DatasetCatalog(spark, root)

    // S3: DDL with properties
    val cfg = catalog.createIfNotExists(DataConfig("vectors", version = 1, targetN = 100))
    assert(cfg.retentionDays == 14)

    // S1/F5: batch insert with upsert semantics into the Datum schema
    def datumDF(rows: (Seq[Float], String, String)*) =
      rows.map { case (f, g, l) => Datum(f, g, l) }.toDF()
        .withColumnRenamed("groupLabel", "group_label")
        .withColumnRenamed("expireAt", "expire_at")
    val batch1 = datumDF(
      (Seq(1f, 0f), "g1", """{"cat":"a"}"""),
      (Seq(0.9f, 0.1f), "g1", """{"cat":"a"}"""),
      (Seq(0f, 1f), "g2", """{"cat":"b"}"""))
    catalog.write("vectors", batch1)
    val batch2 = datumDF((Seq(-1f, 0f), "g2", """{"cat":"b"}"""))
    val merged = Ingest.upsert(catalog.table("vectors"), batch2,
      IngestConfig(Datum.keyColumns, Datum.valueColumns))
    catalog.write("vectors_v2", merged)
    assert(catalog.table("vectors_v2").count() == 4)

    // G1-G4: the Process stats pass
    val info = Stats.dataInfo(catalog.table("vectors_v2"), "feature").head()
    assert(info.getLong(0) == 4)
    assert(math.abs(info.getSeq[Double](3).sum - 1.0) <= 1e-9)

    // J4/A1-A6 + F1: grouped, filtered, multi-query search
    val queries = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
      .toDF(Search.QueryIdCol, "feature")
    val res = Search.multiSearch(catalog.table("vectors_v2"), queries,
      SearchConfig(filters = Seq("cat"), groupLimit = 2, limit = 2,
        keyCols = Datum.keyColumns, tieBreakCol = Some("label")))
    val byQuery = res.select(Search.QueryIdCol, "group_label", Search.ScoreCol)
      .as[(Long, String, Double)].collect().groupBy(_._1)
    assert(byQuery(1L).nonEmpty && byQuery(2L).nonEmpty)
    // query [1,0]: g1's two close vectors (sum/len^2 rewards the pair) beat g2
    assert(byQuery(1L).minBy(_._3)._2 == "g1")

    // S2: export is any read
    assert(catalog.table("vectors_v2").collect().length == 4)

    // S5: persistence round-trip
    catalog.save()
    val reloaded = new DatasetCatalog(spark, root)
    reloaded.load()
    assert(reloaded.get("vectors").exists(_.targetN == 100))
  }
}
