package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.DataInfo

/** Exact vs lagged DataInfo: the lagged one-pass version (the reference's
  * real Process semantics, newsync.go:142-167) converges to the exact
  * 3-scan version under repeated runs on static data. */
class StatsSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("dataInfo: n, mean, hist mass, bucket bounds") {
    val r = Stats.dataInfo(emb, "embedding").head()
    assert(r.getLong(0) == emb.count())
    assert(math.abs(r.getSeq[Double](3).sum - 1.0) < 1e-6)
    assert(r.getDouble(2) > 0)
  }

  test("dataInfo on an empty table: zeroed stats, no crash") {
    val empty = emb.filter($"vec_id" < 0)
    val r = Stats.dataInfo(empty, "embedding").head()
    assert(r.getLong(0) == 0 && r.getDouble(2) == 0.0)
    assert(r.getSeq[Double](3).forall(_ == 0.0))
  }

  test("lagged on an empty table: zeroed stats, no crash (maintenance loop)") {
    val r = Stats.dataInfoLagged(emb.filter($"vec_id" < 0), "embedding",
      DataInfo(0, Nil, 0d, Nil))
    assert(r.n == 0 && r.maxDistance == 0.0 && r.hist.forall(_ == 0.0))
  }

  test("vocabulary: HLL mode tracks the exact mode within its error bound") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Stats.vocabulary(docs, "lang", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Stats.vocabulary(docs, "lang", "text", approx = true, rsd = 0.02)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (lang, (v, tot)) =>
      val (va, tota) = approx(lang)
      assert(tota == tot, s"$lang token totals must stay exact")
      assert(math.abs(va - v).toDouble / v <= 0.05,
        s"$lang HLL vocab $va vs exact $v drifts beyond 5%")
    }
  }

  test("a NaN vector element cannot poison max_distance or the histogram") {
    // one NaN row: unguarded, max = NaN and every bucket collapses to 0
    val poisoned = emb.select($"vec_id",
      when($"vec_id" === 0, array(lit(Float.NaN), lit(1f)).cast("array<float>"))
        .otherwise($"embedding").as("embedding"))
    val r = Stats.dataInfo(poisoned, "embedding").head()
    assert(r.getLong(0) == emb.count() - 1) // stats over well-defined vectors
    assert(!r.getDouble(2).isNaN && r.getDouble(2) > 0)
    assert(math.abs(r.getSeq[Double](3).sum - 1.0) < 1e-6)
    assert(r.getSeq[Double](1).forall(!_.isNaN))
  }

  test("lagged survives a dimension change (re-embedded corpus, stale centroid)") {
    // prev centroid from a 2-dim world, current vectors 64-dim: distances
    // truncate to the shared prefix (engine L2 semantics) instead of
    // nulling out and NPE-ing the driver read
    val r = Stats.dataInfoLagged(emb, "embedding",
      DataInfo(10L, Seq(0.1, 0.2), 5d, Seq.fill(Stats.Bins)(0d)))
    assert(r.n == emb.count() && !r.maxDistance.isNaN && r.maxDistance > 0)
  }

  test("null-feature rows are excluded from stats, not a crash or skew") {
    val withNulls = emb.select($"vec_id",
      when($"vec_id" % 2 === 0, $"embedding").as("embedding"))
    val r = Stats.dataInfo(withNulls, "embedding").head()
    assert(r.getLong(0) == emb.filter($"vec_id" % 2 === 0).count())
    assert(math.abs(r.getSeq[Double](3).sum - 1.0) < 1e-4) // hist mass intact
    val allNull = emb.select($"vec_id", lit(null).cast("array<float>").as("embedding"))
    assert(Stats.dataInfo(allNull, "embedding").head().getLong(0) == 0)
  }

  test("lagged one-pass converges to exact on static data") {
    val exact = Stats.dataInfo(emb, "embedding").head()
    val exactInfo = DataInfo(exact.getLong(0), exact.getSeq[Double](1),
      exact.getDouble(2), exact.getSeq[Double](3))

    // run 1 from cold (zero centroid, no max) -> biased
    val r1 = Stats.dataInfoLagged(emb, "embedding", DataInfo(0, Nil, 0d, Nil))
    assert(r1.n == exactInfo.n)
    // run 2 uses run 1's centroid/max -> matches exact stats
    val r2 = Stats.dataInfoLagged(emb, "embedding", r1)
    assert(r2.avg.zip(exactInfo.avg).forall { case (a, b) => math.abs(a - b) < 1e-6 })
    assert(math.abs(r2.maxDistance - exactInfo.maxDistance) < 1e-4)
    assert(math.abs(r2.hist.sum - 1.0) < 1e-6)
  }

  test("lagged is a single job (one scan)") {
    // structural check: the aggregation happens in one collected row;
    // behavioral proxy: repeated calls with same prev are deterministic
    val prev = DataInfo(0, Nil, 0d, Nil)
    val a = Stats.dataInfoLagged(emb, "embedding", prev)
    val b = Stats.dataInfoLagged(emb, "embedding", prev)
    assert(a == b)
  }
}
