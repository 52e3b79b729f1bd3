package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** The engine's canonical row model, mirroring the reference's wire model
  * (veriservice/veriservice.proto:51-68) as a flat Spark schema
  * (layout per /root/repo/FIXTURES.md §2).
  *
  *  - `feature`    — the embedding vector (DatumKey.feature, proto:57)
  *  - `groupLabel` — grouping key, JSON text in practice (proto:58)
  *  - `size1/size2/dim1/dim2` — shape hints; never used in compute
  *    (reference grep: only set in data/datum.go:19-32)
  *  - `label`      — JSON payload (DatumValue.label, proto:67)
  *  - `version`    — monotonic config version (proto:66)
  *  - `expireAt`   — per-row TTL (data/newsync.go:17-20); null = immortal
  */
final case class Datum(
    feature: Seq[Float],
    groupLabel: String,
    size1: Int,
    size2: Int,
    dim1: Int,
    dim2: Int,
    label: String,
    version: Long,
    expireAt: Option[Timestamp])

object Datum {
  def apply(feature: Seq[Float], groupLabel: String, label: String): Datum =
    Datum(feature, groupLabel, feature.length, 1, feature.length, 1, label, 0L, None)

  /** Column names that form row identity (the serialized DatumKey in the
    * reference, data/datum.go:105-129). Spark needs no byte codec: the
    * struct of these columns IS the key. */
  val keyColumns: Seq[String] =
    Seq("feature", "group_label", "size1", "size2", "dim1", "dim2")

  val valueColumns: Seq[String] = Seq("label", "version")

  /** DataFrame-facing schema (snake_case column names). */
  val schema: StructType = StructType(Seq(
    StructField("feature", ArrayType(FloatType), nullable = false),
    StructField("group_label", StringType),
    StructField("size1", IntegerType),
    StructField("size2", IntegerType),
    StructField("dim1", IntegerType),
    StructField("dim2", IntegerType),
    StructField("label", StringType),
    StructField("version", LongType),
    StructField("expire_at", TimestampType)))
}

/** A query result row: datum columns + `score` (proto:70-73). */
final case class ScoredDatum(score: Double, datum: Datum)

/** Table statistics, the reference's DataInfo (proto:100-114). */
final case class DataInfo(
    n: Long,
    avg: Seq[Double],
    maxDistance: Double,
    hist: Seq[Double])

/** Dataset configuration (proto:116-125; defaults data/dataset.go:45-56). */
final case class DataConfig(
    name: String,
    version: Long = 0L,
    targetN: Long = 1000L,
    targetUtilization: Double = 0.4,
    noTarget: Boolean = true,
    retentionDays: Int = 14)
