package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * processed in partition-sized batches.
  *
  * The decode step itself (image/audio libs) is STUBBED with a
  * deterministic fake — this container has no codec libraries — but the
  * Spark-side contract is real and tested: binary column + metadata
  * struct in, fixed-schema feature rows out, batch iteration via
  * `mapPartitions` so a real decoder would amortize model/codec init
  * per partition (the Scala analogue of pandas-batched UDFs).
  *
  * At 100 TB the payload column dominates row size: repartition by
  * byte-budget (`targetPartitionBytes`) before heavy decode so a skewed
  * file mix cannot OOM one executor while others idle.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct (here: utf-8 bytes of the
    * text standing in for an image/audio blob).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        col("source").as("origin"),
        octet_length(encode(col("text"), "utf-8")).as("n_bytes")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("content_hash", LongType, nullable = false),
    StructField("thumb", ArrayType(FloatType, containsNull = false))))

  /** STUB decoder: a real implementation would decode the payload
    * (image/audio/video) here. The fake is deterministic — byte length,
    * FNV-1a content hash, and a 16-float "thumbnail" built from evenly
    * sampled payload bytes — so tests can assert exact values while the
    * batching/schema/partitioning contract stays production-shaped.
    */
  def decodeFeatures(withPayloadDf: DataFrame, targetPartitions: Int = 0): DataFrame = {
    val spark = withPayloadDf.sparkSession
    val repartitioned =
      if (targetPartitions > 0) withPayloadDf.repartition(targetPartitions)
      else withPayloadDf
    val rdd = repartitioned.select("doc_id", "payload").rdd.mapPartitions { it =>
      // per-partition init would go here (codec handles, model weights)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < bytes.length) {
          h ^= bytes(i) & 0xffL
          h *= 0x100000001b3L
          i += 1
        }
        val thumb = new Array[Float](16)
        var t = 0
        while (t < 16) {
          val idx = if (bytes.length == 0) 0 else (t * bytes.length) / 16
          thumb(t) = (bytes(math.min(idx, bytes.length - 1)) & 0xff) / 255.0f
          t += 1
        }
        Row(id, bytes.length, h, thumb.toSeq)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
