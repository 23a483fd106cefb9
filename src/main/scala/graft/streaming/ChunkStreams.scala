package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking composed into the streaming stack — the
  * ingest-time face of p103/p108's storage dedup: as documents arrive,
  * how much of each window's chunk volume is NEW content vs chunks the
  * corpus already holds? The production signal behind "is this crawl
  * bringing us anything" dashboards and ingest-side dedup routing.
  */
object ChunkStreams {

  /** Per-window count of chunk types seen for the FIRST time.
    *
    * Shape: map-side chunk+hash (the native gear expression), then a
    * CHAINED pair of stateful operators — dropDuplicatesWithinWatermark
    * on the chunk hash keeps each hash's first arrival (state = one
    * entry per distinct hash inside the watermark horizon), and the
    * downstream watermarked window aggregate counts the survivors. Only
    * the FULL 128-bit md5 ever enters state (a truncated key would let
    * birthday collisions mark genuinely new chunks as duplicates,
    * silently breaking the never-under-counts contract below past ~2^24
    * distinct types); chunk text dies in the same stage it was born.
    *
    * The watermark horizon is the DEDUP MEMORY BUDGET, exactly as in
    * [[EventStreams.dedupStream]]: a hash recurring more than
    * `watermark` past its first arrival counts as new again — bounded
    * state is the contract that makes this viable at 100 TB/day, and
    * the monitor's semantics degrade gracefully (over-counts novelty,
    * never under-counts). ChunkStreamsSpec pins stream == batch
    * global-first-seen under a full-span horizon.
    */
  def newChunkTypesStream(
      docs: DataFrame, // (ts timestamp, doc_id, source, text)
      maskBits: Int = 6,
      windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"),
        explode(graft.functions.CdcFunctions.gear_chunks(col("text"),
          maskBits)).as("chunk"))
      .select(col("ts"), md5(col("chunk")).as("h"))
      .dropDuplicatesWithinWatermark("h")
      .groupBy(window(col("ts"), windowDur))
      .agg(count(lit(1)).as("n_new_types"))
      .select(col("window.start").as("w_start"), col("n_new_types"))
}
