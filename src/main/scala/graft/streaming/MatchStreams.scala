package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Aho–Corasick blocklist scan composed into the streaming stack —
  * the ingest-time face of p111/p115's content filter: as documents
  * arrive, how often does each blocklisted term fire per event-time
  * window? The production signal behind policy-violation dashboards
  * and ingest-side routing (quarantine a crawl whose violation rate
  * spikes).
  */
object MatchStreams {

  /** Per-(window, term) hit counts over a document stream.
    *
    * Shape: the native multi_match expression runs map-side (one
    * automaton pass per document, O(chars + matches) at any dictionary
    * size), text dies in the same projection it arrived in, and only
    * (ts, tid) pairs reach the ONE stateful operator — a watermarked
    * tumbling-window count, the lightest state class there is (a
    * counter per open window x term, nothing per-document). Unlike the
    * chunk-novelty monitor there is no dedup state, so stream == batch
    * EXACTLY at any micro-batch boundary placement — MatchStreamsSpec
    * pins it under deliberately ragged batch splits.
    */
  def blocklistHitsStream(
      docs: DataFrame, // (ts timestamp, text string, ...)
      terms: Seq[String],
      windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"),
        explode(graft.functions.MatchFunctions.multi_match(col("text"), terms))
          .as("m"))
      .select(col("ts"), col("m.tid").as("tid"))
      .groupBy(window(col("ts"), windowDur), col("tid"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("window.start").as("w_start"), col("tid"), col("n_hits"))
}
