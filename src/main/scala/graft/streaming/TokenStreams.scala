package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The unigram tokenizer composed into the streaming stack — the
  * ingest-time face of p123/p126's fertility analytics: as documents
  * arrive, how many subword pieces per token is each event-time window
  * paying, and what fraction UNKs? A crawl whose fertility spikes is
  * changing register or language; the ingest router should notice
  * before the tokens are bought.
  */
object TokenStreams {

  /** Per-window fertility of a document stream.
    *
    * Shape: words explode map-side and the native Viterbi expression
    * encodes each word IN PLACE (the stream tradeoff vs the batch
    * dictionary discipline: no distinct-word collapse without state,
    * so the O(len x maxPieceLen) DP runs per word instance — still
    * stateless, still O(batch)); text dies in its arrival projection
    * and only (ts, n_pieces, is_unk) reach the ONE stateful operator,
    * a watermarked tumbling-window sum — the lightest state class
    * (three counters per open window). No dedup state, so
    * stream == batch EXACTLY at any micro-batch boundary placement —
    * TokenStreamsSpec pins it under ragged batch splits.
    */
  def fertilityStream(
      docs: DataFrame, // (ts timestamp, text string, ...)
      vocab: Seq[(String, Int)],
      windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(split(col("text"), " ")).as("word"))
      .select(col("ts"),
        graft.functions.UnigramFunctions.unigram_pieces(col("word"), vocab)
          .as("pieces"))
      .select(col("ts"), size(col("pieces")).cast("long").as("np"),
        (col("pieces") === array(lit("[UNK]"))).as("unk"))
      .groupBy(window(col("ts"), windowDur))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("np")).as("n_pieces"),
        sum(when(col("unk"), 1L).otherwise(0L)).as("n_unk_tokens"))
      .select(col("window.start").as("w_start"),
        col("n_tokens"), col("n_pieces"), col("n_unk_tokens"),
        expr("n_pieces * 100 DIV n_tokens").as("fertility_centi"))

  /** Per-window count of TRIGRAM types seen for the first time — the
    * streaming face of p133's Heaps'-law vocabulary growth: an ingest
    * stream whose new-trigram rate stays high is still buying
    * coverage; one that collapses is buying repetition (route it to
    * the dedup tier instead of the token budget).
    *
    * Shape and contracts are [[ChunkStreams.newChunkTypesStream]]'s,
    * with the trigram itself as the state key (bounded by trigram
    * vocabulary inside the horizon, the same class as the chunk-hash
    * key; no truncation, so first-seen never under-counts):
    * dropDuplicatesWithinWatermark keeps each trigram's first arrival,
    * a watermarked tumbling window counts the survivors, and the
    * watermark horizon is the DEDUP MEMORY BUDGET — a trigram
    * recurring past it counts as new again (over-counts novelty,
    * never under-counts). Trigram assembly is the p133 projection
    * (1-based element_at with a size guard); text dies in its arrival
    * projection.
    */
  def vocabNoveltyStream(
      docs: DataFrame, // (ts timestamp, text string, ...)
      windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"), split(col("text"), " ").as("ws"))
      .select(col("ts"),
        explode(expr("""CASE WHEN size(ws) >= 3
          THEN transform(sequence(1, size(ws) - 2),
            i -> concat(element_at(ws, i), ' ',
                        element_at(ws, i + 1), ' ',
                        element_at(ws, i + 2)))
          ELSE array() END""")).as("tok"))
      .dropDuplicatesWithinWatermark("tok")
      .groupBy(window(col("ts"), windowDur))
      .agg(count(lit(1)).as("n_new_types"))
      .select(col("window.start").as("w_start"), col("n_new_types"))
}
