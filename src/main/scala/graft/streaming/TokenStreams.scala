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

  /** Per-window Kneser-Ney cross-entropy of a document stream under a
    * FROZEN model — the streaming face of p154's perplexity drift:
    * score incoming data hourly under yesterday's model and alert on
    * the earliest sign the ingest distribution moved. The model rides
    * as three STATIC dictionary frames (the p144 stats: bigram counts
    * `bc(prev, cur, cvw)`, context stats `cc(prev, cv, n1v)`,
    * continuation counts `nw(cur, nw)`) plus the scalar normalizer
    * `bp = B + V` — stream-static left joins, the model-artifact
    * discipline with the artifact as a join table instead of a plan
    * literal (a gram dictionary is too big to be a literal).
    *
    * Shape: bigrams explode map-side; the KN num/den and the ilog2
    * bits evaluate PER INSTANCE in-stream (the fertilityStream
    * tradeoff: no distinct-type collapse without state — still
    * stateless, still O(batch); bits for a repeated type recompute
    * identically, so stream == batch EXACTLY at any micro-batch
    * boundary placement). Only (ts, bits, is_oov) reach the one
    * stateful operator, a watermarked tumbling-window sum.
    */
  def xentDriftStream(
      docs: DataFrame, // (ts timestamp, text string, ...)
      bc: DataFrame, // (prev, cur, cvw) — static
      cc: DataFrame, // (prev, cv, n1v) — static
      nw: DataFrame, // (cur, nw) — static
      bp: Long,
      windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    import graft.functions.UnigramFunctions.ilog2_fix
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"), split(col("text"), " ").as("ws"))
      .select(col("ts"), explode(expr("""CASE WHEN size(ws) >= 2
        THEN transform(sequence(1, size(ws) - 1),
          i -> struct(element_at(ws, i) AS prev,
                      element_at(ws, i + 1) AS cur))
        ELSE array() END""")).as("bg"))
      .select(col("ts"), col("bg.prev"), col("bg.cur"))
      .join(bc, Seq("prev", "cur"), "left")
      .join(cc, Seq("prev"), "left")
      .join(nw, Seq("cur"), "left")
      .select(col("ts"),
        coalesce(col("nw"), lit(0L)).as("nwv"),
        when(coalesce(col("cv"), lit(0L)) > 0,
          greatest(lit(4) * coalesce(col("cvw"), lit(0L)) - 3, lit(0L))
            * bp
            + lit(3) * col("n1v") * (coalesce(col("nw"), lit(0L)) + 1))
          .otherwise(coalesce(col("nw"), lit(0L)) + 1).as("num"),
        when(coalesce(col("cv"), lit(0L)) > 0,
          lit(4) * col("cv") * bp).otherwise(lit(bp)).as("den"))
      .select(col("ts"), col("nwv"),
        (ilog2_fix(col("den")) - ilog2_fix(col("num"))).as("bits_fix"))
      .groupBy(window(col("ts"), windowDur))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("bits_fix")).as("bsum"),
        sum(when(col("nwv") === 0, 1L).otherwise(0L)).as("n_oov"))
      .select(col("window.start").as("w_start"), col("n_bigrams"),
        expr("bsum * 1000 DIV (65536 * n_bigrams)").as("xent_millibits"),
        expr("n_oov * 1000000 DIV n_bigrams").as("oov_ppm"))
  }

  /** Per-window PSI of a document stream against a FROZEN baseline —
    * the streaming face of p163's hourly drift monitor: the
    * distribution-shift score every ingest pipeline alarms on, scored
    * as data arrives. The bucket domain is CLOSED (least(9, n_chars
    * DIV 100) — ten buckets), which is what makes the whole score fit
    * ONE watermarked windowed aggregation: per window, ten conditional
    * counts pivot map-side, and the PSI formula (ppm shares clamped
    * ≥ 1, the shared ilog2 quantizer, Σ (p−q)(lg p − lg q)) evaluates
    * as a row-local expression over those ten columns — no second
    * stateful operator, no stream-stream join. The baseline rides as
    * ten ppm LITERALS (each ≥ 1 — the caller clamps, the same values
    * p163's batch side derives from the even-doc split), so stream ==
    * batch EXACTLY at any micro-batch boundary placement
    * (TokenStreamsSpec pins it against the oracle-gated p163 entry).
    */
  def psiDriftStream(
      docs: DataFrame, // (ts timestamp, n_chars long, ...)
      baselinePpm: Seq[Long],
      windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    import graft.functions.UnigramFunctions.ilog2_fix
    require(baselinePpm.length == 10 && baselinePpm.forall(_ >= 1L),
      "baselinePpm must be ten clamped (>= 1) ppm shares, buckets 0-9")
    val aggs = count(lit(1)).as("n") +: (0 until 10).map(b =>
      sum(when(col("bucket") === b, 1L).otherwise(0L)).as(s"c$b"))
    val counts = docs
      .withWatermark("ts", watermark)
      .select(col("ts"), expr("least(9L, n_chars DIV 100)").as("bucket"))
      .groupBy(window(col("ts"), windowDur))
      .agg(aggs.head, aggs.tail: _*)
    val psi = (0 until 10).map { b =>
      val p = greatest(expr(s"c$b * 1000000 DIV n"), lit(1L))
      val q = lit(baselinePpm(b))
      (p - q) * (ilog2_fix(p) - ilog2_fix(q))
    }.reduce(_ + _)
    counts
      .select(col("window.start").as("w_start"), col("n").as("n_docs"),
        psi.as("psi_fix"))
      .select(col("w_start"), col("n_docs"), col("psi_fix"),
        expr("psi_fix DIV 65536").as("psi_micro_log2"))
  }
}
