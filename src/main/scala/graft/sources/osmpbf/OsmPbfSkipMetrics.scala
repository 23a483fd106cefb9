package graft.sources.osmpbf

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

import graft.pbf.SkipListener

/** Accumulator-backed accounting for PERMISSIVE-mode data loss — the
  * osmpbf analogue of json/csv's corrupt-record accounting. A permissive
  * scan that silently drops blocks is unacceptable at 100 TB: the
  * accumulators surface "how much did we lose" in the Spark UI (named
  * `graft.osmpbf.skippedBlocks` / `graft.osmpbf.truncatedBlocks`) and
  * programmatically via [[OsmPbfSkipMetrics.registered]]. Skips are also
  * logged per block through slf4j (WARN).
  *
  * One metrics pair is registered lazily per SparkContext and shared by
  * every permissive osmpbf scan in the session — per-scan registration
  * would leak accumulator entries on long-running sessions, and a
  * session-wide "blocks lost" counter is the operationally useful number
  * (check it after an action; reset() between runs if you need deltas).
  */
final case class OsmPbfSkipMetrics(
    skippedBlocks: LongAccumulator,
    truncatedBlocks: LongAccumulator) extends SkipListener {

  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(classOf[OsmPbfSkipMetrics])

  override def skippedBlock(blockStart: Long, cause: String): Unit = {
    skippedBlocks.add(1L)
    log.warn(s"[osmpbf] skipping undecodable block at $blockStart: $cause")
  }

  override def truncatedBlock(blockStart: Long, cause: String): Unit = {
    truncatedBlocks.add(1L)
    log.warn(s"[osmpbf] truncating corrupt block at $blockStart: $cause")
  }

  def reset(): Unit = { skippedBlocks.reset(); truncatedBlocks.reset() }
}

object OsmPbfSkipMetrics {
  // keyed by SparkContext so a stopped+recreated session re-registers
  @transient private var cached: Option[(String, OsmPbfSkipMetrics)] = None

  /** The session's shared metrics pair (registering it on first use). */
  def registered(spark: SparkSession): OsmPbfSkipMetrics = synchronized {
    val sc = spark.sparkContext
    cached match {
      case Some((appId, m)) if appId == sc.applicationId => m
      case _ =>
        val m = OsmPbfSkipMetrics(
          sc.longAccumulator("graft.osmpbf.skippedBlocks"),
          sc.longAccumulator("graft.osmpbf.truncatedBlocks"))
        cached = Some((sc.applicationId, m))
        m
    }
  }
}
