package graft.queries

import graft.QueryDef
import graft.functions.OsmFunctions
import org.apache.spark.sql.functions._

/** Queries over the OSM PBF source itself. DuckDB cannot read `.pbf`, so
  * these carry no oracle SQL (driver records rows-only checks); their
  * correctness gate is the golden-value ScalaTest suite against the
  * reference fixture (OsmPbfSourceSpec / PbfDecodeSpec).
  */
object OsmQueries {

  /** The reference's own test fixture (FIXTURES.md §1). */
  val fixturePath = "/root/reference/src/test/java/resources/temp.dat"

  /** The upstream sample.pbf bundled in the reference's osmpbf jar
    * (FIXTURES.md §3) — unlike temp.dat it carries a real OSMHeader
    * block, so it backs the header-surface query.
    */
  lazy val samplePbfPath: String = {
    val jar = new java.util.jar.JarFile(
      new java.io.File("/root/reference/lib/osmpbf-1.3.3.jar"))
    val entry = jar.getEntry("sample.pbf")
    val out = java.nio.file.Files.createTempFile("sample", ".pbf")
    val in = jar.getInputStream(entry)
    try java.nio.file.Files.copy(in, out,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally { in.close(); jar.close() }
    out.toString
  }

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "osm01_node_inventory",
      (s, _) => {
        import s.implicits._
        s.read.format("osmpbf").option("parseType", "node").load(fixturePath)
          .agg(
            count(lit(1)).as("n_nodes"),
            min($"id").as("min_id"), max($"id").as("max_id"),
            min($"lat").as("min_lat"), max($"lat").as("max_lat"),
            min($"lon").as("min_lon"), max($"lon").as("max_lon"))
      },
      None),

    QueryDef(
      // README.md:22-35 canonical query: 2048x2048 grid density
      "osm02_tile_density",
      (s, _) => {
        import s.implicits._
        s.read.format("osmpbf").option("parseType", "node").load(fixturePath)
          .withColumn("tile", OsmFunctions.tileId($"lat", $"lon"))
          .groupBy($"tile").agg(count(lit(1)).as("n"))
          .orderBy($"tile")
      },
      None),

    QueryDef(
      // the domain join: way refs -> node coordinates (SURVEY §2.2)
      "osm03_way_geometry",
      (s, _) => {
        import s.implicits._
        val ways = s.read.format("osmpbf").option("parseType", "way")
          .load(fixturePath)
        val nodes = s.read.format("osmpbf").option("parseType", "node")
          .load(fixturePath)
        OsmFunctions.resolveWayGeometry(ways, nodes)
          .groupBy($"way_id")
          .agg(count(lit(1)).as("n_points"),
            min($"lat").as("min_lat"), max($"lat").as("max_lat"))
          .orderBy($"way_id")
      },
      None),

    QueryDef(
      "osm04_tag_frequency",
      (s, _) => {
        import s.implicits._
        s.read.format("osmpbf").load(fixturePath)
          .select($"type", explode($"tags").as(Seq("k", "v")))
          .groupBy($"k").agg(count(lit(1)).as("n"),
            countDistinct($"v").as("n_values"))
          .orderBy($"n".desc, $"k")
          .limit(25)
      },
      None),

    QueryDef(
      "osm05_relation_members",
      (s, _) => {
        import s.implicits._
        s.read.format("osmpbf").option("parseType", "relation").load(fixturePath)
          .select($"id", explode($"members").as("m"))
          .groupBy($"m.memberType".as("member_type"), $"m.role".as("role"))
          .agg(count(lit(1)).as("n"))
          .orderBy($"member_type", $"role")
      },
      None),

    QueryDef(
      // reference-compat flattened "k:v;" tag strings (SURVEY §1.2 quirk)
      "osm06_tags_compat_string",
      (s, _) => {
        import s.implicits._
        s.read.format("osmpbf").option("parseType", "node").load(fixturePath)
          .filter(size(map_entries($"tags")) > 0)
          .select($"id", OsmFunctions.osmTagsToString($"tags").as("tags_str"))
          .orderBy($"id")
          .limit(100)
      },
      None),

    QueryDef(
      // OSMHeader surface: bbox + feature lists of a file that has one
      // (sample.pbf) alongside the bare-data fixture, proving totality
      "osm07_header_inventory",
      (s, _) => {
        import s.implicits._
        graft.sources.osmpbf.OsmPbfHeader.df(s, samplePbfPath, fixturePath)
          .select(
            // temp-file names vary per run; project stable identity
            when($"has_header", lit("sample.pbf")).otherwise(lit("temp.dat"))
              .as("file_kind"),
            $"has_header", $"bbox_left", $"bbox_bottom", $"bbox_right",
            $"bbox_top",
            array_join($"required_features", ";").as("required"),
            $"writing_program")
          .orderBy($"file_kind")
      },
      None),

    QueryDef(
      // multi-file scan with a lat predicate: sample.pbf (UK, ~51.77)
      // qualifies, temp.dat (Venezuela, ~10.4, headerless) is filtered
      // row-wise. Deliberately does NOT opt into bboxPruning: sample.pbf
      // itself carries nodes outside its declared bbox, the exact reason
      // the pruning is opt-in (SyntheticPbfFileSpec pins the opt-in
      // partition-count effect).
      "osm09_bbox_scan",
      (s, _) => {
        import s.implicits._
        s.read.format("osmpbf").option("parseType", "node")
          .load(samplePbfPath, fixturePath)
          .filter($"lat" > 40.0)
          .agg(
            count(lit(1)).as("n_north"),
            round(min($"lat"), 6).as("min_lat"),
            round(max($"lat"), 6).as("max_lat"),
            round(min($"lon"), 6).as("min_lon"),
            round(max($"lon"), 6).as("max_lon"))
      },
      None),

    QueryDef(
      // record-key metadata columns: per-block record counts — parity
      // with the reference's byte-offset record key
      "osm08_record_keys",
      (s, _) => {
        import s.implicits._
        s.read.format("osmpbf").load(fixturePath)
          .select($"id", $"type", col("_block_offset"), col("_record_index"))
          .groupBy($"_block_offset".as("block_offset"))
          .agg(
            count(lit(1)).as("n_records"),
            max($"_record_index").as("max_index"),
            countDistinct($"type").as("n_kinds"))
          .orderBy($"block_offset")
      },
      None),

    QueryDef(
      // COUNT(*) aggregate pushdown: the scan answers the count from the
      // decode-free varint counter (per-partition partials, no rows
      // materialized, string table untouched) — ~2x the row path, and
      // the inventory numbers must agree with the decoded scans
      // (OsmPbfCountPushdownSpec pins plan + equality).
      "osm10_count_pushdown",
      (s, _) => {
        import s.implicits._
        def counted(tpe: Option[String]): Long = {
          val r = s.read.format("osmpbf")
          tpe.foreach(t => r.option("parseType", t))
          r.load(fixturePath).count()
        }
        Seq(
          ("all", counted(None)),
          ("node", counted(Some("node"))),
          ("way", counted(Some("way"))))
          .toDF("scope", "n")
      },
      None),

    QueryDef(
      // relation geometry assembly: the two-hop multipolygon join
      // (relation -> member way -> node coords) with ring order kept via
      // (member_pos, pos); min_by/max_by pin the first/last point in
      // ring order so the output hashes the ORDER, not just the set
      "osm11_relation_geometry",
      (s, _) => {
        import s.implicits._
        def read(tpe: String) = s.read.format("osmpbf")
          .option("parseType", tpe).load(fixturePath)
        val geom = OsmFunctions.resolveRelationGeometry(
          read("relation"), read("way"), read("node"))
        geom.groupBy($"relation_id")
          .agg(
            countDistinct($"way_id").as("n_ways_resolved"),
            count(lit(1)).as("n_points"),
            min_by(struct($"node_id", $"role"),
              struct($"member_pos", $"pos")).getField("node_id")
              .as("first_node"),
            max_by(struct($"node_id", $"role"),
              struct($"member_pos", $"pos")).getField("node_id")
              .as("last_node"),
            round(min($"lat"), 7).as("min_lat"),
            round(max($"lat"), 7).as("max_lat"),
            round(min($"lon"), 7).as("min_lon"),
            round(max($"lon"), 7).as("max_lon"))
          .orderBy($"relation_id")
      },
      None),

    QueryDef(
      // MULTI-SPLIT SCALE PROOF: the reference fixture is 89 KB — a
      // single split under any realistic maxPartitionBytes — so the one
      // genuinely custom component (the splittable scan with block
      // realignment, SURVEY §2.1 #2) is exercised here on a synthetic
      // ~72 MB file cut into 8 MB splits (9+ partitions). One row per
      // execution mode, with wall-clock ms, so BENCH_r{N} carries the
      // pushdown-on/off and 1-vs-many-split deltas. Values (counts,
      // min/max ids) must agree ACROSS modes — the row asserts it by
      // construction (`agree` would differ).
      //
      // Round-12 leg audit (the r11 5.5 -> 6.8s drift chase): the old
      // entry spent 2.6s decoding the full 72 MB SEQUENTIALLY as its
      // split-invariance control and ran a second full decode
      // (rowscan_coords + minmax_rowscan at ~1.3s each) that differed
      // only in aggregate shape. Both trimmed without losing a proof:
      // the invariance control runs on a 16 MB companion file (2 MB
      // splits: 8-way vs 1-way on IDENTICAL bytes — the same
      // invariance + parallel-speedup evidence at a quarter the
      // sequential cost), and ONE decoded pass carries the baseline
      // coordinates AND the pushdown-blocked min/max/sum comparator.
      "osm12_multisplit_scale",
      (s, _) => {
        import s.implicits._
        val path = graft.pbf.SyntheticPbf.ensureFile(72L << 20)
        val invPath = graft.pbf.SyntheticPbf.ensureFile(16L << 20)
        val key = "spark.sql.files.maxPartitionBytes"
        val prev = s.conf.get(key)
        def readAt(p: String, opts: (String, String)*) = {
          val r = s.read.format("osmpbf")
          opts.foreach { case (k, v) => r.option(k, v) }
          r.load(p)
        }
        def read(opts: (String, String)*) = readAt(path, opts: _*)
        def timed(f: () => (Long, Int)): (Long, Int, Long) = {
          val t0 = System.nanoTime()
          val (v, parts) = f()
          (v, parts, (System.nanoTime() - t0) / 1000000L)
        }
        try {
          s.conf.set(key, (8L << 20).toString)
          val nParts = read().rdd.getNumPartitions
          // untimed warmup: one decoded pass per plan shape so the timed
          // modes measure the scan, not first-touch codegen/JIT/page-cache
          read().agg(sum($"id")).collect()
          read("parseType" -> "node").agg(sum($"id")).collect()
          val rows = Seq[(String, () => (Long, Int))](
            // decoded scan, every kind: baseline coordinates AND the
            // pushdown-blocked (sum) min/max comparator in one pass
            ("rowscan_full", () => {
              val r = read().agg(count(lit(1)), min($"lat"), max($"lon"),
                min($"id"), max($"id"), sum($"id")).collect().head
              (r.getLong(0) * 10000000000L + r.getLong(4), nParts)
            }),
            // kind pruning: way blocks are skipped without decoding
            ("rowscan_nodes_pruned", () => {
              val r = read("parseType" -> "node")
                .agg(count(lit(1)), min($"lat")).collect().head
              (r.getLong(0), nParts)
            }),
            // aggregate pushdown: zero rows decoded, varint-count only
            ("count_pushdown", () => (read().count(), nParts)),
            // one ids-only pass answering COUNT+MIN+MAX at the scan;
            // its ms vs rowscan_full isolates what the pushdown saves
            ("minmax_pushdown", () => {
              val r = read().agg(count(lit(1)), min($"id"), max($"id"))
                .collect().head
              (r.getLong(0) * 10000000000L + r.getLong(2), nParts)
            })
          ).map { case (mode, f) =>
            val (v, parts, ms) = timed(f)
            (mode, v, parts, ms)
          }
          // split invariance at scale: ONE split must reproduce the
          // multi-split answer on identical bytes (full value-level
          // invariance is pinned at MB scale by OsmPbfMultiSplitSpec).
          // Runs on the 16 MB companion at 2 MB splits: 8-way vs
          // sequential on the same file is the parallel-speedup
          // evidence, at a quarter of the old 72 MB sequential cost.
          readAt(invPath).agg(sum($"id")).collect() // untimed first touch
          s.conf.set(key, (2L << 20).toString)
          val (vm, pm, msm) = timed(() => {
            val df = readAt(invPath)
            val r = df.agg(max($"id"), sum($"id")).collect().head
            (r.getLong(0) + r.getLong(1), df.rdd.getNumPartitions)
          })
          s.conf.set(key, (1L << 30).toString)
          val (v1, p1, ms1) = timed(() => {
            val df = readAt(invPath)
            val r = df.agg(max($"id"), sum($"id")).collect().head
            (r.getLong(0) + r.getLong(1), df.rdd.getNumPartitions)
          })
          val all = rows ++ Seq(
            ("invariance_multi_split", vm, pm, msm),
            ("invariance_single_split", v1, p1, ms1))
          val agree =
            rows(0)._2 == rows(3)._2 && // decoded (count,max) == pushed
            rows(0)._2 / 10000000000L == rows(2)._2 && // count == pushed count
            vm == v1 && p1 == 1 && pm >= 8 && nParts >= 8
          all.map { case (m, v, p, ms) => (m, v, p, ms, agree) }
            .toDF("mode", "value", "partitions", "ms", "agree")
        } finally s.conf.set(key, prev)
      },
      None),

    QueryDef(
      // WRITE ROUND TRIP, self-proving: the fixture is decoded, re-
      // encoded through df.write.format("osmpbf") (PbfEncoder: dense
      // delta/zigzag packing, per-block stringtables, zlib frames) and
      // decoded again; the result frame carries BOTH sides' per-type
      // counts and order-independent id/coordinate checksums with
      // literal equality booleans — a decoder alone cannot vouch for an
      // encoder, but a decoder whose goldens pin the reference's own
      // bytes can, transitively, when the re-encoded file replays
      // identically. (No DuckDB oracle — it cannot read PBF; the
      // booleans make the rows-only check self-checking, and
      // OsmPbfWriteSpec pins full row identity.)
      "osm13_write_roundtrip",
      (s, _) => {
        import s.implicits._
        // pid-keyed scratch (Pipeline5/Relational7 discipline): bench
        // iterations overwrite one directory instead of leaking a fresh
        // temp dir per run, and the JVM-exit hook cleans it
        val dir = new java.io.File(scratchRoot, "osm13").getPath
        def stats(df: org.apache.spark.sql.DataFrame) =
          df.groupBy($"type").agg(
            count(lit(1)).as("n"),
            sum($"id").as("id_sum"),
            sum(abs(coalesce(
              round($"lat" * 10000000, 0).cast("long"), lit(0L))) +
              abs(coalesce(
                round($"lon" * 10000000, 0).cast("long"), lit(0L))))
              .as("coord_sum"))
        val src = s.read.format("osmpbf")
          .option("withInfo", "false").load(fixturePath)
        src.write.format("osmpbf").option("withInfo", "false")
          .mode("overwrite").save(dir)
        val back = s.read.format("osmpbf")
          .option("withInfo", "false").load(dir)
        stats(src).withColumnRenamed("n", "n_src")
          .withColumnRenamed("id_sum", "id_sum_src")
          .withColumnRenamed("coord_sum", "coord_sum_src")
          .join(stats(back).withColumnRenamed("n", "n_back")
            .withColumnRenamed("id_sum", "id_sum_back")
            .withColumnRenamed("coord_sum", "coord_sum_back"),
            Seq("type"), "full")
          .select($"type", $"n_src", $"n_back", $"id_sum_src",
            $"id_sum_back",
            // null-safe equality wrapped to FALSE: an entity type the
            // encoder dropped entirely appears only on one side of the
            // full outer join, and a bare === would render NULL — the
            // self-check must go red there, not blank
            coalesce($"n_src" <=> $"n_back", lit(false))
              .as("counts_equal"),
            coalesce($"id_sum_src" <=> $"id_sum_back" &&
              ($"coord_sum_src" <=> $"coord_sum_back"), lit(false))
              .as("sums_equal"))
          .orderBy($"type")
      },
      None),

    QueryDef(
      // THE BRIDGE ENTRY — the reference's domain feeding the library's
      // training-data half in one plan: OSM tag VALUES (street names,
      // operator names, descriptions) are a text corpus, and a user who
      // switched from the reference gets language-ID, token statistics
      // and dedup pressure on them with the same operators the documents
      // table gets. Per tag key: value volume, distinct ratio (dup
      // pressure), token mass, and the dominant langId vote. Rows-only
      // check (PBF input); the text operators themselves are oracled on
      // the documents corpus (p01/p02) and the decode path is
      // golden-gated — this entry pins the composition.
      "osm14_tag_text_stats",
      (s, _) => {
        import s.implicits._
        import graft.operators.TextAnalysis
        val tagVals = s.read.format("osmpbf").load(fixturePath)
          .select(explode($"tags").as(Seq("k", "v")))
          .filter(length($"v") > 0)
        val base = tagVals
          .select($"k", $"v",
            TextAnalysis.tokenCount($"v").as("toks"),
            TextAnalysis.langId($"v").as("lang"))
        val stats = base.groupBy($"k")
          .agg(count(lit(1)).as("n_values"),
            countDistinct($"v").as("n_distinct"),
            sum($"toks").cast("long").as("total_tokens"))
        // dominant language via the q83 mode ladder (counts -> per-key
        // max -> join-back -> min tie-break; no window)
        val lc = base.groupBy($"k", $"lang").agg(count(lit(1)).as("c"))
        val top = lc.groupBy($"k").agg(max($"c").as("mc"))
        val dom = lc.join(broadcast(top), Seq("k"))
          .filter($"c" === $"mc")
          .groupBy($"k").agg(min($"lang").as("top_lang"))
        stats.join(dom, Seq("k"))
          .select($"k", $"n_values", $"n_distinct", $"total_tokens",
            expr("n_distinct * 1000000 DIV n_values").as("distinct_ppm"),
            $"top_lang")
          .orderBy($"n_values".desc, $"k")
          .limit(25)
      },
      None)
  )

  /** Per-process scratch root (pid-keyed, cleaned on JVM exit) — the
    * Pipeline5/Relational7 discipline.
    */
  private lazy val scratchRoot: String = {
    val d = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_osm_scratch_${ProcessHandle.current().pid()}")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(d)
    }
    d.getPath
  }
}
