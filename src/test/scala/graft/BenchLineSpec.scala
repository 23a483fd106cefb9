package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver records only the last ~2000 characters of Bench's output
  * and parses the JSON line from that tail. Rounds 1-2 shipped a ~4 KB
  * line and the driver recorded `parsed: null` both times. Pin the
  * invariants that keep the line parseable: it fits the window with
  * headroom for sbt's trailing "[success] ..." line, and the shortened
  * per-query keys stay unique.
  */
class BenchLineSpec extends AnyFunSuite {
  private val names = SparkEntry.allDefs.map(_.name)

  test("short keys (prefix before first underscore) are unique") {
    val shorts = names.map(_.takeWhile(_ != '_'))
    val dupes = shorts.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dupes.isEmpty, s"duplicate short keys: ${dupes.mkString(",")}")
  }

  test("rendered line fits the driver's tail window with headroom") {
    // The WIDEST per-query rendering is the 3-char sub-10s form
    // ("9.9"), not the clamped "99" — and renderLine degrades through
    // its ladder (whole seconds -> failed count only -> heaviest-subset
    // map) past 1850, so the guarantee is: whatever the timings and
    // however many queries, the line fits the tail window and always
    // carries a failed count.
    for (v <- Seq(9.94, 999.99)) {
      val results = names.map(n => (n, v, false))
      // the load, in-run extmax AND memo-hit annotations are on every
      // real line — budget WITH all three (a real suite flags ~14
      // memo-consumer entries, capped at 8 shown + a count)
      val line = Bench.renderLine(results, "/root/testdata/sf0.1",
        Some((12.3, 45.6)), extMax = 12.34,
        memoHits = names.take(14))
      assert(line.contains(""""load1":[12.3,45.6]"""), line.takeRight(120))
      assert(line.contains(""""extmax":12.3"""), line.takeRight(120))
      assert(line.length < 1850, s"bench line ${line.length} chars ($v); must stay < 1850")
      assert(!line.contains("\n"))
      assert(line.contains(s""""failed":${names.size}"""), line.takeRight(80))
      // the few-failures shape must also fit (named list survives only
      // while tier 1 fits; the count always does)
      val few = names.zipWithIndex.map { case (n, i) => (n, v, i >= 10) }
      val line2 = Bench.renderLine(few, "/root/testdata/sf0.1")
      assert(line2.length < 1850, s"bench line ${line2.length} chars ($v); must stay < 1850")
      assert(line2.contains(""""failed":10"""), line2.takeRight(80))
    }
    // a pathological future size must degrade to the heaviest-subset
    // map, never overflow: 400 synthetic queries, slowest-first kept
    // WITH decisecond resolution (the omitted fast tail is the one a
    // bench reader can afford to follow into bench-full.json)
    val big = (1 to 400).map(i => (f"q$i%03d_x", i.toDouble / 100, true))
    val line3 = Bench.renderLine(big, "/root/testdata/sf0.1")
    assert(line3.length < 1850, s"${line3.length}")
    assert(line3.contains("queries_omitted"), line3.takeRight(100))
    assert(line3.contains("\"q400\":4.0"),
      s"heaviest query must survive the cut with tenths: ${line3.take(120)}")
    // the 10s boundary must not emit a 4-char "10.0"
    val b = Bench.renderLine(Seq(("q01_x", 9.96, true)), "/tmp/sf0.1")
    assert(b.contains("\"q01\":10}"), b)
  }

  test("every tier points at the repo-root full-precision file") {
    // r16 (VERDICT r15 ask #1): at 292 entries no tier carries the
    // whole suite, so the root-relative bench-full-latest.json pointer
    // is the primary per-query channel and must ride EVERY line —
    // including the non-degraded tier 1 — for the driver to follow
    val many = (1 to 400).map(i => (f"q$i%03d_x", i.toDouble / 10, true))
    val degraded = Bench.renderLine(many, "/tmp/sf0.1")
    assert(degraded.contains(""""full":"bench-full-latest.json""""), degraded.takeRight(120))
    val small = Bench.renderLine(Seq(("q01_x", 1.23, true)), "/tmp/sf0.1")
    assert(small.contains(""""full":"bench-full-latest.json""""), small)
  }

  test("negative extMax (no valid in-run samples) renders no extmax key") {
    val line = Bench.renderLine(Seq(("q01_x", 1.0, true)), "/tmp/sf",
      Some((0.1, 0.2)), extMax = -1.0)
    assert(!line.contains("extmax"), line)
  }

  test("per-query ext: clean runs pay no chars, contended entries are " +
      "named worst-first, the cap keeps a loaded box inside the window") {
    val results = Seq(("q01_x", 2.0, true), ("q02_y", 3.0, true))
    val clean = Bench.renderLine(results, "/tmp/sf",
      extPerQuery = Seq(("q01_x", 0.1), ("q02_y", 0.4)))
    assert(!clean.contains("\"ext\""), clean)
    val hot = Bench.renderLine(results, "/tmp/sf",
      extPerQuery = Seq(("q01_x", 0.7), ("q02_y", 2.3)))
    assert(hot.contains(""""ext":{"q02":2.3,"q01":0.7},"""), hot)
    assert(!hot.contains("ext_more"), hot)
    // 12 contended entries: 8 shown + a count, line stays bounded
    val many = (1 to 12).map(i => (f"q$i%02d_z", 1.0 + i / 10.0))
    val capped = Bench.renderLine(results, "/tmp/sf", extPerQuery = many)
    assert(capped.contains(""""ext_more":4"""), capped)
    assert(capped.split("\"ext\":\\{")(1).takeWhile(_ != '}')
      .count(_ == ':') == 8, capped)
  }

  test("memo marker: clean runs pay no chars, consumer entries are " +
      "named, the cap bounds a memo-heavy suite") {
    val results = Seq(("p171_semantic_clusters_lsh", 6.5, true),
      ("p172_crossfold_contamination_lsh", 0.4, true))
    val clean = Bench.renderLine(results, "/tmp/sf")
    assert(!clean.contains("\"memo\""), clean)
    // p172 consumed p171's pair-graph memo: the marker names it so its
    // 0.4s cannot be read as the standalone contamination-audit cost
    val hit = Bench.renderLine(results, "/tmp/sf",
      memoHits = Seq("p172_crossfold_contamination_lsh"))
    assert(hit.contains(""""memo":["p172"],"""), hit)
    assert(!hit.contains("memo_more"), hit)
    // 14 consumers: 8 shown + a count, line stays bounded
    val many = (1 to 14).map(i => f"p$i%02d_z")
    val capped = Bench.renderLine(results, "/tmp/sf", memoHits = many)
    assert(capped.contains(""""memo_more":6"""), capped)
    assert(capped.split("\"memo\":\\[")(1).takeWhile(_ != ']')
      .count(_ == ',') == 7, capped)
  }

  test("line is well-formed for the driver's parser") {
    val results = Seq(("q01_pricing_summary", 1.234567, true), ("p08_minhash_lsh", 0.5, false))
    val line = Bench.renderLine(results, "/tmp/sf")
    // total keeps 2 decimals; per-query values carry 1 (the 2-decimal
    // form crossed the 1800-char window at 115 queries)
    assert(line.startsWith("""{"metric":"total","value":1.73,"unit":"sec","queries":{"q01":1.2,"p08":0.5},"""))
    // sf carries only the basename — the path prefix wastes tail window;
    // the full-detail pointer sits between the failed list and sf on
    // every tier (r16)
    assert(line.endsWith(""""failed":1,"failed_queries":["p08"],""" +
      """"full":"bench-full-latest.json","sf":"sf"}"""))
  }
}
