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
    // Worst case: every query failed (count only, no name list past 10
    // failures) and every timing hits the 2-char display clamp.
    val results = names.map(n => (n, 999.99, false))
    val line = Bench.renderLine(results, "/root/testdata/sf0.1")
    assert(line.length < 1800, s"bench line ${line.length} chars; must stay < 1800")
    assert(!line.contains("\n"))
    // the few-failures shape (named list) must also fit
    val few = names.zipWithIndex.map { case (n, i) => (n, 999.99, i >= 10) }
    val line2 = Bench.renderLine(few, "/root/testdata/sf0.1")
    assert(line2.length < 1800, s"bench line ${line2.length} chars; must stay < 1800")
    assert(line2.contains("failed_queries"))
  }

  test("line is well-formed for the driver's parser") {
    val results = Seq(("q01_pricing_summary", 1.234567, true), ("p08_minhash_lsh", 0.5, false))
    val line = Bench.renderLine(results, "/tmp/sf")
    // total keeps 2 decimals; per-query values carry 1 (the 2-decimal
    // form crossed the 1800-char window at 115 queries)
    assert(line.startsWith("""{"metric":"total","value":1.73,"unit":"sec","queries":{"q01":1.2,"p08":0.5},"""))
    // sf carries only the basename — the path prefix wastes tail window
    assert(line.endsWith(""""failed":1,"failed_queries":["p08"],"sf":"sf"}"""))
  }
}
