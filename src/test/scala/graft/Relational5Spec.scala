package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the fifth relational batch — the invariants the
  * sf0.01 oracle match can miss because fixture data need not hit them.
  */
class Relational5Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q73 grid radius join equals the naive distance filter (boundary incl.)") {
    import spark.implicits._
    // replicate the query's coordinate derivation, compute the answer
    // with an UNBUCKETED cross product, and require exact equality —
    // this pins 9-cell completeness AND the <=' boundary semantics
    // (a pair at distance exactly r must match)
    val grid = SparkEntry.queries("q73_spatial_grid_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cust = Tables.t(spark, sf, "customer").select(
      $"c_custkey",
      (($"c_custkey" * 48271L) % 100000L).as("cx"),
      (($"c_custkey" * 69621L) % 100000L).as("cy"))
    val supp = Tables.t(spark, sf, "supplier").select(
      $"s_suppkey",
      (($"s_suppkey" * 16807L) % 100000L).as("sx"),
      (($"s_suppkey" * 282475249L) % 100000L).as("sy"))
    val d2 = ($"cx" - $"sx") * ($"cx" - $"sx") +
      ($"cy" - $"sy") * ($"cy" - $"sy")
    val naive = supp.crossJoin(cust).filter(d2 <= lit(5000L * 5000L))
      .groupBy($"s_suppkey")
      .agg(count(lit(1)).as("n"), min(d2).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(grid == naive,
      s"grid-join result diverges from the naive product: " +
        s"missing=${(naive -- grid).take(3)} extra=${(grid -- naive).take(3)}")
  }

  test("q77 rank-selected medians equal percentile(0.5) per nation") {
    import spark.implicits._
    // the funnel-free rank-arithmetic median must agree with Spark's
    // buffering exact percentile on every nation (x2 keeps it integral)
    val q = SparkEntry.queries("q77_mad_outliers")(spark, sf)
      .select($"n_name", $"median_x2_cents").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaPercentile = Tables.t(spark, sf, "customer")
      .select($"c_nationkey",
        round($"c_acctbal" * 100, 0).cast("long").as("cents"))
      .groupBy($"c_nationkey")
      // exact interpolating percentile: the even-count median averages
      // the two middles, so x2 is integral — the doubled-median trick
      .agg((expr("percentile(cents, 0.5)") * 2).as("m2x"))
      .join(Tables.t(spark, sf, "nation"),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"m2x").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(q.keySet == viaPercentile.keySet)
    q.foreach { case (n, med2) =>
      assert(med2.toDouble == viaPercentile(n),
        s"$n: rank median2 $med2 != percentile median2 ${viaPercentile(n)}")
    }
  }

  test("p75 copy counts are floor(E) or floor(E)+1, and match the ppm rate") {
    import spark.implicits._
    val out = SparkEntry.queries("p75_epoch_upsample")(spark, sf).collect()
    out.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      val ePpm = r.getAs[Long]("e_ppm")
      val docsOut = r.getAs[Long]("docs_out")
      val fl = ePpm / 1000000L
      // every doc contributes fl or fl+1 copies
      assert(docsOut >= nDocs * fl && docsOut <= nDocs * (fl + 1),
        s"${r.getAs[String]("source")}: $docsOut outside [$nDocs*$fl, $nDocs*${fl + 1}]")
    }
  }

  test("q75 is byte-deterministic across shuffle-partition settings " +
    "and renders pure integer strings") {
    // round-6 driver red: q75 hashed green in every judge replay but red
    // once in the driver file. This probe pins the two invariants that
    // make a hash flake impossible on our side: (1) the result is
    // byte-identical under a different shuffle layout (no accumulation-
    // order sensitivity — all sums are integral/decimal), and (2) every
    // wide cell is a canonical integer string (no exponent, no '.', no
    // reader-dependent decimal bridge left to diverge on).
    val conf = spark.conf
    val before = conf.get("spark.sql.shuffle.partitions")
    def run(): Seq[String] =
      SparkEntry.queries("q75_grouped_ols")(spark, sf)
        .collect().map(_.mkString("")).toSeq
    try {
      conf.set("spark.sql.shuffle.partitions", "7")
      val a = run()
      conf.set("spark.sql.shuffle.partitions", "32")
      val b = run()
      assert(a == b, "q75 output depends on shuffle layout")
      val intStr = "-?[0-9]+".r
      val wide = SparkEntry.queries("q75_grouped_ols")(spark, sf)
        .select("slope_num", "slope_den", "intercept_num").collect()
      assert(wide.nonEmpty)
      wide.foreach { r =>
        (0 until 3).foreach { i =>
          val v = r.getString(i)
          assert(intStr.matches(v), s"non-canonical integer string: '$v'")
        }
      }
    } finally conf.set("spark.sql.shuffle.partitions", before)
  }
}
