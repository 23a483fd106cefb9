package graft.sources

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.osmpbf.QueryBounds

/** Pure-function gates for the header-bbox pruning predicate: bounds
  * harvesting must tighten conjunctively, and intersection must stay
  * conservative (unknown sides pass; touching edges pass).
  */
class QueryBoundsSpec extends AnyFunSuite {

  test("conjunctive filters tighten to the intersection") {
    val b = QueryBounds.fromFilters(Array(
      GreaterThan("lat", 10.0), GreaterThanOrEqual("lat", 20.0),
      LessThan("lat", 60.0), LessThanOrEqual("lon", 5.0)))
    assert(b.latMin.contains(20.0)) // the tighter of the two lower bounds
    assert(b.latMax.contains(60.0))
    assert(b.lonMax.contains(5.0))
    assert(b.lonMin.isEmpty)
  }

  test("equality pins both sides; other filters are ignored") {
    val b = QueryBounds.fromFilters(Array(
      EqualTo("lat", 42.0), EqualTo("type", "node"),
      IsNotNull("lat"), StringStartsWith("name", "x")))
    assert(b.latMin.contains(42.0) && b.latMax.contains(42.0))
    assert(b.lonMin.isEmpty && b.lonMax.isEmpty)
  }

  test("intersection is conservative") {
    val bbox = (-10.0, 40.0, 10.0, 50.0) // (left, bottom, right, top)
    assert(QueryBounds().intersects(bbox)) // unbounded always passes
    assert(QueryBounds(latMin = Some(50.0)).intersects(bbox)) // touching edge
    assert(!QueryBounds(latMin = Some(50.1)).intersects(bbox))
    assert(QueryBounds(latMax = Some(40.0)).intersects(bbox))
    assert(!QueryBounds(latMax = Some(39.9)).intersects(bbox))
    assert(QueryBounds(lonMin = Some(9.9), lonMax = Some(20.0)).intersects(bbox))
    assert(!QueryBounds(lonMin = Some(10.1)).intersects(bbox))
    assert(!QueryBounds(lonMax = Some(-10.1)).intersects(bbox))
  }

  test("antimeridian-wraparound bbox (left > right) is never pruned") {
    val wrap = (170.0, 9.0, -175.0, 11.0)
    assert(QueryBounds(lonMin = Some(175.0)).intersects(wrap))
    assert(QueryBounds(lonMax = Some(-179.0)).intersects(wrap))
    // lat sides still apply
    assert(!QueryBounds(latMin = Some(20.0)).intersects(wrap))
  }

  test("non-numeric comparands are ignored, not mis-coerced") {
    val b = QueryBounds.fromFilters(Array(
      GreaterThan("lat", "oops"), LessThan("lon", null)))
    assert(b.isUnbounded)
  }
}
