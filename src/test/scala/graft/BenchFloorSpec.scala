package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the bench re-time floor inheritance: floors derive from the
  * per-query MIN of the working-tree and COMMITTED sidecar copies, so a
  * contaminated overwrite of EITHER copy cannot weaken a query's re-time
  * protection (the r13 incident: a loaded-host driver run left q44
  * min=5.29 on disk against 1.874 committed — floor 8 s instead of
  * 3.75 s, stripping exactly the query that needed protecting).
  */
class BenchFloorSpec extends AnyFunSuite {

  private val clean =
    """{"total":92.22,"queries":{"q44_token_jaccard":{"min":1.874,"ext":0,"runs":[3.715,2.011,1.874]},"q13_district_monthly":{"min":0.412,"ext":0,"runs":[0.5,0.42,0.412]}}}"""
  private val contaminated =
    """{"total":110.56,"queries":{"q44_token_jaccard":{"min":5.290,"ext":6,"runs":[32.864,22.170,5.290]},"q13_district_monthly":{"min":0.455,"ext":0,"runs":[0.5,0.47,0.455]}}}"""

  test("a contaminated on-disk overwrite cannot weaken the floor") {
    val merged = Bench.mergedMins(Bench.parseMins(contaminated),
      Bench.parseMins(clean))
    // q44 floors at 2×1.874 = 3.75 s — NOT the 8 s a 5.29 min would clamp to
    assert(Bench.floorFor(merged, "q44_token_jaccard") === 3.748)
    // symmetric: contaminated COMMITTED copy, clean disk
    val merged2 = Bench.mergedMins(Bench.parseMins(clean),
      Bench.parseMins(contaminated))
    assert(Bench.floorFor(merged2, "q44_token_jaccard") === 3.748)
  }

  test("clamp bounds, new-query fallback, and one-sided records") {
    // sub-second queries clamp up to the 2 s floor, slow ones cap at 8 s
    assert(Bench.clampFloor(0.4) === 2.0)
    assert(Bench.clampFloor(6.0) === 8.0)
    // a query absent from BOTH records takes the historical 4 s floor
    assert(Bench.floorFor(Map.empty, "q999_new") === 4.0)
    // present in only one copy: that copy's figure is used
    val oneSided = Bench.mergedMins(Map.empty, Bench.parseMins(clean))
    assert(Bench.floorFor(oneSided, "q13_district_monthly") === 2.0)
    // an unreadable/missing sidecar parses to empty, never throws
    assert(Bench.parseMins("not json at all") === Map.empty)
  }
}
