package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog wiring consistency — cheap key-level invariants that a typo or
  * copy-paste would otherwise break silently:
  *  - `Queries.all ++ ExtQueries.all` OVERWRITES on a duplicate name, so a
  *    collision would silently shadow one implementation while its oracle
  *    still gates the other's semantics;
  *  - an oracle without a query is dead SQL; the reverse is a documented
  *    rows-only row, so only counted;
  *  - a headline name missing from the catalog would NPE the bench. */
class CatalogSpec extends AnyFunSuite {

  test("no name collisions between the base and extension catalogs") {
    val dup = Queries.all.keySet intersect ExtQueries.all.keySet
    assert(dup.isEmpty, s"colliding catalog names (++ would shadow): $dup")
    val dupOracle = Queries.oracle.keySet intersect ExtQueries.oracle.keySet
    assert(dupOracle.isEmpty, s"colliding oracle names: $dupOracle")
  }

  test("every oracle names an implemented query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every headline query exists in the catalog") {
    val missing = Queries.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names missing from the catalog: $missing")
    assert(Queries.headline.distinct.size === Queries.headline.size,
      "duplicate headline entries")
  }

  test("rows-only set is exactly the documented four") {
    // q_streaming_neardup left this set in r15: the catalog row now runs
    // the portable md5-60bit signature family and is fully oracle-gated
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set("q_sketch_distinct",
      "q_sketch_quantiles", "sim_topk_pq", "sim_topk_ivfpq"),
      s"rows-only set drifted (update SURVEY + this pin together): $rowsOnly")
  }
}
