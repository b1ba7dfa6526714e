package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract registry invariants: no name is lost to
  * shadowing (the round-7 la_funnel bug class), and every oracle
  * belongs to a registered query.
  */
class RegistrySpec extends AnyFunSuite {

  test("queries materialize with no within- or cross-registry collisions") {
    // QueryRegistry.q throws on within-registry duplicates at class
    // init and SparkEntry.queries on cross-registry ones — reaching
    // the size assertion proves both guards passed
    val qs = SparkEntry.queries
    assert(qs.size > 200, s"expected the full contract, got ${qs.size}")
  }

  test("every oracle key has a query; oracles are non-empty SQL") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(qs.contains(name), s"oracle without query: $name")
      assert(sql.trim.nonEmpty && sql.toUpperCase.contains("SELECT"),
        s"degenerate oracle SQL for $name")
    }
  }

  test("every bench name — headline and sf1 — is a registered query") {
    // r12: a typo in Bench.headline/sf1Needs used to surface only as a
    // burned 40-minute bench run recording a failed row; now it's a
    // red test at build time. sf1 gating tables must also be real.
    val qs = SparkEntry.queries.keySet
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    Bench.headline.foreach(n =>
      assert(qs.contains(n), s"bench headline names unknown query: $n"))
    (Bench.sf1Needs ++ Bench.sf1EvidenceRows).foreach { case (n, t) =>
      assert(qs.contains(n), s"sf1 block names unknown query: $n")
      assert(tables.contains(t), s"sf1 row $n gates on unknown table: $t")
    }
  }

  test("suspect classification covers every branch with the honest " +
      "labels") {
    def cls(s: String): String =
      """"class":"([a-z-]+)"""".r.findFirstMatchIn(s).get.group(1)
    // fresh rerun + ledger: the isolated baseline adjudicates both ways
    assert(cls(Bench.classifySuspect(Some(1.0), Some((0.9, "aaa")),
      "tip", 0.4)) == "context")
    assert(cls(Bench.classifySuspect(Some(1.5), Some((0.9, "aaa")),
      "tip", 0.4)) == "regression")
    // fresh rerun, no ledger: under 1.5x prev-shared is conclusive
    // (isolated bias is HIGH), at/over is UNadjudicable — never call
    // regression against a possibly page-cache-deflated shared value
    assert(cls(Bench.classifySuspect(Some(0.5), None, "tip", 0.4))
      == "context")
    assert(cls(Bench.classifySuspect(Some(1.2), None, "tip", 0.4))
      == "no-isolated-baseline")
    // ledger only: FINAL at the current tip, provisional when stale,
    // proves nothing when the ledger value itself is a >=1.5x mover
    assert(cls(Bench.classifySuspect(None, Some((0.5, "tip")), "tip",
      0.4)) == "context")
    assert(cls(Bench.classifySuspect(None, Some((0.5, "old")), "tip",
      0.4)) == "context-stale-ledger")
    assert(cls(Bench.classifySuspect(None, Some((0.9, "tip")), "tip",
      0.4)) == "needs-attribution")
    // nothing known at all
    assert(cls(Bench.classifySuspect(None, None, "tip", 0.4))
      == "needs-attribution")
    // the rerun value and its source label land in the fragment
    val frag = Bench.classifySuspect(Some(1.2), None, "abc123", 0.4)
    assert(frag.contains("\"isolated\":1.2") &&
      frag.contains("\"isolated_src\":\"rerun@abc123\""))
  }

  test("duplicate registration is rejected") {
    object Dup extends QueryRegistry {
      q("dup_x", "SELECT 1") { (_, _) => null }
    }
    Dup.queries // force init
    intercept[IllegalArgumentException] {
      object Dup2 extends QueryRegistry {
        q("dup_y", "SELECT 1") { (_, _) => null }
        q("dup_y", "SELECT 2") { (_, _) => null }
      }
      Dup2.queries
    }
  }
}
