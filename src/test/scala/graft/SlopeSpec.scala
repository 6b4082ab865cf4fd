package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.SlopeCheck

/** The scale-slope regression gate, wired into `sbt test` so it can
  * never be forgotten: every build re-checks the COMMITTED artifact
  * pair (bench_out.json @ sf0.1 vs bench_x10.json @ the ×10 replica)
  * through [[SlopeCheck.check]] — a query whose slope exceeds its
  * family bound, FAILED in either run, or is missing from one
  * artifact, is a red build, exactly like an oracle mismatch.
  *
  * The spec also pins artifact↔registry agreement both ways: a query
  * added to [[SparkEntry.queries]] without re-running the bench chain
  * (tools/bench_chain.sh) fails here — the slope gate only protects
  * queries that have actually been measured — and a stale artifact
  * carrying queries no longer in the registry fails too.
  *
  * No SparkSession needed: this is pure artifact parsing, ~ms.
  */
class SlopeSpec extends AnyFunSuite {

  private def read(name: String): String = {
    val p = java.nio.file.Paths.get(name)
    assert(java.nio.file.Files.exists(p),
      s"$name missing — run tools/bench_chain.sh to (re)generate the committed artifact pair")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  private lazy val baseJson = read("bench_out.json")
  private lazy val scaledJson = read("bench_x10.json")
  private lazy val base = SlopeCheck.parseQueries(baseJson)
  private lazy val scaled = SlopeCheck.parseQueries(scaledJson)

  test("committed artifact pair covers the registry exactly (no unmeasured or ghost queries)") {
    val registry = SparkEntry.queries.keySet
    val unmeasured = (registry -- base.keySet) ++ (registry -- scaled.keySet)
    assert(unmeasured.isEmpty,
      s"registry queries absent from a committed bench artifact (run tools/bench_chain.sh): " +
        unmeasured.toSeq.sorted.mkString(", "))
    val ghosts = (base.keySet -- registry) ++ (scaled.keySet -- registry)
    assert(ghosts.isEmpty,
      s"stale artifact rows for queries no longer registered: " +
        ghosts.toSeq.sorted.mkString(", "))
  }

  test("no query violates its scale-slope bound, failed, or went missing at x10") {
    val rows = SlopeCheck.check(base, scaled,
      SlopeCheck.parseFailed(baseJson), SlopeCheck.parseFailed(scaledJson))
    val viol = rows.filterNot(_.ok)
    assert(viol.isEmpty,
      s"\n${viol.map(r => s"VIOL ${r.query}: ${r.detail}").mkString("\n")}")
  }
}
