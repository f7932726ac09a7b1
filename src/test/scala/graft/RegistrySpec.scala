package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.registry._

/** Pins the per-family registry split: the composed maps must be
  * exactly the pre-split surface (180 queries, every one oracled) and
  * the slices must stay disjoint — `++` would silently mask a key
  * collision between two family files otherwise. */
class RegistrySpec extends AnyFunSuite {

  private val slices: Seq[(String, Map[String, _], Map[String, String])] = Seq(
    ("relational", RelationalRegistry.queries, RelationalRegistry.oracles),
    ("vectorindex", VectorIndexRegistry.queries, VectorIndexRegistry.oracles),
    ("ingest", IngestRegistry.queries, IngestRegistry.oracles),
    ("text", TextRegistry.queries, TextRegistry.oracles),
    ("dedup", DedupRegistry.queries, DedupRegistry.oracles),
    ("streaming", StreamingRegistry.queries, StreamingRegistry.oracles))

  test("slices are pairwise disjoint (query and oracle keys)") {
    for {
      (na, qa, oa) <- slices
      (nb, qb, ob) <- slices if na < nb
    } {
      val qdup = qa.keySet & qb.keySet
      assert(qdup.isEmpty, s"query keys in both $na and $nb: $qdup")
      val odup = oa.keySet & ob.keySet
      assert(odup.isEmpty, s"oracle keys in both $na and $nb: $odup")
    }
  }

  test("each slice's oracle keys are a subset of its own query keys") {
    slices.foreach { case (name, qs, os) =>
      val orphans = os.keySet -- qs.keySet
      assert(orphans.isEmpty, s"slice $name has oracles with no query: $orphans")
    }
  }

  test("composed surface: every registered query has an oracle, count pinned") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(qs.keySet == os.keySet,
      s"queries without oracle: ${qs.keySet -- os.keySet}; " +
        s"oracles without query: ${os.keySet -- qs.keySet}")
    // the r13-era surface had 180 registered queries; the count may only grow
    assert(qs.size >= 180, s"registry shrank to ${qs.size} queries")
  }

  test("the two persisted-graph aliases reuse their originals' SQL verbatim") {
    val os = SparkEntry.oracleSql
    assert(os("pagerank_persisted") == os("pagerank_docs"))
    assert(os("cc_persisted") == os("minhash_clusters"))
  }
}
