package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.BooleanType
import graft.operators.IndexAudits

/** The audit projections ARE the registered correctness surfaces for
  * the seed-/codebook-dependent operators (SparkEntry routes
  * `ivf_build_stats`, `knn_batch_ivf`, `cluster_ivf`, the PQ family,
  * `doc_dedup`, … through them), so this spec pins the same contract
  * the DuckDB oracle checks — every boolean column TRUE on every row —
  * plus the deterministic counts, at test scale. A regression in a
  * production search path (wrong distance, loose top-k, pruning leak,
  * persisted/memory divergence) flips a flag here before it reaches
  * the gate. */
class IndexAuditsSpec extends SparkSpec {

  /** Assert every boolean column is TRUE on every row (null = fail). */
  private def allFlagsTrue(df: DataFrame): Unit = {
    val flags = df.schema.fields.filter(_.dataType == BooleanType).map(_.name)
    assert(flags.nonEmpty, "audit frame has no flag columns")
    val rows = df.collect()
    assert(rows.nonEmpty, "audit frame is empty")
    for (r <- rows; f <- flags) {
      val i = r.fieldIndex(f)
      assert(!r.isNullAt(i) && r.getBoolean(i),
        s"flag $f is not TRUE in row $r")
    }
  }

  test("ivf build audit: lists partition the corpus bijectively") {
    val a = IndexAudits.ivfBuildAudit(spark, sfSmall)
    allFlagsTrue(a)
    val r = a.head
    assert(r.getLong(r.fieldIndex("n_lists")) == 4L)
    assert(r.getLong(r.fieldIndex("n_vectors")) == 500L)
  }

  test("ivf append audit: appended lists still cover the full corpus") {
    val a = IndexAudits.ivfAppendAudit(spark, sfSmall)
    allFlagsTrue(a)
    assert(a.head.getLong(a.head.fieldIndex("total_rows")) == 500L)
  }

  test("pruned search audit: exact recompute, tight top-k, recall floor") {
    val a = IndexAudits.prunedSearchAudit(spark, sfSmall, persisted = false)
    allFlagsTrue(a)
    assert(a.head.getLong(a.head.fieldIndex("n_hits")) == 10L)
  }

  test("filtered pruned audit: selector honored, exhaustive within probed+filtered, recall floor") {
    val a = IndexAudits.filteredPrunedAudit(spark, sfSmall)
    allFlagsTrue(a)
    assert(a.head.getLong(a.head.fieldIndex("n_exact")) == 10L)
    // the floor is live: demanding full recall from a 2/4-probe pruned
    // search must be able to fail (guards against a vacuous flag)
    val strict = IndexAudits.filteredPrunedAudit(spark, sfSmall, minRecall = 1.01)
    assert(!strict.head.getBoolean(strict.head.fieldIndex("recall_ok")))
  }

  test("persisted pruned audit adds bit-identical disk/memory equality") {
    val a = IndexAudits.prunedSearchAudit(spark, sfSmall, persisted = true)
    assert(a.columns.contains("matches_memory_ok"))
    allFlagsTrue(a)
  }

  test("batch IVF audit: per-query invariants + global recall floor") {
    val a = IndexAudits.batchIvfAudit(spark, sfSmall)
    allFlagsTrue(a)
    assert(a.count() == 500L)
  }

  test("cluster IVF audit: refinement of the exact ε-graph + agreement") {
    val a = IndexAudits.clusterIvfAudit(spark, sfSmall)
    allFlagsTrue(a)
    assert(a.count() == 500L)
  }

  test("LSH hard-negatives audit: cross-label, exact cosines, recall floor") {
    allFlagsTrue(IndexAudits.hardNegativesLshAudit(spark, sfSmall))
  }

  test("PQ flat-refine audit: re-ranked distances are exact L2") {
    allFlagsTrue(IndexAudits.pqFlatAudit(spark, sfSmall))
  }

  test("IVF-PQ ADC audit: probed-list membership + recall floor") {
    allFlagsTrue(IndexAudits.ivfPqAudit(spark, sfSmall))
  }

  test("persisted PQ audit: binary postings ≡ in-memory ADC results") {
    allFlagsTrue(IndexAudits.pqPersistedAudit(spark, sfSmall))
  }

  test("PQ stats audit: m disjoint histograms each of full corpus mass") {
    val a = IndexAudits.pqStatsAudit(spark, sfSmall)
    allFlagsTrue(a)
    assert(a.head.getLong(a.head.fieldIndex("n_subspaces")) == 8L)
  }

  test("IVF-SQ8 audit: probed-list membership, bounded sims, recall floor") {
    allFlagsTrue(IndexAudits.ivfQuantAudit(spark, sfSmall))
  }

  test("doc dedup audit: min-member canonicals, one kept, dups merged") {
    val a = IndexAudits.docDedupAudit(spark, sfSmall)
    allFlagsTrue(a)
    assert(a.count() == 500L)
  }

  test("doc kNN audit: tight top-k over every embedded candidate") {
    val a = IndexAudits.docKnnAudit(spark, sfSmall)
    allFlagsTrue(a)
    assert(a.head.getLong(a.head.fieldIndex("n_hits")) == 10L)
  }

  test("imbalanceAudit: count restated, configured nlist reported, invariant bounds hold") {
    val row = IndexAudits.imbalanceAudit(spark, sfSmall).collect().head
    assert(row.getLong(0) == Tables.embeddings(spark, sfSmall).count())
    // n_lists is the CONFIGURED nlist, not the observed distinct count —
    // an empty list must not change the reported value (it flips the
    // informational all_lists_nonempty flag instead)
    assert(row.getInt(1) == 4)
    assert(row.getBoolean(3) && row.getBoolean(4))
  }

  test("imbalanceAudit: n_lists stays the configured value even when lists outnumber points") {
    // nlist=600 over the 500-vector table: at least 100 lists MUST be
    // empty, so the observed distinct count is below the configured
    // one — the audit must still report 600 and flag
    // all_lists_nonempty = false, and both invariant bounds must hold
    // with the configured denominator (empty lists count as size 0).
    val row = IndexAudits.imbalanceAudit(spark, sfSmall, nlist = 600).collect().head
    assert(row.getInt(1) == 600)
    assert(!row.getBoolean(2), "500 points cannot fill 600 lists")
    assert(row.getBoolean(3) && row.getBoolean(4))
  }
}
