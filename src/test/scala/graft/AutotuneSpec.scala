package graft

import graft.operators.IndexAudits

/** Contract for the nprobe autotune sweep (FAISS ParameterSpace):
  * deterministic cost axis, invariant flags, and the flags' LIVENESS —
  * a sweep wired to the wrong candidate sets would still print rows,
  * so the spec recomputes the full-probe equivalence independently. */
class AutotuneSpec extends SparkSpec {

  test("autotune sweep rows: deterministic cost axis and green flags") {
    val rows = IndexAudits.autotuneNprobe(spark, sfSmall)
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4)))
      .toSeq
    assert(rows.map(_._1) == Seq(1, 2, 4))
    assert(rows.map(_._2) == Seq(0.25, 0.5, 1.0))
    rows.foreach { case (np, _, monotone, fullExact, target) =>
      assert(monotone, s"recall not monotone at nprobe=$np")
      assert(fullExact, s"full probe not exact at nprobe=$np")
      assert(target, s"target never reached (nprobe=$np row)")
    }
  }

  test("flag liveness: a degraded target is still reported reached, an impossible one is not") {
    // target 0 is trivially reached; target above 1.0 can never be —
    // the flag must actually depend on the measured hits
    val easy = IndexAudits.autotuneNprobe(spark, sfSmall, target = 0.0)
      .collect().head.getBoolean(4)
    assert(easy)
    val impossible = IndexAudits.autotuneNprobe(spark, sfSmall, target = 1.5)
      .collect().head.getBoolean(4)
    assert(!impossible)
  }
}
