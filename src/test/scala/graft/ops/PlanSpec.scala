package graft.ops

import graft.SparkSpec

/** Physical-plan assertions at sf0.001 — the "is Catalyst doing what we
  * designed for" checks: filters reach the parquet scan, projections
  * prune the read schema, small sides broadcast, top-k avoids a global
  * sort, and the approx sketch stays inside its error envelope.
  */
class PlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntryPlans.executedPlan(spark, dir, q)

  test("q02 pushes both filters into the parquet scan and prunes columns") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_shipdate") && p.contains("l_quantity"), p)
    // read schema carries only the 5 needed columns, not all 16
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_comment") && !read.contains("l_tax"), read)
  }

  test("q03 broadcasts the filtered customer dimension") {
    assert(plan("q03_segment_revenue").contains("BroadcastHashJoin"))
  }

  test("q14 plans global top-k as TakeOrderedAndProject (no full sort)") {
    assert(plan("q14_top_k").contains("TakeOrderedAndProject"))
  }

  test("q31 minhash computes all 16 minima in one partial aggregation") {
    val p = plan("q31_minhash_pairs")
    // partial_min on the map side — one groupBy, not 16
    assert(p.contains("partial_min") || p.contains("HashAggregate"), p)
  }

  test("q33 shingle self-join keeps AQE skew handling enabled and unforced") {
    // the df-cap bounds per-key fan-out; residual skew inside the cap is
    // AQE's job — so the plan must stay adaptive and the self-join must
    // not be hint-forced to a strategy that bypasses skew splitting
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
    val p = plan("q33_jaccard_pairs")
    assert(p.contains("AdaptiveSparkPlan"), p.take(500))
    // no join-strategy hint anywhere in the q33 build (hints survive into
    // the analyzed plan, so their absence is checkable)
    val analyzed = graft.SparkEntry.queries("q33_jaccard_pairs")(spark, dir)
      .queryExecution.analyzed.toString
    assert(!analyzed.contains("UnresolvedHint") && !analyzed.contains("hint"), analyzed.take(500))
  }

  test("q28 approx_count_distinct stays within 5% of exact") {
    val r = Relational.q28ApproxDistinct(spark, dir).head()
    val (ap, ep) = (r.getLong(0), r.getLong(1))
    val (ao, eo) = (r.getLong(2), r.getLong(3))
    assert(math.abs(ap - ep).toDouble / ep < 0.05, s"parts: approx $ap exact $ep")
    assert(math.abs(ao - eo).toDouble / eo < 0.05, s"orders: approx $ao exact $eo")
  }
}

/** Helper giving specs access to executed plans of catalog queries. */
object SparkEntryPlans {
  def executedPlan(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String): String =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
}
