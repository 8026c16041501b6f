package graft

/** Plan-shape gates for the round-11 queries — each SURVEY §2 scale
  * claim asserted on the physical plan.
  */
class Round21PlanSpec extends SparkTestBase {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("rag_chunk_split is a map-only explode — zero shuffles") {
    val plan = planOf("rag_chunk_split")
    assert(plan.contains("Generate"), s"no explode in the plan:\n$plan")
    assert(!plan.contains("Exchange"),
      s"the token-linear chunker must not shuffle:\n$plan")
  }

  test("cramer_von_mises combines the value grain map-side") {
    val plan = planOf("cramer_von_mises")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"the cents grain reaches the exchange un-combined:\n$plan")
  }

  test("cliff_delta reads only (event_type, value) from the scan") {
    val plan = planOf("cliff_delta")
    assert(!plan.contains("user_id") && !plan.contains("props"),
      s"scan reads columns the effect size never touches:\n$plan")
  }

  test("ann_filtered_search prunes the label predicate BEFORE the probe join") {
    val df = SparkEntry.queries("ann_filtered_search")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the filter must sit under the candidate side's aggregation,
    // not above the probe join: in-search filtering, the C142 claim
    val joinIdx = plan.indexOf("BroadcastHashJoin")
    val filterIdx = plan.indexOf("(label")
    assert(filterIdx >= 0, s"no label predicate in the plan:\n$plan")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      s"label filter not on the scan side below the probe join:\n$plan")
  }

  test("welch_anova combines the k-group sufficient stats map-side") {
    val plan = planOf("welch_anova")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"group stats reach the exchange un-combined:\n$plan")
    assert(!plan.contains("o_orderdate"),
      s"scan reads columns Welch never touches:\n$plan")
  }

  test("label_noise_screen votes through the bounded TopKPerKey heap") {
    val plan = planOf("label_noise_screen")
    assert(plan.contains("TopKPerKey"),
      s"the corpus x |Q| score relation misses the bounded heap:\n$plan")
  }

  test("stratified_kfold_split is map-only into a combined keyed count") {
    val plan = planOf("stratified_kfold_split")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"fold counts reach the exchange un-combined:\n$plan")
    assert(!plan.contains("text#"),
      s"scan reads the text column the fold hash never touches:\n$plan")
  }

  test("mm_audio_vad_segments windows partition per doc, never globally") {
    val plan = planOf("mm_audio_vad_segments")
    assert(!plan.contains("Window [") ||
      !plan.split("\n").exists(l => l.contains("Window [")
        && !l.contains("doc_id")),
      s"a global (un-partitioned) window crept into the VAD plan:\n$plan")
  }

  test("ann_ivf_incremental searches through dynamic partition pruning on the cell dirs") {
    val df = SparkEntry.queries("ann_ivf_incremental")(spark, sfDir)
    // the row itself is model-sized; the claim is about the final
    // search — executed inside the query builder (exceptAll counts),
    // so here we gate the sidecar read-out's shape instead: the
    // stats relation must be a plain scan + model-sized projection,
    // no shuffle of the index relation
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("SortMergeJoin"),
      s"the model-sized sidecar read-out must not sort-merge:\n$plan")
  }
}
