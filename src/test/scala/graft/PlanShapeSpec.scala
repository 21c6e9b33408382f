package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, Repartition, RepartitionByExpression}

import graft.operators.TextAnalysis
import graft.sources.Tables

/** Plan-shape assertions for the scale-critical fixes: these lock the
  * SHAPE of the plan (what shuffles, what broadcasts), not its result —
  * the properties a 100 TB run depends on and a correctness oracle
  * cannot see.
  */
class PlanShapeSpec extends SparkSpecBase {

  test("t6 tfidf: the vocabulary join carries no broadcast hint; only the 1-row doc count does") {
    // at web-corpus scale the distinct-token table is billions of rows —
    // a forced broadcast OOMs; AQE may still broadcast it when it
    // measures small, but the PLAN must not demand it
    val plan = TextAnalysis.tfidf(Tables(spark, sfDir)).queryExecution.optimizedPlan
    val hintedJoins = plan.collect {
      case j: Join if j.hint.leftHint.orElse(j.hint.rightHint).isDefined => j
    }
    assert(hintedJoins.length == 1,
      s"expected exactly one hinted join (the n_docs single-row cross join), got:\n$plan")
    // no separate driver-side count() action: the doc count is a plan node
    assert(plan.toString.contains("n_docs"), "doc count must fold into the plan")
  }

  test("spreadIfNarrow: narrow scans spread to full parallelism, well-split scans pass through") {
    val cores = spark.sparkContext.defaultParallelism
    val narrow = spark.range(0, 100, 1, 1).toDF("id")
    assert(operators.spreadIfNarrow(narrow).rdd.getNumPartitions == cores,
      "a single-split input must spread over all cores")

    val wide = spark.range(0, 100, 1, cores * 2).toDF("id")
    val out = operators.spreadIfNarrow(wide)
    val exchanges = out.queryExecution.optimizedPlan.collect {
      case r: Repartition => r
      case r: RepartitionByExpression => r
    }
    assert(exchanges.isEmpty,
      "an input already split past cluster parallelism must not grow a full-corpus exchange")
    assert(out.rdd.getNumPartitions == cores * 2, "pass-through keeps the scan's own splits")
  }
}
