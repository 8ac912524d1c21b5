package org.apache.spark.sql

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** The SparkSessionExtensions wiring (`spark.sql.extensions=
  * graft.functions.GraftExtensions`) must expose BOTH routing rules and
  * the native function surface — this is the only entry point a pure-SQL
  * deployment has, so the injection list is contract, not convenience.
  * (Lives in the sql package to reach the private[sql] build hooks; the
  * functional behavior of each rule/function is covered by its own spec.)
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("both optimizer routing rules are injected") {
    val ext = new SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val rules = ext.buildOptimizerRules(graft.TestSpark.spark)
    assert(rules.contains(graft.plans.LtsRoute), rules.toString)
    assert(rules.contains(graft.plans.CorpusRoute), rules.toString)
  }

  test("native functions register through the extensions path") {
    val ext = new SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val reg = graft.TestSpark.spark.sessionState.functionRegistry.clone()
    ext.registerFunctions(reg)
    for (name <- Seq("vec_dot", "sorted_intersect_count", "minhash_agg"))
      assert(reg.functionExists(FunctionIdentifier(name)), name)
  }
}
