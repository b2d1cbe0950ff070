package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity tripwires.
  *
  * A duplicate key inside a Scala `Map(...)` literal is legal and silently
  * last-wins — exactly how the rate-based stratified sampler dropped out
  * of the registry unnoticed (r12 review: two `"q_sample_stratified"`
  * bindings in PipelineQueries). The compiler can't catch it, and the
  * merged registry can't see it, so this spec greps the operator sources
  * for query-key literals and fails on any duplicate within a file; the
  * cross-file case is covered by comparing the merged registry size with
  * the sum of the per-object map sizes. */
class RegistrySpec extends AnyFunSuite {

  private val keyRe = """"((?:q|lf)_[a-z0-9_]+)"\s*->\s*Q""".r

  test("no duplicate query keys within any operator source file") {
    val roots = Seq("src/main/scala/graft/operators",
      "src/main/scala/graft/streaming")
    val files = roots.flatMap { r =>
      val d = new java.io.File(r)
      if (d.isDirectory) d.listFiles.toSeq.filter(_.getName.endsWith(".scala"))
      else Seq.empty
    }
    assert(files.nonEmpty, "operator sources not found — run tests from the repo root")
    for (f <- files) {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      val keys = try keyRe.findAllMatchIn(src.mkString).map(_.group(1)).toSeq
      finally src.close()
      val dups = keys.groupBy(identity).filter(_._2.size > 1).keys
      assert(dups.isEmpty,
        s"${f.getName}: duplicate query key(s) ${dups.mkString(", ")} — " +
          "a Scala Map literal silently keeps only the LAST binding")
    }
  }

  test("merged registry keeps every per-object key (no cross-object collisions)") {
    import graft.operators._
    val maps = Seq(ParityQueries.all, RelationalQueries.all, TpchRemainder.all,
      AdvancedQueries.all,
      PipelineQueries.all, Curation.all, EventLifecycle.all, Scoring.all,
      Graph.all, QualityChecks.all, Tokenize.all, IncrementalQueries.all,
      DataSelection.all, TimeSeries.all,
      graft.streaming.StreamingQueries.all)
    assert(maps.map(_.size).sum === SparkEntry.queries.size,
      "two operator objects register the same query name")
  }

  test("bench headline and warmup names all resolve in the registry") {
    // a typo'd headline name would silently drop that row from the bench
    // artifact's per-query maps (the filter just misses)
    val keys = SparkEntry.queries.keySet
    val missingH = Bench.headline.filterNot(keys)
    assert(missingH.isEmpty, s"headline names not in registry: $missingH")
    val missingW = Bench.warmupRows.filterNot(keys)
    assert(missingW.isEmpty, s"warmup names not in registry: $missingW")
  }

  test("cross-leg minima merge: union of keys, min per key, headline covered") {
    // the r15 bench artifact's queries_min_all_legs rides this merge; a
    // regression that drops keys would silently shrink round-over-round
    // comparability (r14 verdict #6)
    val prior = Map("a" -> 2.0, "b" -> 1.0)
    val leg = Map("b" -> 3.0, "c" -> 0.5)
    val m = Bench.mergeMinima(prior, leg)
    assert(m === Map("a" -> 2.0, "b" -> 1.0, "c" -> 0.5))
    // a full-registry leg covers every headline query, so the merged map
    // must too — regardless of what prior legs carried
    val legFull = Bench.headline.map(_ -> 1.0).toMap
    val merged = Bench.mergeMinima(Map("stale_only" -> 9.9), legFull)
    assert(Bench.headline.subsetOf(merged.keySet))
  }
}
