package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lint for the PLANS.md artifact (regenerated per round by
  * graft.tools.ExplainAudit): it must cover every registered query, and
  * no plan may carry the one window-frame shape Spark evaluates
  * quadratically. A frame whose upper bound is UNBOUNDED FOLLOWING but
  * whose lower bound is anything other than UNBOUNDED PRECEDING
  * (UnboundedFollowingWindowFunctionFrame) re-scans the partition tail
  * for every row — the forward as-of's first implementation used it and
  * measured 132 s vs 1.4 s for the running-frame mirror at sf0.1.
  * Running frames and whole-partition (both-unbounded) frames are O(n)
  * and allowed. FormattedMode spells frames as
  * `specifiedwindowframe(<type>, <lower>, <upper>)`.
  */
class PlansArtifactSpec extends AnyFunSuite {

  private lazy val plans =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PLANS.md")), "UTF-8")

  test("PLANS.md has a section for every registered query") {
    val missing = SparkEntry.registry.map(_.name)
      .filterNot(graft.tools.ExplainAudit.Skipped)
      // heading + newline: bare substring would false-pass on prefix
      // names (## ohlc_daily matching inside ## ohlc_daily_typed)
      .filterNot(n => plans.contains(s"## $n\n"))
    assert(missing.isEmpty,
      s"regenerate PLANS.md (graft.tools.ExplainAudit) — missing: $missing")
  }

  test("no plan uses the quadratic unbounded-following window frame") {
    val frame = """specifiedwindowframe\(\w+, ([^,()]+(?:\(\))?), unboundedfollowing\$\(\)\)""".r
    val bad = frame.findAllMatchIn(plans)
      .filter(_.group(1) != "unboundedpreceding$()")
      .map(_.matched).toList
    assert(bad.isEmpty, s"O(n²) frame(s) found in PLANS.md: $bad")
    // self-check against silent drift in the plan spelling: the allowed
    // whole-partition frame must still be recognizable, else this lint
    // has gone vacuous
    assert(frame.findFirstIn(plans).isDefined,
      "no unbounded-following frames matched at all — FormattedMode " +
        "spelling changed; update the lint regex")
  }
}
