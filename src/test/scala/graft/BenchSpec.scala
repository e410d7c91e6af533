package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-query regression gate is pure arithmetic — spec it without a
  * SparkSession. The bench main wires `outliers` to retry-then-report;
  * these tests pin the comparison rule itself. */
class BenchSpec extends AnyFunSuite {

  test("outliers flags only >factor× regressions above the floor") {
    val baseline = Map("q01" -> 1.0, "q02" -> 2.0, "q03" -> 0.1)
    val timings = Map(
      "q01" -> 2.6, // 2.6× baseline → flagged
      "q02" -> 4.9, // 2.45× baseline → inside the 2.5× gate
      "q03" -> 0.3, // 3× baseline but under the 0.5s floor → jitter, not
      "q04" -> 99.0) // no baseline recorded → cannot be an outlier
    assert(Bench.outliers(timings, baseline) == Map("q01" -> 2.6))
  }

  test("outliers respects custom factor and floor") {
    val baseline = Map("q01" -> 1.0)
    assert(Bench.outliers(Map("q01" -> 1.6), baseline, factor = 1.5)
      == Map("q01" -> 1.6))
    assert(Bench.outliers(Map("q01" -> 1.6), baseline, factor = 1.5,
      floorSec = 2.0).isEmpty)
  }

  test("outliers is empty when no baseline is recorded") {
    assert(Bench.outliers(Map("q01" -> 100.0), Map.empty).isEmpty)
  }

  test("loadBaseline parses the recorded resource (once it exists)") {
    val b = Bench.loadBaseline()
    // resource is generated from a clean isolated run; when present every
    // value must be a positive per-query seconds figure keyed by qNN
    b.foreach { case (k, v) =>
      assert(k.startsWith("q") && v > 0.0, s"bad baseline row $k -> $v")
    }
  }

  test("baseline records its scale factor so the gate skips other SFs") {
    // without the marker an sf1 run would flag ~every query, retry the
    // whole registry, and overflow the driver's 2.6KB tail capture
    val sf = Bench.baselineSf()
    assert(Bench.loadBaseline().isEmpty || sf.isDefined,
      "a recorded baseline must carry its '# sf:' marker")
    sf.foreach(d => assert(d.nonEmpty && !d.contains(" "), s"bad sf dir: $d"))
  }
}
