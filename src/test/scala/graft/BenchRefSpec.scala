package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-reference merge discipline (VERDICT r9 task 1): a
  * contended full run must never degrade the committed quiet
  * reference profile that the burst-retime defense keys off.
  */
class BenchRefSpec extends AnyFunSuite {

  test("contended run leaves reference minima intact") {
    val quiet = Map("q_a" -> 1.0, "q_b" -> 2.0, "q_c" -> 0.5)
    // uniformly ~1.3x contention-inflated fresh run (the r9 driver shape)
    val fresh = Seq("q_a" -> 1.3, "q_b" -> 2.6, "q_c" -> 0.65)
    val (merged, median) = Bench.mergeReference(fresh, quiet)
    assert(merged.toMap === quiet)
    assert(math.abs(median - 1.3) < 1e-9)
  }

  test("genuine improvement becomes the new reference minimum") {
    val quiet = Map("q_a" -> 1.0, "q_b" -> 2.0)
    val fresh = Seq("q_a" -> 0.4, "q_b" -> 2.1)
    val (merged, _) = Bench.mergeReference(fresh, quiet)
    assert(merged.toMap === Map("q_a" -> 0.4, "q_b" -> 2.0))
  }

  test("new queries enter at fresh time; dropped queries leave") {
    val quiet = Map("q_old" -> 1.0, "q_keep" -> 2.0)
    val fresh = Seq("q_keep" -> 2.5, "q_new" -> 3.0)
    val (merged, median) = Bench.mergeReference(fresh, quiet)
    assert(merged.toMap === Map("q_keep" -> 2.0, "q_new" -> 3.0))
    assert(!merged.exists(_._1 == "q_old"))
    // median ignores queries with no reference
    assert(math.abs(median - 1.25) < 1e-9)
  }

  test("no reference at all passes fresh through with ratio 1.0") {
    val fresh = Seq("q_a" -> 1.5)
    val (merged, median) = Bench.mergeReference(fresh, Map.empty)
    assert(merged === fresh)
    assert(median === 1.0)
  }
}
