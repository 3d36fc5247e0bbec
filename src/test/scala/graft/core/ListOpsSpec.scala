package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ListOpsSpec extends AnyFunSuite {

  test("filterAcc: acc updates on every element, keep decided on accBefore") {
    // `changes` flavor: keep when different from previous (acc = last seen)
    val (kept, acc) = ListOps.filterAcc[Int, Option[Int]](
      (_, x) => Some(x), None, (x, a) => !a.contains(x))(List(1, 1, 2, 2, 2, 3, 1))
    assert(kept == List(1, 2, 3, 1))
    assert(acc.contains(1))
  }

  test("filterAcc agrees with the interpreter's untyped version") {
    val xs = List(5, 1, 4, 4, 9, 2, 9)
    val typed = ListOps.filterAcc[Int, Int](_ + _, 0, (x, a) => x > a)(xs)
    val untyped = graft.plans.Interpreter.filterAccList(
      (a, x) => (a.asInstanceOf[Int] + x.asInstanceOf[Int]): Any,
      0: Any,
      (x, a) => x.asInstanceOf[Int] > a.asInstanceOf[Int],
      xs.map(x => x: Any))
    // the interpreter's version returns kept elements in REVERSE order
    assert(typed._1.map(x => x: Any) == untyped._1.reverse)
    assert((typed._2: Any) == untyped._2)
  }

  test("filterAcc matches the sample-every-n countdown pattern") {
    // reference `sample n`: keep when countdown hits 0
    val (kept, _) = ListOps.filterAcc[Int, Int](
      (a, _) => if (a == 0) 2 else a - 1, 0, (_, a) => a == 0)((1 to 10).toList)
    assert(kept == List(1, 4, 7, 10))
  }
}
