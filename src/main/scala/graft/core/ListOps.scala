package graft.core

/** Plain-list counterparts of the stream operators — reference
  * `FunctionalProcessing.hs:219-222` (`filterAcc`), the helper the rewrite
  * rules use to fuse a FilterAcc into a Scan over window contents. */
object ListOps {

  /** Filter with accumulator over a finite list: the accumulator updates on
    * EVERY element, an element is kept iff `p(x, accBefore)`; returns the
    * kept elements and the final accumulator. */
  def filterAcc[A, B](accfn: (B, A) => B, init: B, p: (A, B) => Boolean)(
      xs: List[A]): (List[A], B) = {
    var acc = init
    val kept = List.newBuilder[A]
    xs.foreach { x =>
      if (p(x, acc)) kept += x
      acc = accfn(acc, x)
    }
    (kept.result(), acc)
  }
}
