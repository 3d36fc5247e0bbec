package graft.plans

/** Jackson open-queueing-network cost model (reference
  * `src/Striot/Jackson.hs`): solve λ = (I − Pᵀ)⁻¹·a for per-operator
  * arrival rates, then utilisation ρ=λ/μ, mean customers ρ/(1−ρ), response
  * time 1/(μ−λ), queue wait. Inputs are derived from the graph: the
  * propagation matrix from edges + filter selectivities
  * (`derivePropagationArray :281-295`), the source arrival distribution
  * (`deriveInputsArray :298-310`), and per-vertex service rates.
  *
  * In the Spark engine this is an advisory/planning module (it has no
  * runtime role): it annotates a StreamGraph with sustainable-throughput
  * information and feeds `Planner.planCost` viability checks — e.g. advising
  * partition counts or trigger sizing before deployment.
  */
object Jackson {

  final case class OperatorInfo(
      opId: Int,
      arrRate: Double,
      svcRate: Double,
      util: Double,
      stab: Boolean,
      custInSys: Double,
      respTime: Double,
      queueTime: Double)

  /** Gauss-Jordan inverse with partial pivoting (tiny dense matrices). */
  def inverse(m: Array[Array[Double]]): Array[Array[Double]] = {
    val n = m.length
    val a = m.map(_.clone())
    val inv = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (col <- 0 until n) {
      var piv = col
      for (r <- col + 1 until n) if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val tmpI = inv(col); inv(col) = inv(piv); inv(piv) = tmpI
      val d = a(col)(col)
      require(math.abs(d) > 1e-12, "singular propagation matrix")
      for (j <- 0 until n) { a(col)(j) /= d; inv(col)(j) /= d }
      for (r <- 0 until n if r != col) {
        val factor = a(r)(col)
        if (factor != 0.0)
          for (j <- 0 until n) { a(r)(j) -= factor * a(col)(j); inv(r)(j) -= factor * inv(col)(j) }
      }
    }
    inv
  }

  /** λ = (I − Pᵀ)⁻¹ · (α·p0) (reference `arrivalRate :104-111`). */
  def arrivalRates(p: Array[Array[Double]], p0: Array[Double], alpha: Double): Array[Double] = {
    val n = p.length
    val iMinusPt = Array.tabulate(n, n)((i, j) => (if (i == j) 1.0 else 0.0) - p(j)(i))
    val a = p0.map(_ * alpha)
    val inv = inverse(iMinusPt)
    Array.tabulate(n)(i => (0 until n).map(j => inv(i)(j) * a(j)).sum)
  }

  /** Propagation matrix from graph edges and filter/filterAcc selectivities
    * (reference `derivePropagationArray`): P(i)(j) = fraction of i's output
    * events reaching j. */
  def propagationMatrix(g: StreamGraph): (Array[Array[Double]], Vector[Int]) = {
    val ids = g.vertexList.map(_.id)
    val idx = ids.zipWithIndex.toMap
    val p = Array.ofDim[Double](ids.length, ids.length)
    for ((a, b) <- g.edges) {
      val sel = g.byId(a).op match {
        case OpFilter(s)    => s
        case OpFilterAcc(s) => s
        case _              => 1.0
      }
      p(idx(a))(idx(b)) = sel
    }
    (p, ids)
  }

  def totalArrivalRate(g: StreamGraph): Double =
    g.vertices.collect { case StreamVertex(_, OpSource(r), _, _, _, _) => r }.sum

  /** Full per-operator report (reference `calcAllSg :327-341`). */
  def calcAll(g: StreamGraph): List[OperatorInfo] = {
    val (p, ids) = propagationMatrix(g)
    val total = totalArrivalRate(g)
    val p0 = ids.map(id => g.byId(id).op match {
      case OpSource(r) => if (total == 0) 0.0 else r / total
      case _           => 0.0
    }).toArray
    val mu = ids.map(id => g.byId(id).serviceRate).toArray
    val lambda = arrivalRates(p, p0, total)
    ids.indices.map { i =>
      val util = if (mu(i) == 0) 0.0 else lambda(i) / mu(i)
      OperatorInfo(
        opId = ids(i),
        arrRate = lambda(i),
        svcRate = mu(i),
        util = util,
        // mirrors the reference verbatim (`Jackson.hs:140`: `util < 1/0`) —
        // trivially true for any finite util; over-utilization is judged by
        // `isOverUtilised` (util > 1), NOT this flag
        stab = util < Double.PositiveInfinity,
        custInSys = util / (1.0 - util),
        respTime = 1.0 / (mu(i) - lambda(i)),
        // mirrors the reference formula verbatim (`avgeTimeInQueue :144-149`)
        queueTime = util / ((1.0 / mu(i)) - lambda(i)))
    }.toList
  }

  /** At least one operator receives events faster than it can serve
    * (reference `isOverUtilised :346-347`). */
  def isOverUtilised(ois: List[OperatorInfo]): Boolean = ois.exists(_.util > 1)

  /** Mean output rate of an operator (reference `outputRate :360-379`):
    * filters attenuate by selectivity; a Join's output rate is its slowest
    * input's. */
  def outputRate(g: StreamGraph, id: Int): Double = {
    val arr = calcAll(g).find(_.opId == id).map(_.arrRate).getOrElse(0.0)
    g.byId(id).op match {
      case OpFilter(sel)    => arr * sel
      case OpFilterAcc(sel) => arr * sel
      case OpJoin           => g.predecessors(id).map(outputRate(g, _)).min
      case _                => arr
    }
  }
}
