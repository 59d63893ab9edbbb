package graft.operators

import scala.util.Random

import graft.SparkSpecBase

/** The adaptive connected-components router: the driver union-find
  * (small graphs), the distributed star contraction (the default
  * large-graph leg) and the min-label fixpoint (the reference
  * implementation it replaced) must be byte-identical — label = min
  * doc_id of the component — on random graphs spanning singleton
  * edges, chains, cliques and forests.
  */
class ComponentsSpec extends SparkSpecBase {

  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)],
      localLimit: Long): Map[Long, Long] = {
    val df = pairs.toDF("a_id", "b_id")
    TextOps.components(df, localEdgeLimit = localLimit)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def fixpointOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    TextOps.componentsFixpoint(pairs.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("local, star-contraction and fixpoint agree on seeded random " +
    "graphs") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val nNodes = 30 + rnd.nextInt(40)
      val nEdges = 10 + rnd.nextInt(60)
      val pairs = Seq.fill(nEdges) {
        val a = rnd.nextInt(nNodes).toLong
        val b = rnd.nextInt(nNodes).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val local = labelsOf(pairs, localLimit = Long.MaxValue)
      val star = labelsOf(pairs, localLimit = -1)
      val fix = fixpointOf(pairs)
      assert(local === star, s"trial $trial: $pairs")
      assert(fix === star, s"trial $trial: $pairs")
      // labels really are component minima: every label is ≤ its node
      // and is itself labeled by itself
      local.foreach { case (n, l) =>
        assert(l <= n && local(l) === l, s"trial $trial node $n label $l")
      }
    }
  }

  test("chain collapses to one min label on all three paths") {
    val chain = (0L until 20L).sliding(2).map(s => (s(0), s(1))).toSeq
    for (limit <- Seq(Long.MaxValue, -1L)) {
      val m = labelsOf(chain, limit)
      assert(m.values.toSet === Set(0L), s"limit $limit: $m")
      assert(m.size === 20)
    }
    val fix = fixpointOf(chain)
    assert(fix.values.toSet === Set(0L) && fix.size === 20)
    // the contraction's point: a diameter-19 chain converges in far
    // fewer rounds than the fixpoint's 19 label-propagation hops
    assert(TextOps.lastStarRounds.get < TextOps.lastFixpointRounds.get,
      s"star ${TextOps.lastStarRounds.get} rounds vs fixpoint " +
        s"${TextOps.lastFixpointRounds.get}")
  }

  test("limit = Long.MaxValue really routes LOCAL (the overflow " +
    "regression: 2 * MaxValue went negative and forced the " +
    "distributed leg)") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    TextOps.lastStarRounds.set(-7) // sentinel: only the STAR leg resets it
    TextOps.components(pairs, localEdgeLimit = Long.MaxValue).count()
    assert(TextOps.lastStarRounds.get == -7,
      "force-local limit ran the distributed leg")
    TextOps.components(pairs, localEdgeLimit = -1L).count()
    assert(TextOps.lastStarRounds.get > 0)
  }
}
