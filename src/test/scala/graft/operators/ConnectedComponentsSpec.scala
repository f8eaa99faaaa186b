package graft.operators

import graft.SparkSpec

/** Operating envelope of the two connected-components variants:
  * min-label propagation (q39's path — rounds = component diameter, the
  * right trade for dense dup clusters) and the alternating
  * large-star/small-star algorithm (O(log² n) rounds — the opt-in for
  * adversarial long-chain graphs, where propagation fails LOUDLY instead
  * of returning half-propagated labels).
  */
class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("d1", "d2")

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.as[(Long, Long)].collect().toMap

  test("star variant agrees with min-label propagation on a mixed graph") {
    // three components: a triangle {1,2,3}, a path {10,11,12,13}, a pair
    // {20,21}; edge directions deliberately mixed
    val e = edges((2L, 1L), (2L, 3L), (1L, 3L),
      (11L, 10L), (11L, 12L), (13L, 12L),
      (21L, 20L))
    val prop = labelsOf(Dedup.connectedComponents(e))
    val star = labelsOf(Dedup.connectedComponentsStar(e))
    assert(star == prop)
    assert(star == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("propagation fails loudly past its diameter envelope; star converges") {
    // a 30-node chain has diameter 29 > the default maxIter=20: the
    // propagation must REFUSE (half-propagated labels silently splitting
    // one cluster into two would be a correctness bug), and the
    // large-star/small-star variant must solve the same graph in its
    // O(log²) budget
    val chain = edges((0L until 29L).map(i => (i, i + 1)): _*)
    val e = intercept[IllegalArgumentException](
      Dedup.connectedComponents(chain).collect())
    assert(e.getMessage.contains("did not converge"))

    val star = labelsOf(Dedup.connectedComponentsStar(chain))
    assert(star == (0L to 29L).map(_ -> 0L).toMap)
  }

  test("star variant handles the empty graph and isolated pairs") {
    assert(Dedup.connectedComponentsStar(edges()).isEmpty)
    val pairs = edges((5L, 4L), (7L, 6L))
    assert(labelsOf(Dedup.connectedComponentsStar(pairs)) ==
      Map(4L -> 4L, 5L -> 4L, 6L -> 6L, 7L -> 6L))
  }
}
