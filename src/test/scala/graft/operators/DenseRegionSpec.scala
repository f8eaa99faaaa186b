package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The clustering estate's value-skew adversary: a DEGENERATE corpus
  * whose vectors all sit in ONE tight cluster. Hash-cell curves
  * (q104_semdedup_knob) are immune to value skew by construction
  * (cells key on vec_id), so this spec pins the LEARNED-cells
  * mechanism instead: Lloyd seeded with K distinct vectors still
  * PARTITIONS the dense region (the update step separates the seeds'
  * Voronoi cells inside the cluster), so SemDeDup's within-cell pair
  * join stays confined — the single-cell N² blowup a naive
  * "all-similar vectors share a cell" assignment would produce does
  * not happen. Complements the cells-∝-corpus knob: the knob bounds
  * cell size as the corpus grows, Lloyd bounds it when the VALUES
  * collapse.
  */
class DenseRegionSpec extends SparkSpec {

  test("Lloyd partitions a degenerate one-cluster corpus; pairs confined") {
    // 2000 vectors in one tight cluster: base 1e6 per dim, small
    // DETERMINISTIC per-dim jitter (no RNG — reproducible everywhere);
    // jitter span 997 ≪ base, so every pair is cosine-similar ≈ 1
    val n = 2000L
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(1, 64), " +
        "j -> cast(1000000 + ((id * 31 + j * 17) % 997) as long))").as("qv"))
    val sizes = Clustering.lloyd(vecs, 8, 2)
      .groupBy("cid").count().collect()
      .map(r => r.getLong(1))
    assert(sizes.length == 8,
      s"Lloyd must split the dense region into all 8 cells, got ${sizes.length}")
    // no cell may swallow the corpus: the within-cell pair sum must be
    // far below the single-cell N² (the blowup this mechanism bounds);
    // Σ cᵢ² is minimized at N²/K = 12.5% — allow imbalance headroom
    val pairRatio = sizes.map(c => c.toDouble * c).sum / (n.toDouble * n)
    assert(pairRatio <= 0.5,
      f"within-cell pair mass $pairRatio%.3f of N² — a dominant cell " +
        "defeats the within-cell confinement")
  }
}
