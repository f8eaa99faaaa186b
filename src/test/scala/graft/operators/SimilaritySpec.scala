package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVF recall characteristics: the operator's recall claim is about
  * CLUSTERED corpora (real embedding spaces), so the recall gate runs on
  * a deterministic 16-cluster synthetic corpus — not the uniform-random
  * `embeddings` table, where any partition-based ANN's recall provably
  * tracks the scanned fraction.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 32
  private val nClusters = 16
  private val perCluster = 40

  // deterministic clustered corpus: 16 well-separated unit centers
  // (one-hot pairs), members = center + small seeded perturbation
  private lazy val corpus: DataFrame = {
    val rng = new scala.util.Random(42)
    val centers = (0 until nClusters).map { c =>
      val v = Array.fill(dim)(0.0)
      v(2 * (c % (dim / 2))) = 1.0
      v((2 * (c % (dim / 2)) + 7) % dim) = if (c < dim / 2) 0.5 else -0.5
      v
    }
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield {
      val noise = Array.fill(dim)((rng.nextDouble() - 0.5) * 0.08)
      val v = centers(c).zip(noise).map { case (a, b) => a + b }
      (c.toLong * perCluster + i, v.toSeq)
    }
    rows.toDF("vec_id", "v0")
      .select(col("vec_id"), col("v0").as("v"))
      .withColumn("nrm", sqrt(aggregate(
        transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))
  }

  private def queries(df: DataFrame): DataFrame =
    df.filter(col("vec_id") % perCluster === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))

  // centroid seeds: one member per cluster (not the query row)
  private def centroids(df: DataFrame): DataFrame =
    df.filter(col("vec_id") % perCluster === 1)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))

  private def topkSet(df: DataFrame): Set[(Long, Long)] =
    df.select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exact: Set[(Long, Long)] = {
    val q = queries(corpus)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    topkSet(broadcast(q).crossJoin(
        corpus.select(col("vec_id").as("n_id"), col("v").as("nv"), col("nrm").as("nn")))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", aggregate(zip_with(col("qv"), col("nv"),
        (x, y) => x * y), lit(0.0), (a, x) => a + x) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5))
  }

  test("IVF recall >= 0.9 on clustered data at nprobe=2 of 16") {
    val ann = topkSet(Similarity.ivfTopK(
      corpus, queries(corpus), centroids(corpus), nprobe = 2, k = 5))
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("IVF recall is exactly 1.0 when probing every cell") {
    val ann = topkSet(Similarity.ivfTopK(
      corpus, queries(corpus), centroids(corpus), nprobe = nClusters, k = 5))
    assert(exact.subsetOf(ann) && ann == exact)
  }

  test("KMeans-trained centroids discover the clusters: recall >= 0.9 at nprobe=2") {
    // no cluster labels leak in: the trainer sees only the vectors, yet
    // its cells must recover the same locality the seeded centroids get
    val trained = Similarity.trainCentroids(corpus, k = nClusters, seed = 7L)
    assert(trained.count() == nClusters)
    val ann = topkSet(Similarity.ivfTopK(
      corpus, queries(corpus), trained, nprobe = 2, k = 5))
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.9, s"trained-centroid recall $recall")
  }
}
