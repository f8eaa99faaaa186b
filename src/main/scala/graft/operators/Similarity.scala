package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Similarity search over the `embeddings` table (Array[Float], 64-dim).
  *
  * q40 is the exact brute-force baseline: broadcast the (small) query set,
  * stream the corpus once, top-k per query via a window. At cluster scale
  * the corpus side stays partitioned; only queries move.
  *
  * q41 is the scale path: sign-LSH bucketing (random-hyperplane family
  * degenerates to coordinate signs for axis-aligned planes) — candidate
  * generation is an equi-join on the bucket key, so it shuffles once on
  * the key instead of cross-joining.
  *
  * Determinism: vectors are cast to double element-wise; dot products and
  * norms are sequential left folds, which DuckDB's list_sum reproduces
  * bit-for-bit (validated against a Python left fold), so cosine values
  * hash-match exactly.
  */
object Similarity {

  /** embeddings with double-cast vector and precomputed L2 norm. */
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm",
        sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  val defs: Seq[QueryDef] = Seq(

    // ---- brute-force cosine top-5 for query vectors (vec_id < 8)
    QueryDef(
      "q40_cosine_topk",
      (s, dir) => {
        val e = emb(s, dir)
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
        val n = e.select(col("vec_id").as("n_id"), col("v").as("nv"), col("nrm").as("nn"))
        val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
        broadcast(q).crossJoin(n)
          .filter(col("q_id") =!= col("n_id"))
          .withColumn("cos", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select("q_id", "rank", "n_id", "cos")
          .orderBy("q_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |n AS (SELECT vec_id, v,
             |        sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e),
             |p AS (SELECT q.vec_id AS q_id, t.vec_id AS n_id,
             |        list_sum(list_transform(generate_series(1, 64),
             |          i -> q.v[i] * t.v[i])) / (q.nrm * t.nrm) AS cos
             |      FROM n q JOIN n t ON q.vec_id < 8 AND q.vec_id <> t.vec_id)
             |SELECT q_id, rank, n_id, cos FROM (
             |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
             |  FROM p) t
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // ---- sign-LSH bucketed ANN: equi-join on 12-bit sign bucket, top-3
    QueryDef(
      "q41_ann_bucketed",
      (s, dir) => {
        val bucket = array_join(
          transform(sequence(lit(1), lit(12), lit(1)),
            i => when(element_at(col("v"), i) >= 0, "1").otherwise("0")), "")
        val e = emb(s, dir).withColumn("bucket", bucket)
        val q = e.filter(col("vec_id") < 32)
          .select(col("vec_id").as("q_id"), col("v").as("qv"),
            col("nrm").as("qn"), col("bucket").as("qb"))
        val n = e.select(col("vec_id").as("n_id"), col("v").as("nv"),
          col("nrm").as("nn"), col("bucket").as("nb"))
        val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
        q.join(n, col("qb") === col("nb") && col("q_id") =!= col("n_id"))
          .withColumn("cos", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select("q_id", "rank", "n_id", "cos")
          .orderBy("q_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |n AS (SELECT vec_id, v,
             |        sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm,
             |        array_to_string(list_transform(generate_series(1, 12),
             |          i -> CASE WHEN v[i] >= 0 THEN '1' ELSE '0' END), '') AS bucket
             |      FROM e),
             |p AS (SELECT q.vec_id AS q_id, t.vec_id AS n_id,
             |        list_sum(list_transform(generate_series(1, 64),
             |          i -> q.v[i] * t.v[i])) / (q.nrm * t.nrm) AS cos
             |      FROM n q JOIN n t
             |        ON q.bucket = t.bucket AND q.vec_id < 32 AND q.vec_id <> t.vec_id)
             |SELECT q_id, rank, n_id, cos FROM (
             |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
             |  FROM p) t
             |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin))
  )
}
