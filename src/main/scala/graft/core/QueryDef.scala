package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query surfaced through [[graft.SparkEntry]].
  *
  * @param name   stable key (drives the driver's CORRECTNESS/BENCH reports)
  * @param fn     (session, scale-factor dir) => result DataFrame. Results must
  *               be fully deterministic: explicit ORDER BY, no raw timestamp
  *               output (formatted as strings), no order-sensitive double
  *               aggregation (money is summed as integer cents).
  * @param oracle equivalent DuckDB SQL over the same parquet tables, column
  *               names aliased identically; None => driver does rows-only check
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
