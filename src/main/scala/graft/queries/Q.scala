package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle.
  * Oracle-less queries get the driver's rows-only check and a
  * ScalaTest spec pinning expected values instead.
  */
case class Q(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  // guard against object-initialization-order nulls sneaking into
  // the driver's oracle_sql.json (fail at class load, not mid-dump)
  require(oracle.forall(_ != null), s"null oracle SQL for query $name")
}

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
