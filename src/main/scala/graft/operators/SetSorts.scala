package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.6 sorts / limits / top-k / set operations (SURVEY.md).
  *
  * Scale notes: global top-k compiles to TakeOrderedAndProject (per-
  * partition heap + driver merge of k rows — never a full sort at 100 TB);
  * set ops are shuffles on the full row, same cost class as groupBy.
  */
object SetSorts extends graft.QueryModule {

  /** Multi-key sort with explicit null placement (defaults differ:
    * Spark asc = NULLS FIRST, DuckDB asc = NULLS LAST — state it). */
  def sortMulti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"),
        col("c_acctbal"))
      .orderBy(col("seg_or_null").asc_nulls_first,
        col("c_acctbal").desc, col("c_custkey").asc)

  /** Global top-100 by price (unique tie-break). */
  def limitTopk(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(100)

  private def slice(s: SparkSession, dir: String, lo: String, hi: String) =
    Tables.orders(s, dir)
      .where(col("o_orderdate") >= to_timestamp(lit(lo)) &&
        col("o_orderdate") < to_timestamp(lit(hi)))
      .select("o_orderkey", "o_custkey", "o_orderpriority")

  /** UNION ALL of two overlapping monthly slices (Feb duplicated). */
  def setUnionAll(s: SparkSession, dir: String): DataFrame =
    slice(s, dir, "1995-01-01", "1995-03-01")
      .unionByName(slice(s, dir, "1995-02-01", "1995-04-01"))
      .orderBy("o_orderkey")

  /** UNION DISTINCT of the same slices. */
  def setUnionDistinct(s: SparkSession, dir: String): DataFrame =
    slice(s, dir, "1995-01-01", "1995-03-01")
      .unionByName(slice(s, dir, "1995-02-01", "1995-04-01"))
      .distinct()
      .orderBy("o_orderkey")

  private def richCust(s: SparkSession, dir: String) =
    Tables.customer(s, dir).where(col("c_acctbal") > 5000).select("c_custkey")
  private def bldgCust(s: SparkSession, dir: String) =
    Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")

  /** Set intersection (distinct semantics in both engines). */
  def setIntersect(s: SparkSession, dir: String): DataFrame =
    richCust(s, dir).intersect(bldgCust(s, dir)).orderBy("c_custkey")

  /** Set difference (distinct semantics). */
  def setExcept(s: SparkSession, dir: String): DataFrame =
    richCust(s, dir).except(bldgCust(s, dir)).orderBy("c_custkey")

  private def prioSliceA(s: SparkSession, dir: String) =
    slice(s, dir, "1995-01-01", "1995-03-01").select("o_orderpriority")
  private def prioSliceB(s: SparkSession, dir: String) =
    slice(s, dir, "1995-02-01", "1995-04-01").select("o_orderpriority")

  /** Bag (multiset) intersection — keeps min multiplicity. */
  def setIntersectAll(s: SparkSession, dir: String): DataFrame =
    prioSliceA(s, dir).intersectAll(prioSliceB(s, dir))
      .orderBy("o_orderpriority")

  /** Bag difference — multiplicity-aware. */
  def setExceptAll(s: SparkSession, dir: String): DataFrame =
    prioSliceA(s, dir).exceptAll(prioSliceB(s, dir))
      .orderBy("o_orderpriority")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sort_multi" -> sortMulti,
    "q_limit_topk" -> limitTopk,
    "q_set_union_all" -> setUnionAll,
    "q_set_union_distinct" -> setUnionDistinct,
    "q_set_intersect" -> setIntersect,
    "q_set_except" -> setExcept,
    "q_set_intersect_all" -> setIntersectAll,
    "q_set_except_all" -> setExceptAll)

  def oracleSql: Map[String, String] = Map(
    "q_sort_multi" ->
      """SELECT c_custkey, NULLIF(c_mktsegment,'BUILDING') AS seg_or_null, c_acctbal
        |FROM customer
        |ORDER BY seg_or_null ASC NULLS FIRST, c_acctbal DESC, c_custkey ASC""".stripMargin,
    "q_limit_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 100""".stripMargin,
    "q_set_union_all" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-03-01'
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-02-01' AND o_orderdate < TIMESTAMP '1995-04-01'
        |ORDER BY o_orderkey""".stripMargin,
    "q_set_union_distinct" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-03-01'
        |UNION
        |SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-02-01' AND o_orderdate < TIMESTAMP '1995-04-01'
        |ORDER BY o_orderkey""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,
    "q_set_except" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,
    "q_set_intersect_all" ->
      """SELECT o_orderpriority FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-03-01'
        |INTERSECT ALL
        |SELECT o_orderpriority FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-02-01' AND o_orderdate < TIMESTAMP '1995-04-01'
        |ORDER BY o_orderpriority""".stripMargin,
    "q_set_except_all" ->
      """SELECT o_orderpriority FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-03-01'
        |EXCEPT ALL
        |SELECT o_orderpriority FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-02-01' AND o_orderdate < TIMESTAMP '1995-04-01'
        |ORDER BY o_orderpriority""".stripMargin)
}
