package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declarative data-quality expectations — the validation gate an
  * ingest pipeline runs before publishing a snapshot. An expectation
  * is a named per-row predicate; `audit` evaluates ALL of a table's
  * expectations in ONE scan (each becomes a conditional-sum aggregate,
  * map-side combined — no per-check jobs, no shuffle beyond one
  * aggregation row), and referential checks are anti-join counts.
  */
object Quality {

  /** A named row-level expectation: `ok` must hold for every row. */
  case class Expectation(name: String, ok: Column)

  /** One row per expectation: violations, row count, pass flag. */
  def audit(table: String, df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, s"audit($table): expectations must be non-empty")
    // a NULL predicate result is a violation (NOT NULL is implied by
    // every expectation, as in SQL CHECK + NOT NULL pairs)
    val aggs = count(lit(1)).as("n_rows") +:
      expectations.map(e => sum(when(coalesce(e.ok, lit(false)), 0L).otherwise(1L)).as(e.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the one aggregate row by exploding (check, violations)
    // structs — one result row per expectation with the aggregate
    // subtree appearing ONCE in the plan (a per-expectation
    // select+union would rely on exchange reuse for its one-scan
    // property)
    val pairs = expectations.map(e =>
      struct(lit(e.name).as("check"), col(e.name).as("n_violations")))
    one.select(col("n_rows"), explode(array(pairs: _*)).as("p"))
      .select(lit(table).as("tbl"), col("p.check"), col("p.n_violations"),
        col("n_rows"), (col("p.n_violations") === 0).as("pass"))
  }

  /** Referential check: rows of `child` whose `fk` has no match in
    * `parent(pk)` (null FKs are violations too, like a NOT NULL +
    * FOREIGN KEY pair).
    */
  def referential(table: String, check: String, child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("n_rows"))
    val orphans = child.join(parent.select(col(pk)), col(fk) === col(pk), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    orphans.crossJoin(total) // two 1-row aggregates
      .select(lit(table).as("tbl"), lit(check).as("check"),
        col("n_violations"), col("n_rows"), (col("n_violations") === 0).as("pass"))
  }

  /** q26: the audit suite over the star schema — range, nullability,
    * domain and referential expectations, one result row per check.
    * At 100 TB this is one scan per table plus one anti-join per FK;
    * checks never multiply scans.
    */
  def dqAudit(s: SparkSession, dir: String): DataFrame = {
    val li = audit("lineitem", Tables.lineitem(s, dir), Seq(
      Expectation("quantity_range", col("l_quantity").between(1, 50)),
      Expectation("price_positive", col("l_extendedprice") > 0),
      Expectation("discount_domain", col("l_discount").between(0.0, 0.1)),
      Expectation("shipdate_not_null", col("l_shipdate").isNotNull)))
    val ord = audit("orders", Tables.orders(s, dir), Seq(
      Expectation("totalprice_positive", col("o_totalprice") > 0),
      Expectation("priority_domain", col("o_orderpriority").isin(
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))))
    val fk1 = referential("orders", "custkey_fk",
      Tables.orders(s, dir), "o_custkey", Tables.customer(s, dir), "c_custkey")
    val fk2 = referential("customer", "nationkey_fk",
      Tables.customer(s, dir), "c_nationkey", Tables.nation(s, dir), "n_nationkey")
    li.unionByName(ord).unionByName(fk1).unionByName(fk2)
      .orderBy(col("tbl"), col("check"))
  }
}
