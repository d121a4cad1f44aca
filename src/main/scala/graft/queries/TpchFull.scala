package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** The remaining TPC-H query shapes (SURVEY §2.3), adapted to the harness
  * schema (no partsupp / commitdate / shipmode / phone columns — each
  * adaptation keeps the ORIGINAL plan shape: the scan filters, the join
  * graph, the correlation structure, and the output contract).
  *
  * Determinism contract (same as [[Analytics]]): money per-row → integer
  * cents before any sum; ratios via integer `DIV` basis points; every
  * result explicitly ordered. Scale posture: dimension sides broadcast
  * (`nation`/`region`/`part`/`supplier`/`customer` are O(SF) rows vs the
  * O(SF)·4000× fact table), fact-fact joins shuffle on the join key only,
  * and every scan filter is a pushable conjunct (`PushedFilters`).
  */
object TpchFull extends QueryModule {

  /** floor(x*100) as bigint — exact cents, order-independent sums. */
  private def cents(c: Column): Column = floor(c * 100).cast("long")

  private def revC: Column = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))

  private def ts(s: String): Column = lit(s).cast("timestamp")

  /** Q6: forecast-revenue-change — one scan, every predicate pushed, a
    * single global agg (partial-agg collapses each partition to 1 row). */
  def q6Forecast(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01")
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(cents(col("l_extendedprice") * col("l_discount"))).as("revenue_c"),
        count(lit(1)).as("n_items"))

  val q6ForecastSql: String = """
    SELECT CAST(sum(CAST(floor(l_extendedprice*l_discount*100) AS bigint)) AS bigint) AS revenue_c,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
      AND l_quantity < 24"""

  /** Q7: volume shipping between two trading blocs, by year (adapted to
    * region-level pairs: a fixed nation pair is empty at tiny SF where
    * only 10 supplier nations exist). The nation→region dim chain is
    * joined TWICE (customer side + supplier side) — both broadcast; the
    * only shuffle is lineitem⋈orders on orderkey. The pair filter is
    * applied INSIDE each broadcast side, so non-qualifying fact rows drop
    * at the join instead of widening it. */
  def q7Volume(spark: SparkSession, sfDir: String): DataFrame = {
    val natR = Tables.nation(spark, sfDir)
      .join(broadcast(Tables.region(spark, sfDir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name").isin("EUROPE", "ASIA"))
      .select(col("n_nationkey"), col("r_name"))
    val custN = Tables.customer(spark, sfDir)
      .join(broadcast(natR), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("r_name").as("cust_region"))
    val suppN = Tables.supplier(spark, sfDir)
      .join(broadcast(natR), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("r_name").as("supp_region"))
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1999-01-01"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custN), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .filter(col("supp_region") =!= col("cust_region"))
      .groupBy(col("supp_region"), col("cust_region"), year(col("l_shipdate")).as("l_year"))
      .agg(sum(revC).as("revenue_c"))
      .orderBy(col("supp_region"), col("cust_region"), col("l_year"))
  }

  val q7VolumeSql: String = """
    SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS int) AS l_year,
           CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS bigint)) AS bigint) AS revenue_c
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region cr ON cn.n_regionkey = cr.r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN region sr ON sn.n_regionkey = sr.r_regionkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
      AND sr.r_name IN ('EUROPE','ASIA') AND cr.r_name IN ('EUROPE','ASIA')
      AND sr.r_name <> cr.r_name
    GROUP BY 1,2,3 ORDER BY 1,2,3"""

  /** Q9: product-type profit by supplier nation and order year (adapted:
    * profit = discounted revenue; no supplycost column). part is filtered
    * by the LIKE at the scan then broadcast, so the 5-way join does one
    * fact shuffle (orderkey). */
  def q9Profit(spark: SparkSession, sfDir: String): DataFrame = {
    val prt = Tables.part(spark, sfDir).filter(col("p_name").contains("widget"))
      .select(col("p_partkey"))
    val suppN = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(revC).as("profit_c"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9ProfitSql: String = """
    SELECT n_name AS nation, CAST(EXTRACT(YEAR FROM o_orderdate) AS int) AS o_year,
           CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS bigint)) AS bigint) AS profit_c
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1,2 ORDER BY nation, o_year DESC"""

  /** Q11: important parts — parts whose traded value exceeds 1.2× the mean
    * per-part share (adapted from the fixed-fraction HAVING, which is not
    * scale-invariant on this data). The grand total and part count attach
    * as a 1-row broadcast scalar; all comparisons in decimal-widened
    * integer cents so both engines agree bit-for-bit. */
  def q11ImportantParts(spark: SparkSession, sfDir: String): DataFrame = {
    val pv = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice"))).as("value_c"))
    val tot = pv.agg(sum(col("value_c")).as("total_c"), count(lit(1)).as("n_parts"))
    pv.crossJoin(broadcast(tot))
      .filter(expr("CAST(value_c AS decimal(38,0)) * n_parts * 10 > CAST(total_c AS decimal(38,0)) * 12"))
      .select(col("l_partkey"), col("value_c"))
      .orderBy(col("value_c").desc, col("l_partkey"))
      .limit(100)
  }

  val q11ImportantPartsSql: String = """
    WITH pv AS (
      SELECT l_partkey, sum(CAST(floor(l_extendedprice*100) AS bigint)) AS value_c
      FROM lineitem GROUP BY 1)
    SELECT l_partkey, CAST(value_c AS bigint) AS value_c
    FROM pv
    WHERE CAST(value_c AS HUGEINT) * (SELECT count(*) FROM pv) * 10
          > (SELECT sum(value_c) FROM pv) * 12
    ORDER BY value_c DESC, l_partkey LIMIT 100"""

  /** Q12: shipping-speed vs order priority (adapted: the missing shipmode
    * column becomes a ship-delay bucket). One fact-fact shuffle on
    * orderkey; the CASE is codegen'd, the date filter pushed. */
  def q12LateLines(spark: SparkSession, sfDir: String): DataFrame = {
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    val delay = datediff(col("l_shipdate"), col("o_orderdate"))
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(
        when(delay <= 90, "FAST").when(delay <= 730, "MEDIUM").otherwise("SLOW").as("ship_bucket"),
        when(isHigh, 1L).otherwise(0L).as("hi"),
        when(isHigh, 0L).otherwise(1L).as("lo"))
      .groupBy(col("ship_bucket"))
      .agg(sum(col("hi")).as("high_line_count"), sum(col("lo")).as("low_line_count"))
      .orderBy(col("ship_bucket"))
  }

  val q12LateLinesSql: String = """
    SELECT CASE WHEN datediff('day', CAST(o_orderdate AS date), CAST(l_shipdate AS date)) <= 90 THEN 'FAST'
                WHEN datediff('day', CAST(o_orderdate AS date), CAST(l_shipdate AS date)) <= 730 THEN 'MEDIUM'
                ELSE 'SLOW' END AS ship_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS bigint) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS bigint) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1 ORDER BY 1"""

  /** Q13: customer order-count distribution — LEFT join (zero-order
    * customers must appear) with the priority filter INSIDE the join
    * condition, then a double aggregation. The second groupBy runs over
    * |customers| rows, already tiny after the first. */
  def q13OrderDist(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir).filter(col("o_orderpriority") =!= "5-LOW")
    Tables.customer(spark, sfDir)
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13OrderDistSql: String = """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""

  /** Q14: promo revenue share for one month — conditional agg over a
    * broadcast part join; the share is integer basis points (decimal
    * DIV), never a float ratio. */
  def q14PromoShare(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1997-09-01") && col("l_shipdate") < ts("1997-10-01"))
      .join(broadcast(Tables.part(spark, sfDir).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(sum(when(col("p_type") === "PROMO", revC).otherwise(0L)).as("promo_c"),
        sum(revC).as("total_c"))
      .select(col("promo_c"), col("total_c"),
        expr("CASE WHEN total_c = 0 THEN 0L ELSE CAST(CAST(promo_c AS decimal(38,0)) * 10000 div total_c AS bigint) END")
          .as("promo_bp"))

  val q14PromoShareSql: String = """
    WITH agg AS (
      SELECT sum(CASE WHEN p_type = 'PROMO' THEN CAST(floor(l_extendedprice*(1-l_discount)*100) AS bigint) ELSE 0 END) AS promo_c,
             sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS bigint)) AS total_c
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00')
    SELECT CAST(promo_c AS bigint) AS promo_c, CAST(total_c AS bigint) AS total_c,
           CAST(CASE WHEN total_c = 0 THEN 0 ELSE CAST(promo_c AS HUGEINT) * 10000 // total_c END AS bigint) AS promo_bp
    FROM agg"""

  /** Q15: top supplier(s) by quarterly revenue — the per-supplier agg is
    * computed ONCE and the max attaches as a 1-row broadcast (the original
    * view + scalar-subquery shape, without recomputing the view). */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revC).as("total_rev_c"))
    val mx = rev.agg(max(col("total_rev_c")).as("max_rev_c"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_rev_c") === col("max_rev_c"))
      .join(broadcast(Tables.supplier(spark, sfDir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev_c"))
      .orderBy(col("s_suppkey"))
  }

  val q15TopSupplierSql: String = """
    WITH rev AS (
      SELECT l_suppkey, sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS bigint)) AS total_rev_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY 1)
    SELECT s_suppkey, s_name, CAST(total_rev_c AS bigint) AS total_rev_c
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_rev_c = (SELECT max(total_rev_c) FROM rev)
    ORDER BY s_suppkey"""

  /** Q16: supplier variety per (brand, type, size) — distinct supplier
    * count with a NOT-IN exclusion (negative-balance suppliers standing in
    * for the missing comment-complaint filter) as a broadcast anti-join. */
  def q16SupplierVariety(spark: SparkSession, sfDir: String): DataFrame = {
    val prt = Tables.part(spark, sfDir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val excl = Tables.supplier(spark, sfDir).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16SupplierVarietySql: String = """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1,5,10,15,20,25,30,35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1,2,3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** Q18: large-volume orders — HAVING on a per-order quantity sum, joined
    * back to orders + customer. Quantities are integral doubles, so the
    * sum is exact and casts losslessly to bigint. */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey").as("bk"))
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
      .filter(col("sum_qty") > 300)
    Tables.orders(spark, sfDir)
      .join(big, col("o_orderkey") === col("bk"))
      .join(broadcast(Tables.customer(spark, sfDir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        cents(col("o_totalprice")).as("total_c"), col("sum_qty"))
      .orderBy(col("total_c").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18LargeOrdersSql: String = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(floor(o_totalprice*100) AS bigint) AS total_c,
           CAST(sum_qty AS bigint) AS sum_qty
    FROM orders
    JOIN (SELECT l_orderkey AS bk, CAST(sum(l_quantity) AS bigint) AS sum_qty
          FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300) big ON o_orderkey = bk
    JOIN customer ON o_custkey = c_custkey
    ORDER BY total_c DESC, o_orderkey LIMIT 100"""

  /** Q19: bracketed discount revenue — the classic OR-of-ANDs predicate
    * over a broadcast part join. Catalyst extracts the common
    * `p_brand IN (…)` conjunct for the scan; the residual ORs stay
    * codegen'd in the join filter. */
  def q19BracketRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) && col("l_quantity").between(1, 11))
          || (col("p_brand") === "Brand#2" && col("p_size").between(1, 15) && col("l_quantity").between(10, 20))
          || (col("p_brand") === "Brand#3" && col("p_size").between(1, 20) && col("l_quantity").between(20, 30)))
      .agg(sum(revC).as("revenue_c"), count(lit(1)).as("n_items"))

  val q19BracketRevenueSql: String = """
    SELECT CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS bigint)) AS bigint) AS revenue_c,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 20 AND 30)"""

  /** Q20: promotion-candidate suppliers — suppliers who moved > 400 units
    * of 'red…' parts in 1997 (adapted: shipped volume stands in for the
    * missing availqty). Filtered parts broadcast; one groupBy on suppkey. */
  def q20PromoSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val red = Tables.part(spark, sfDir).filter(col("p_name").startsWith("red"))
      .select(col("p_partkey"))
    val shipped = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
      .join(broadcast(red), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).cast("long").as("red_qty"))
      .filter(col("red_qty") > 400)
    Tables.supplier(spark, sfDir)
      .join(shipped, col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("red_qty"))
      .orderBy(col("s_name"))
  }

  val q20PromoSuppliersSql: String = """
    SELECT s_suppkey, s_name, CAST(red_qty AS bigint) AS red_qty
    FROM supplier
    JOIN (SELECT l_suppkey, CAST(sum(l_quantity) AS bigint) AS red_qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'red%'
            AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY 1 HAVING sum(l_quantity) > 400) r ON s_suppkey = l_suppkey
    ORDER BY s_name"""

  /** Q21: suppliers who kept orders waiting — for finished multi-supplier
    * orders, charge the UNIQUE late supplier (ship > order + 730 days).
    * The original's EXISTS / NOT-EXISTS pair collapses into one per-order
    * aggregate (distinct suppliers, distinct LATE suppliers) — same
    * semantics, one shuffle instead of two self-joins. */
  def q21WaitingSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val late = (datediff(col("l_shipdate"), col("o_orderdate")) > 730)
    val perOrder = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), late.as("late"))
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"),
        max(when(col("late"), col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
    perOrder
      .groupBy(col("late_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, sfDir)), col("late_supp") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q21WaitingSupplierSql: String = """
    WITH lf AS (
      SELECT l_orderkey, l_suppkey,
             datediff('day', CAST(o_orderdate AS date), CAST(l_shipdate AS date)) > 730 AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'),
    po AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
             max(CASE WHEN late THEN l_suppkey END) AS late_supp
      FROM lf GROUP BY 1)
    SELECT s_name, count(*) AS numwait
    FROM po JOIN supplier ON late_supp = s_suppkey
    WHERE n_supp > 1 AND n_late = 1
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"""

  /** Q22: idle high-balance customers — balance above the positive-balance
    * mean (integer-cents DIV, order-independent), no order since
    * 2000-01-01 (anti-join), grouped by a nationkey-derived country code
    * (the missing phone prefix). The threshold attaches as a 1-row
    * broadcast scalar. */
  def q22IdleCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cc = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), (col("c_nationkey") % 10).cast("int").as("cntry"),
        cents(col("c_acctbal")).as("bal_c"))
      .filter(col("cntry").isin(1, 3, 5, 7, 9))
    val thr = cc.filter(col("bal_c") > 0)
      .agg(sum(col("bal_c")).as("s"), count(lit(1)).as("n"))
      .select(expr("s DIV n").as("thr_c"))
    val recent = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= ts("2000-01-01"))
      .select(col("o_custkey")).distinct()
    cc.crossJoin(broadcast(thr))
      .filter(col("bal_c") > col("thr_c"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntry"))
      .agg(count(lit(1)).as("numcust"), sum(col("bal_c")).as("totacctbal_c"))
      .orderBy(col("cntry"))
  }

  val q22IdleCustomersSql: String = """
    WITH cc AS (
      SELECT c_custkey, CAST(c_nationkey % 10 AS int) AS cntry,
             CAST(floor(c_acctbal*100) AS bigint) AS bal_c
      FROM customer WHERE c_nationkey % 10 IN (1,3,5,7,9)),
    thr AS (
      SELECT CAST(sum(bal_c) // count(*) AS bigint) AS thr_c FROM cc WHERE bal_c > 0),
    recent AS (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    SELECT cntry, count(*) AS numcust, CAST(sum(bal_c) AS bigint) AS totacctbal_c
    FROM cc, thr
    WHERE bal_c > thr_c AND c_custkey NOT IN (SELECT o_custkey FROM recent)
    GROUP BY cntry ORDER BY cntry"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q6_forecast_revenue"  -> (q6Forecast _),
    "q7_volume_shipping"   -> (q7Volume _),
    "q9_product_profit"    -> (q9Profit _),
    "q11_important_parts"  -> (q11ImportantParts _),
    "q12_late_lines"       -> (q12LateLines _),
    "q13_order_dist"       -> (q13OrderDist _),
    "q14_promo_share"      -> (q14PromoShare _),
    "q15_top_supplier"     -> (q15TopSupplier _),
    "q16_supplier_variety" -> (q16SupplierVariety _),
    "q18_large_orders"     -> (q18LargeOrders _),
    "q19_bracket_revenue"  -> (q19BracketRevenue _),
    "q20_promo_suppliers"  -> (q20PromoSuppliers _),
    "q21_waiting_supplier" -> (q21WaitingSupplier _),
    "q22_idle_customers"   -> (q22IdleCustomers _))

  val oracles: Map[String, String] = Map(
    "q6_forecast_revenue"  -> q6ForecastSql,
    "q7_volume_shipping"   -> q7VolumeSql,
    "q9_product_profit"    -> q9ProfitSql,
    "q11_important_parts"  -> q11ImportantPartsSql,
    "q12_late_lines"       -> q12LateLinesSql,
    "q13_order_dist"       -> q13OrderDistSql,
    "q14_promo_share"      -> q14PromoShareSql,
    "q15_top_supplier"     -> q15TopSupplierSql,
    "q16_supplier_variety" -> q16SupplierVarietySql,
    "q18_large_orders"     -> q18LargeOrdersSql,
    "q19_bracket_revenue"  -> q19BracketRevenueSql,
    "q20_promo_suppliers"  -> q20PromoSuppliersSql,
    "q21_waiting_supplier" -> q21WaitingSupplierSql,
    "q22_idle_customers"   -> q22IdleCustomersSql)
}
