package graft

import graft.analytics.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the TPC-H twin batch (Q4, Q8, Q9, Q14–Q19, Q21,
  * Q22): each op cross-checked against an independent DataFrame
  * formulation or an invariant the query's definition forces.
  */
class Round10dSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("q4: semi-join count matches distinct-order count of the inner join") {
    val rows = Relational.q4PriorityLate(spark, dir).collect()
    assert(rows.nonEmpty)
    // brute force: inner join then countDistinct per priority
    val orders = Tables.load(spark, dir, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
             col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
    val li = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_shipdate")
    val brute = orders.join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 80 DAYS"))
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getAs[Long]("n_late_orders") ==
      brute(r.getAs[String]("o_orderpriority")),
      s"priority ${r.getString(0)}: semi count == distinct inner count"))
  }

  test("q8: share in [0,1], nation volume <= total, share reproduces division") {
    val rows = Relational.q8MarketShare(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nv, tv, sh) = (r.getAs[Double]("nation_volume"),
        r.getAs[Double]("total_volume"), r.getAs[Double]("mkt_share"))
      assert(nv >= 0 && nv <= tv, "nation slice bounded by total")
      assert(math.abs(sh - nv / tv) < 1e-12, "share is the exact division")
    }
  }

  test("q14: promo + non-promo decompose the total, months within 1..12") {
    val rows = Relational.q14PromoShare(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Long]("ship_month")
      assert(m >= 1 && m <= 12)
      val (p, t) = (r.getAs[Double]("promo_revenue"), r.getAs[Double]("total_revenue"))
      assert(p >= 0 && p <= t)
      assert(math.abs(r.getAs[Double]("promo_share") - 100.0 * p / t) < 1e-9)
    }
  }

  test("q17: threshold semantics match an independent exact-integer formulation") {
    val row = Relational.q17SmallQty(spark, dir).collect().head
    val n = row.getAs[Long]("n_small_lines")
    // independent EXACT formulation: qty < 0.2·avg ⇔ qty·cnt·5 < Σqty in
    // exact decimal (quantities are integer-valued in this export) — no
    // float division, so a boundary-adjacent row can never flip the test
    // on a regenerated or rescaled corpus
    val brandParts = Tables.load(spark, dir, "part")
      .where(col("p_brand") === "Brand#12").select("p_partkey")
    val li = Tables.load(spark, dir, "lineitem")
      .join(brandParts, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"),
        col("l_quantity").cast("decimal(20,2)").as("qty_d"))
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("qty_d")).cast("decimal(30,2)").as("sum_qty"))
    val brute = li.join(perPart, col("l_partkey") === col("pk"))
      .where(col("qty_d") * col("cnt") * lit(5) < col("sum_qty"))
      .count()
    assert(n == brute, s"exact-decimal threshold ($n) == independent exact formulation ($brute)")
  }

  test("q15: every returned supplier revenue equals the global max; ties all present") {
    val rows = Relational.q15TopSupplier(spark, dir).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, "all returned rows carry the identical max revenue")
  }

  test("q16: supplier_cnt positive, excluded brand absent, sizes within the subset") {
    val rows = Relational.q16SupplierVariety(spark, dir).collect()
    assert(rows.nonEmpty)
    val sizes = Set(1, 5, 9, 13, 17, 21, 25, 29)
    rows.foreach { r =>
      assert(r.getAs[String]("p_brand") != "Brand#1")
      assert(sizes.contains(r.getAs[Int]("p_size")))
      assert(r.getAs[Long]("supplier_cnt") >= 1L)
    }
    val cnts = rows.map(_.getAs[Long]("supplier_cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "ordered desc")
  }

  test("q18: every order exceeds 300 units; one order cross-checked brute-force") {
    val rows = Relational.q18LargeOrders(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach(r => assert(r.getAs[Double]("total_qty") > 300.0))
    val ok = rows.head.getAs[Long]("o_orderkey")
    val brute = Tables.load(spark, dir, "lineitem")
      .where(col("l_orderkey") === ok)
      .agg(sum(col("l_quantity"))).collect().head.getDouble(0)
    assert(math.abs(brute - rows.head.getAs[Double]("total_qty")) < 1e-6)
  }

  test("q19: disjunctive count equals the sum of the three branch counts (disjoint brands)") {
    val row = Relational.q19Disjunctive(spark, dir).collect().head
    val li = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
    def branch(brand: String, smax: Int, qlo: Int, qhi: Int): Long =
      li.where(col("p_brand") === brand && col("p_size").between(1, smax) &&
        col("l_quantity").between(qlo, qhi)).count()
    val total = branch("Brand#11", 5, 1, 11) + branch("Brand#12", 10, 10, 20) +
      branch("Brand#13", 15, 20, 30)
    assert(row.getAs[Long]("n_lines") == total,
      "brands are disjoint so the disjunction partitions into the three branches")
  }

  test("q9: every (nation, year) group has gear-part lines; profit < revenue always") {
    val rows = Relational.q9ProductProfit(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_lines") >= 1L))
    // cost model sanity: profit is revenue minus a strictly positive cost,
    // so per-group profit must be strictly below the group's gross revenue
    val gross = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "part").where(col("p_name").contains("gear")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.load(spark, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      val key = (r.getAs[String]("nation"), r.getAs[Long]("o_year"))
      assert(r.getAs[Double]("sum_profit") < gross(key) + 1e-6)
    }
  }

  test("q21: numwait sums match a window-based independent formulation") {
    val rows = Relational.q21LateSupplier(spark, dir).collect()
    // window formulation: per order, count late lines and total suppliers
    val withOrd = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late",
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 100 DAYS")).cast("int"))
    val perOrder = withOrd.groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct(when(col("is_late") === 1, col("l_suppkey"))).as("late_supps"),
        countDistinct(col("l_suppkey")).as("n_supps"))
    // qualifying line: late, on an order with >1 supplier, where the ONLY
    // late supplier is this line's
    val brute = withOrd.where(col("is_late") === 1)
      .join(perOrder, col("l_orderkey") === col("ok"))
      .where(col("n_supps") > 1 && col("late_supps") === 1)
      .join(Tables.load(spark, dir, "supplier")
          .join(Tables.load(spark, dir, "nation").where(col("n_name") === "NATION_0"),
            col("s_nationkey") === col("n_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[Long]("numwait")).sum == brute.values.sum,
      "anti/semi formulation total == window formulation total")
    rows.foreach(r => assert(r.getAs[Long]("numwait") ==
      brute(r.getAs[String]("s_name"))))
  }

  test("q22: customer counts match a per-nation brute force; no recent-order leakage") {
    val rows = Relational.q22IdleBalance(spark, dir).collect()
    assert(rows.nonEmpty)
    val customer = Tables.load(spark, dir, "customer")
    val avgBal = customer.where(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal"))).collect().head.getDouble(0)
    val recent = Tables.load(spark, dir, "orders")
      .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp_ntz"))
      .select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    val brute = customer
      .join(Tables.load(spark, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_acctbal", "n_name").collect()
      .filter(r => r.getDouble(1) > avgBal && !recent.contains(r.getLong(0)))
      .groupBy(_.getString(2)).view.mapValues(_.length.toLong).toMap
    rows.foreach(r => assert(r.getAs[Long]("n_custs") ==
      brute(r.getAs[String]("n_name")),
      s"nation ${r.getString(0)} idle-customer count"))
  }
}
