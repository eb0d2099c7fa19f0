package graft

import org.apache.spark.sql.functions._
import graft.operators.MarketOps
import graft.sources.Tables

/** Module B specs — non-trivial operators checked against naive
  * recomputations of the same semantics (collect-side, small SF).
  */
class MarketOpsSpec extends SparkSpec {

  test("b3 pagination returns exactly rows 21-40 of the global ordering") {
    val got = rows(MarketOps.marketplaceListing(spark, sf))
    assert(got.size == 20)
    // naive: full ordering of open orders by (price desc, orderkey)
    val full = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "O")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey").collect().map(_.getLong(0))
    val expected = full.slice(20, 40).toSeq
    assert(got.map(_.getAs[Long]("o_orderkey")) == expected)
  }

  test("b36 every sort mode pages the same filtered set, correctly ordered") {
    val open = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "O")
      .select("o_orderkey", "o_totalprice", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
                 r.getAs[java.time.LocalDateTime](2)))
    type Row3 = (Long, Double, java.time.LocalDateTime)
    def lt(mode: Int)(a: Row3, b: Row3): Boolean = mode match {
      case 0 => a._3.isAfter(b._3) || (a._3 == b._3 && a._1 > b._1)
      case 1 => a._1 > b._1
      case 2 | 6 => a._3.isBefore(b._3) || (a._3 == b._3 && a._1 < b._1)
      case 3 => a._1 < b._1
      case 4 => a._2 < b._2 || (a._2 == b._2 && a._1 < b._1)
      case 5 => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
      // reference default branch: listing date descending (mode 0)
      case _ => a._3.isAfter(b._3) || (a._3 == b._3 && a._1 > b._1)
    }
    (0 to 6).foreach { mode =>
      val got = MarketOps.marketplaceSorted(spark, sf, mode).collect()
        .map(_.getAs[Long]("o_orderkey")).toSeq
      assert(got.size == math.min(20, open.length), s"mode $mode size")
      val expected = open.sorted(Ordering.fromLessThan(lt(mode)))
        .take(20).map(_._1).toSeq
      assert(got == expected, s"mode $mode order")
    }
    // fixed-duration listings: "ending soonest" == oldest listing
    assert(MarketOps.marketplaceSorted(spark, sf, 6).collect().toSeq ==
           MarketOps.marketplaceSorted(spark, sf, 2).collect().toSeq)
    // an unknown mode degrades to the reference's default branch
    // (mode 0, listing date descending), not to some other sort
    assert(MarketOps.marketplaceSorted(spark, sf, 42).collect().toSeq ==
           MarketOps.marketplaceSorted(spark, sf, 0).collect().toSeq)
  }

  test("b4 latest-per-key matches naive groupBy-max recomputation") {
    val got = MarketOps.latestOrderPerCustomer(spark, sf)
      .select("c_custkey", "last_orderkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_orderdate").collect()
      .groupBy(_.getLong(0))
      .map { case (ck, rs) =>
        val best = rs.maxBy { r =>
          val ts = r.getAs[java.time.LocalDateTime](2)
          (ts.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + ts.getNano,
           r.getLong(1))
        }
        ck -> best.getLong(1)
      }
    assert(got == naive)
  }

  test("b14 shares sum to 1 and match hand-computed ratios") {
    val got = rows(MarketOps.priorityShare(spark, sf))
    assert(got.size == 5)
    val shareSum = got.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-3)
    val vols = got.map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Double]("volume")).toMap
    val total = vols.values.sum
    got.foreach { r =>
      val expect = vols(r.getAs[String]("o_orderpriority")) / total
      assert(math.abs(r.getAs[Double]("share") - expect) < 1e-4)
    }
  }

  test("b7 keyword search is non-empty and every hit contains the keyword") {
    val got = rows(MarketOps.keywordSearch(spark, sf))
    assert(got.nonEmpty)
    assert(got.forall(_.getAs[String]("p_name").contains("gear")))
  }

  test("b16/b18 per-token views agree with each other and the raw table") {
    val hist = MarketOps.tokenHistory(spark, sf).collect()
    val series = MarketOps.priceHistoryToken(spark, sf).collect()
    val raw = Tables.lineitem(spark, sf)
      .filter(col("l_partkey") === 42).count()
    assert(hist.length == raw)
    assert(series.map(_.getAs[Long]("n_sales")).sum == raw)
    // daily extremes bound every sale of that day
    val byDay = hist.groupBy(_.getAs[java.sql.Date]("ship_day").toString)
    series.foreach { r =>
      val sales = byDay(r.getAs[java.sql.Date]("day").toString)
        .map(_.getAs[Double]("price"))
      assert(r.getAs[Double]("low") <= sales.min + 1e-9)
      assert(r.getAs[Double]("high") >= sales.max - 1e-9)
    }
  }

  test("b19 profile: status pivot sums to order count per customer") {
    val got = MarketOps.customerProfile(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val total = r.getAs[Long]("n_open") + r.getAs[Long]("n_filled") +
        r.getAs[Long]("n_pending")
      assert(total == r.getAs[Long]("n_orders"))
      assert(!r.getAs[java.sql.Date]("first_order_day")
        .after(r.getAs[java.sql.Date]("last_order_day")))
    }
  }

  test("b24 sketch stats track exact b5 within HLL/quantile error bounds") {
    val exact = rows(MarketOps.collectionStats(spark, sf))
      .map(r => r.getAs[String]("p_brand") ->
        (r.getAs[Long]("items"), r.getAs[Long]("owners"), r.getAs[Double]("volume")))
      .toMap
    val approx = rows(MarketOps.collectionStatsApprox(spark, sf))
    assert(approx.size == exact.size)
    approx.foreach { r =>
      val (items, owners, volume) = exact(r.getAs[String]("p_brand"))
      assert(r.getAs[Long]("items") == items)           // exact agg unchanged
      assert(r.getAs[Double]("volume") == volume)
      assert(r.getAs[Long]("owners") == owners)         // exact side of the bound
      // the in-bound booleans ARE the sketch check the driver hash-gates
      assert(r.getAs[Boolean]("owners_in_bound"),
        s"${r.getAs[String]("p_brand")}: hll outside 10%/abs-2 of $owners")
      assert(r.getAs[Boolean]("median_in_bound"),
        s"${r.getAs[String]("p_brand")}: approx median outside 5% of exact")
    }
  }

  test("b41 feeds channels: regex match, burn excluded, {total, data}") {
    val got = rows(MarketOps.feedsChannels(spark, sf, burnCust = 7L, pageSize = 10))
    assert(got.nonEmpty && got.size <= 10)
    val total = got.head.getAs[Long]("total")
    assert(got.forall(_.getAs[Long]("total") == total))
    assert(total >= got.size)
    val re = "(?i)(gear|ivory)".r
    got.foreach { r =>
      // every page row matches the keyword on at least one text field
      assert(re.findFirstIn(r.getAs[String]("p_name")).isDefined ||
             re.findFirstIn(r.getAs[String]("p_type")).isDefined)
      assert(r.getAs[Long]("owner") != 7L)              // burn excluded
    }
    // newest-first (mint_day desc, partkey desc) page order
    val keys = got.map(r => (r.getAs[java.sql.Date]("mint_day").getTime,
                             r.getAs[Long]("p_partkey")))
    assert(keys == keys.sortBy(k => (-k._1, -k._2)))
    // a burn owner that can't match any row keeps the total at the
    // unfiltered channel-owner count; a real owner shrinks it
    val noBurn = rows(MarketOps.feedsChannels(spark, sf, burnCust = -1L))
      .head.getAs[Long]("total")
    assert(noBurn >= total)
  }

  test("b42 pool rewards partition the purchase events exactly") {
    val got = rows(MarketOps.poolRewards(spark, sf))
    assert(got.map(_.getAs[Long]("pool")).toSet.subsetOf(Set(0L, 1L, 2L, 3L)))
    // pools partition the reward records: counts sum to the filter count
    val nPurchases = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase").count()
    assert(got.map(_.getAs[Long]("n_rewards")).sum == nPurchases)
    got.foreach(r => assert(r.getAs[Long]("n_rewards") > 0))
  }

  test("b26 point lookup returns one row whose aggregates match the raw table") {
    val got = rows(MarketOps.tokenDetail(spark, sf, partkey = 7))
    assert(got.size == 1)
    val r = got.head
    val raw = Tables.lineitem(spark, sf).filter(col("l_partkey") === 7)
      .select("l_extendedprice").collect().map(_.getDouble(0))
    assert(r.getAs[Long]("n_sales") == raw.length)
    assert(math.abs(r.getAs[Double]("revenue") - raw.sum) < 0.011)
    assert(r.getAs[Double]("top_price") == BigDecimal(raw.max)
      .setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
  }

  test("b27 collection browse pages are disjoint slices of one collection") {
    // pageSize 3 so a second page exists even at sf0.001 (7 sold items)
    val page0 = rows(MarketOps.collectionBrowse(spark, sf, page = 0, pageSize = 3))
      .map(_.getAs[Long]("p_partkey"))
    val page1 = rows(MarketOps.collectionBrowse(spark, sf, page = 1, pageSize = 3))
      .map(_.getAs[Long]("p_partkey"))
    assert((page0.toSet & page1.toSet).isEmpty)
    // every returned item belongs to the browsed collection, and the
    // page sizes follow from the collection's sold-item count
    val brandKeys = Tables.part(spark, sf).filter(col("p_brand") === "Brand#1")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert((page0 ++ page1).forall(brandKeys.contains))
    val nSold = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_brand") === "Brand#1"),
            col("l_partkey") === col("p_partkey"))
      .select("p_partkey").distinct().count()
    assert(page0.size == math.min(3, nSold))
    assert(page1.size == math.min(3, math.max(0, nSold - 3)))
    assert(page1.nonEmpty)  // non-vacuous second page at every test SF
  }

  test("b28 income series sums to the user's total filled volume") {
    val got = rows(MarketOps.userIncomeSeries(spark, sf, custkey = 7))
    assert(got.nonEmpty)
    val total = Tables.orders(spark, sf).filter(col("o_custkey") === 7)
      .select("o_totalprice").collect().map(_.getDouble(0)).sum
    val seriesSum = got.map(_.getAs[Double]("income")).sum
    assert(math.abs(seriesSum - total) < 0.011 * got.size)
  }

  test("b2 top sellers matches naive revenue ranking") {
    val got = rows(MarketOps.topSellers(spark, sf))
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Double]("revenue")))
    val naive = Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_extendedprice", "l_discount").collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) =>
        val rev = rs.map(r => r.getDouble(1) * (1.0 - r.getDouble(2))).sum
        k -> BigDecimal(rev).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toSeq.sortBy { case (k, rev) => (-rev, k) }.take(10)
    assert(got == naive)
  }

  test("b29/b32 wallet pages: every row is the wallet's, total = naive count") {
    for ((df, status) <- Seq(MarketOps.walletListed(spark, sf) -> "O",
                             MarketOps.walletSold(spark, sf) -> "F")) {
      val got = df.collect()
      assert(got.nonEmpty)
      // naive ground truth for supplier 1 in this status — a MULTISET:
      // (orderkey, linenumber) is not unique in the generated data
      val naive = Tables.lineitem(spark, sf).filter(col("l_suppkey") === 1)
        .join(Tables.orders(spark, sf).filter(col("o_orderstatus") === status),
              col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      val keys = naive.toSet
      assert(got.forall(r => r.getAs[Long]("total") == naive.length))
      assert(got.forall(r =>
        keys((r.getAs[Long]("orderkey"), r.getAs[Int]("l_linenumber")))))
      assert(got.length == math.min(10, naive.length))
    }
  }

  test("b43 today-earned: only the latest filled day, sums match naive") {
    val got = MarketOps.todayEarned(spark, sf).collect()
    assert(got.nonEmpty)
    val filled = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"), col("o_totalprice"),
              col("o_orderdate").cast("date").as("day")).collect()
    val today = filled.map(_.getAs[java.sql.Date]("day")).max
    // every emitted row is on "today", and the per-customer sums are
    // exactly the naive single-day aggregation
    val naive = filled.filter(_.getAs[java.sql.Date]("day") == today)
      .groupBy(_.getAs[Long]("o_custkey"))
      .map { case (ck, rs) =>
        ck -> (BigDecimal(rs.map(_.getAs[Double]("o_totalprice")).sum)
                 .setScale(2, BigDecimal.RoundingMode.HALF_UP), rs.length)
      }
    assert(got.length == naive.size)
    got.foreach { r =>
      assert(r.getAs[java.sql.Date]("today") == today)
      val (sum, n) = naive(r.getAs[Long]("c_custkey"))
      assert(math.abs(r.getAs[Double]("earned_today") - sum.toDouble) < 1e-6)
      assert(r.getAs[Long]("n_filled_today") == n)
    }
  }

  test("b44 earned list: all the wallet's filled lines, net = price(1-fee)") {
    val got = MarketOps.earnedList(spark, sf).collect()
    assert(got.nonEmpty)
    val naive = Tables.lineitem(spark, sf).filter(col("l_suppkey") === 1)
      .join(Tables.orders(spark, sf).filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey")).collect()
    // unpaged: the COMPLETE earnings list comes back, newest first
    assert(got.length == naive.length)
    got.foreach { r =>
      val expect = r.getAs[Double]("price") * (1.0 - r.getAs[Double]("platform_fee"))
      assert(math.abs(r.getAs[Double]("net_earned") - expect) < 0.01)
    }
    val days = got.map(_.getAs[java.sql.Date]("ship_day").toString).toSeq
    assert(days == days.sorted.reverse, "not newest-first")
  }

  test("b45 V1 wallet market: open urgent lines of the wallet, first 5") {
    val got = MarketOps.v1WalletMarket(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 5)
    val naiveKeys = Tables.lineitem(spark, sf).filter(col("l_suppkey") === 1)
      .join(Tables.orders(spark, sf)
              .filter(col("o_orderstatus") === "O" &&
                      col("o_orderpriority") === "1-URGENT"),
            col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    got.foreach { r =>
      assert(r.getAs[String]("chain") == "1-URGENT")
      assert(naiveKeys((r.getAs[Long]("orderkey"), r.getAs[Int]("l_linenumber"))))
    }
    // deterministic page: ascending insertion-order analog
    val ord = got.map(r => (r.getAs[Long]("orderkey"),
                            r.getAs[Int]("l_linenumber"))).toSeq
    assert(ord == ord.sorted)
  }

  test("b31 minted: every returned part was first-sold by the wallet") {
    val got = MarketOps.walletMinted(spark, sf).collect()
    assert(got.nonEmpty)
    // naive first-seller per part over the raw table, same 5-field
    // ordinal as the operator (ship ts, orderkey, linenumber, suppkey,
    // price)
    val firstSeller = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey", "l_shipdate", "l_orderkey",
              "l_linenumber", "l_extendedprice")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (pk, rs) =>
        pk -> rs.minBy { r =>
          val ts = r.getAs[java.time.LocalDateTime](2)
          (ts.toEpochSecond(java.time.ZoneOffset.UTC) * 1000 +
             ts.getNano / 1000000, r.getLong(3), r.getInt(4), r.getLong(1),
           r.getDouble(5))
        }.getLong(1)
      }
    val minted = firstSeller.filter(_._2 == 1L).keySet
    assert(got.map(_.getAs[Long]("p_partkey")).toSet == minted)
  }

  test("b34 {total,data}: page equals b3's page, total counts ALL open orders") {
    val got = MarketOps.marketplacePage(spark, sf).collect()
    assert(got.length == 20)
    val openCount = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "O").count()
    assert(got.forall(_.getAs[Long]("total") == openCount))
    val b3Keys = rows(MarketOps.marketplaceListing(spark, sf))
      .map(_.getAs[Long]("o_orderkey"))
    assert(got.map(_.getAs[Long]("o_orderkey")).toSeq == b3Keys)
  }

  test("b35 keyset page equals the offset form over the same ordering") {
    val got = MarketOps.keysetPage(spark, sf).collect()
      .map(_.getAs[Long]("o_orderkey")).toSeq
    assert(got.nonEmpty)
    // naive: sort ALL open orders, drop everything at-or-before the
    // cursor, take the page — the offset-pagination equivalent.
    val cutoff = java.time.LocalDateTime.parse("1997-07-01T00:00:00")
    val naive = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "O")
      .select("o_orderkey", "o_orderdate").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](1), r.getLong(0)))
      .filter { case (d, k) => d.isAfter(cutoff) || (d == cutoff && k > 0) }
      .sortBy { case (d, k) => (d.toEpochSecond(java.time.ZoneOffset.UTC), k) }
      .take(20).map(_._2).toSeq
    assert(got == naive)
  }

  test("b46 point lookup returns exactly the addressed row, predicate pushed") {
    val df = MarketOps.didLookup(spark, sf, "Customer#000000042")
    val got = df.collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("did") == 42L)
    assert(got(0).getAs[String]("address") == "Customer#000000042")
    // the equality predicate must reach the parquet scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
           plan.contains("EqualTo(c_name"), plan)
    // a missing address yields zero rows, not an error
    assert(MarketOps.didLookup(spark, sf, "Customer#nope").count() == 0L)
  }

  test("b47 latest rate is the global max-(ts,event_id) event row") {
    val got = MarketOps.latestRate(spark, sf).collect()
    assert(got.length == 1)
    val naive = Tables.eventsMs(spark, sf)
      .select(col("ms"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).max
    assert((got(0).getAs[Long]("ms"), got(0).getAs[Long]("event_id")) == naive)
    // findOne-sorted shape: per-partition top-1, no global sort exchange
    val plan = MarketOps.latestRate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("b48 rate-converted volume: fallback arms + rollup total + broadcast dim") {
    val df = MarketOps.tradingVolumeRates(spark, sf)
    val rows = df.collect()
    val (total, groups) = rows.partition(_.isNullAt(0))
    assert(total.length == 1)  // the rollup grand-total row
    assert(groups.map(_.getAs[String]("qt")).toSet ==
      Set("click", "error", "purchase", "signup", "view", "(native)"))
    assert(groups.map(_.getAs[Long]("n_orders")).sum ==
      total(0).getAs[Long]("n_orders"))
    // the native arm must fold with rate EXACTLY 1 (the reference's
    // null/burn quoteToken fallback) — recompute it from base tables
    val expectNative = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F" &&
              pmod(col("o_orderkey"), lit(7)) === 0)
      .agg(sum(coalesce(nullif(pmod(col("o_orderkey"), lit(4)), lit(0)),
                        lit(1L)) * col("o_totalprice") / lit(1e6)))
      .collect()(0).getDouble(0)
    val gotNative = groups.find(_.getAs[String]("qt") == "(native)").get
      .getAs[Double]("volume")
    assert(math.abs(gotNative - expectNative) < 1e-3)
    // the ≤5-row rates dim must broadcast — never a shuffle of orders
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("b49 raw tick list is b18's unaggregated input") {
    val raw = MarketOps.tokenPriceHistoryRaw(spark, sf)
    assert(raw.count() ==
      Tables.lineitem(spark, sf).filter(col("l_partkey") === 42).count())
    // re-aggregating the raw ticks daily reproduces b18's day rows
    val days = raw.groupBy(col("update_ts").cast("date")).count().count()
    assert(days == MarketOps.priceHistoryToken(spark, sf).count())
    // the partkey predicate reaches the parquet scan
    val plan = raw.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_partkey"), plan)
  }

  test("b50 kinds filter contract: subsets run only their branches; empty selection = the default full set") {
    def kindsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.getAs[String]("kind")).toSet
    // empty selection == explicitly selecting every kind (the
    // reference's no-filter arm)
    val full = MarketOps.transactionsUnion(spark, sf)
    val explicitFull =
      MarketOps.transactionsUnion(spark, sf, MarketOps.TransactionKinds)
    assert(full.collect().map(_.toString).toSeq ==
      explicitFull.collect().map(_.toString).toSeq)
    // a subset selection never leaks other branches onto the page
    val shipOnly = MarketOps.transactionsUnion(spark, sf, Seq("ship"))
    assert(kindsOf(shipOnly) == Set("ship"))
    val two = MarketOps.transactionsUnion(spark, sf, Seq("order", "purchase"))
    assert(kindsOf(two).subsetOf(Set("order", "purchase")) &&
      kindsOf(two).nonEmpty)
    // the null-preserving lookup: order/ship rows resolve a buyer,
    // event rows carry NULL (no order behind a log tick)
    two.collect().foreach { r =>
      if (r.getAs[String]("kind") == "order")
        assert(r.getAs[String]("buyer") != null)
      else assert(r.getAs[String]("buyer") == null)
    }
    // single-branch page 1 == that branch's own top page with buyers
    // attached (the per-branch truncate is the global truncate when
    // only one branch is selected)
    val p1 = MarketOps.transactionsUnion(spark, sf, Seq("ship"), page = 1)
      .collect().map(r => (r.getAs[Long]("orderkey"), r.getAs[Int]("seq")))
    val expect = Tables.lineitem(spark, sf)
      .orderBy(col("l_shipdate").desc, col("l_orderkey").desc,
               col("l_linenumber"))
      .limit(25)
      .collect().map(r => (r.getAs[Long]("l_orderkey"),
                           r.getAs[Int]("l_linenumber")))
    assert(p1.toSeq == expect.toSeq)
  }

  test("b56 consistency audit: counts match naive recomputes, all checks consistent") {
    val got = MarketOps.consistencyAudit(spark, sf).collect()
    assert(got.map(_.getAs[String]("check_name")).toSeq ==
      Seq("lineitem_order_refs", "lineitem_part_refs",
          "lineitem_supplier_refs", "orders_customer_refs"))
    // the generated corpus is referentially consistent — every check
    // must agree, and consistent must equal the count comparison
    got.foreach { r =>
      assert(r.getAs[Boolean]("consistent") ==
        (r.getAs[Long]("lhs_n") == r.getAs[Long]("rhs_n")))
      assert(r.getAs[Boolean]("consistent"), r.getAs[String]("check_name"))
    }
    // spot-check one pair against a naive recompute
    val byName = got.map(r => r.getAs[String]("check_name") ->
      (r.getAs[Long]("lhs_n"), r.getAs[Long]("rhs_n"))).toMap
    val nLiOrders = Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count()
    assert(byName("lineitem_order_refs") == (nLiOrders, nLiOrders))
  }

  test("b56 emits all four checks even when a fact side is empty") {
    // empty fact ⇒ no group out of the aggregation — the audit must
    // still report the check as (0, 0, consistent), never drop the
    // row (the DuckDB replay and AuditStream.readAudit both emit four
    // explicit rows)
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = Files.createTempDirectory("graft_b56_").toString
    Seq("orders.parquet", "customer.parquet", "part.parquet",
        "supplier.parquet").foreach { f =>
      Files.copy(Paths.get(sf, f), Paths.get(d, f),
                 StandardCopyOption.REPLACE_EXISTING)
    }
    Tables.lineitem(spark, sf).filter(org.apache.spark.sql.functions.lit(false))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = MarketOps.consistencyAudit(spark, d).collect()
    assert(got.map(_.getAs[String]("check_name")).toSeq ==
      Seq("lineitem_order_refs", "lineitem_part_refs",
          "lineitem_supplier_refs", "orders_customer_refs"))
    got.filter(_.getAs[String]("check_name") != "orders_customer_refs")
      .foreach { r =>
        assert(r.getAs[Long]("lhs_n") == 0L && r.getAs[Long]("rhs_n") == 0L &&
               r.getAs[Boolean]("consistent"), r.toString)
      }
  }
}
