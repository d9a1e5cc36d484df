"""TPC-H-shaped relational plane over the driver's trimmed TPC-H tables.

The driver's synthetic tables carry the TPC-H core columns but omit
partsupp and the comment/shipmode/phone/date-pair columns, so each query
here keeps its TPC-H *operator shape* (the thing the engine must plan
well) with predicates adapted to the available columns:

q2  correlated scalar-min subquery      q13 outer join + grouped histogram
q4  EXISTS semi-join + group            q14 conditional-ratio agg (LIKE)
q7  multi-join, two-dimension group     q15 scalar-subquery max (view top-1)
q8  market-share ratio by year          q16 distinct-count aggregation
q9  5-way join, profit by nation/year   q17 correlated scalar avg subquery
q10 join + agg + top-k by measure       q18 IN over grouped HAVING
q11 grouped HAVING vs global scalar     q19 disjunctive multi-predicate scan
q12 conditional two-sum agg             q20 nested IN + grouped HAVING
q21 EXISTS/NOT EXISTS self-joins        q22 NOT EXISTS + avg-threshold filter

(q1/q3/q5/q6 live in registry.py as headline queries; with the shapes here
the full 22-query TPC-H operator surface is covered.  partsupp does not
exist in the testdata, so q2/q9/q11/q20 use lineitem as the part↔supplier
relation and p_retailprice as the cost column — operator shape preserved,
predicates adapted.)

Determinism rules (the driver hashes result values across engines):
money sums go through DECIMAL(18,2); ratios/averages are floor-truncated
to 6 decimals (round() half-breaking differs between engines); quantity
sums are integer-valued doubles (exact in any summation order); avg
thresholds are CAST(sum(DECIMAL) AS DOUBLE)/count — one deterministic
rounding — before any comparison.

All strings are common-dialect: one text parses identically in Spark SQL
and DuckDB (the oracle), so plan and oracle cannot drift.
"""

from __future__ import annotations

from storage_crawler_spark.plans.dialect import money_double

_REV = money_double("sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)))", scale=4)


def _trunc6(x: str) -> str:
    return f"(CAST(floor(({x}) * 1000000) AS DOUBLE) / 1000000)"


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE)
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""".strip()

Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year, {_REV.replace('l_extendedprice', 'volume').replace('1 - l_discount', '1 - disc')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(YEAR FROM CAST(l.l_shipdate AS DATE)) AS l_year,
         l.l_extendedprice AS volume, l.l_discount AS disc
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE n1.n_name < n2.n_name
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""".strip()

Q8_SQL = f"""
SELECT o_year,
       {_trunc6(money_double("sum(CASE WHEN nation = 'NATION_7' THEN vol_dec ELSE CAST(0 AS DECIMAL(18,4)) END)", scale=4) + " / " + money_double("sum(vol_dec)", scale=4))} AS mkt_share
FROM (
  SELECT EXTRACT(YEAR FROM CAST(o.o_orderdate AS DATE)) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS vol_dec,
         n.n_name AS nation
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_type LIKE 'PROMO%'
) all_nations
GROUP BY o_year
ORDER BY o_year
""".strip()

Q10_SQL = f"""
SELECT c.c_custkey AS custkey, c.c_name AS name, {_REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')} AS revenue,
       n.n_name AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, custkey
LIMIT 20
""".strip()

Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""".strip()

Q14_SQL = f"""
SELECT {_trunc6(
    "100.00 * " + money_double("sum(CASE WHEN p.p_type LIKE 'PROMO%' THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,4)) END)", scale=4)
    + " / " + money_double("sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2)))", scale=4)
)} AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l.l_shipdate AS DATE) < DATE '1996-04-01'
""".strip()

Q15_SQL = f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no, {_REV} AS total_revenue
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey AS suppkey, s.s_name AS name, r.total_revenue
FROM supplier s
JOIN revenue0 r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue0)
ORDER BY suppkey
""".strip()

Q16_SQL = """
SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#45'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""".strip()

# avg threshold via exact integer-valued-double sum: deterministic in any
# summation order, so the correlated comparison cannot flip between engines.
Q17_SQL = f"""
SELECT {_trunc6(money_double("sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))") + " / 7.0")} AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
  )
""".strip()

Q18_SQL = """
SELECT c.c_name AS name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
       CAST(o.o_orderdate AS DATE) AS orderdate, o.o_totalprice AS totalprice,
       sum(l.l_quantity) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 210
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_totalprice
ORDER BY totalprice DESC, orderkey
LIMIT 100
""".strip()

Q19_SQL = f"""
SELECT {_REV} AS revenue, count(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
""".strip()

Q22_SQL = f"""
SELECT cntrycode, count(*) AS numcust,
       {money_double('sum(CAST(c_acctbal AS DECIMAL(18,2)))')} AS totacctbal
FROM (
  SELECT substr(c.c_name, 17, 2) AS cntrycode, c.c_acctbal
  FROM customer c
  WHERE c.c_acctbal > (
      SELECT {money_double('sum(CAST(c2.c_acctbal AS DECIMAL(18,2)))')} / count(*)
      FROM customer c2 WHERE c2.c_acctbal > 0.0
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    )
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
""".strip()

# q2 shape: correlated scalar-min subquery that repeats the outer query's
# join tree (the classic decorrelation stress test).  The testdata has no
# partsupp, so lineitem serves as the part↔supplier "offer" relation and
# l_extendedprice as the offered cost; equality on a *stored* double (no
# arithmetic) is exact in both engines.  DISTINCT because several lineitems
# can tie at the minimum for the same (part, supplier).
Q2_SQL = """
SELECT DISTINCT s.s_acctbal AS acctbal, s.s_name AS supp_name, n.n_name AS nation,
       p.p_partkey AS partkey, p.p_type AS ptype
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND p.p_size = 10
  AND l.l_extendedprice = (
    SELECT min(l2.l_extendedprice)
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'ASIA'
  )
ORDER BY acctbal DESC, nation, supp_name, partkey
LIMIT 100
""".strip()

# q9 shape: LIKE-filtered part, 5-way join, profit = revenue − cost, grouped
# by (nation, year).  p_retailprice stands in for ps_supplycost.
Q9_SQL = f"""
SELECT nation, o_year, {money_double('sum(amount)', scale=4)} AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         EXTRACT(YEAR FROM CAST(o.o_orderdate AS DATE)) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))
           - CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2)) AS amount
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE 'red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""".strip()

# q11 shape: grouped value HAVING > fraction-of-global scalar subquery.
# Both sides reduced to DOUBLE via one exact DECIMAL sum before the single
# float multiply/compare, so the threshold cannot flip between engines.
Q11_SQL = f"""
SELECT l.l_partkey AS partkey,
       {money_double('sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2)))', scale=4)} AS part_value
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_7'
GROUP BY l.l_partkey
HAVING {money_double('sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2)))', scale=4)} > (
  SELECT {money_double('sum(CAST(l2.l_extendedprice AS DECIMAL(18,2)) * CAST(l2.l_quantity AS DECIMAL(18,2)))', scale=4)} * 0.001
  FROM lineitem l2
  JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
  JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
  WHERE n2.n_name = 'NATION_7'
)
ORDER BY part_value DESC, partkey
""".strip()

# q12 shape: join + two conditional sums by category.  l_linestatus stands in
# for l_shipmode; "shipped after ordering within 1997" for the date window.
Q12_SQL = """
SELECT l.l_linestatus AS linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE CAST(l.l_shipdate AS DATE) >= DATE '1997-01-01'
  AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
  AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE)
GROUP BY l.l_linestatus
ORDER BY linestatus
""".strip()

# q20 shape: IN over a grouped-HAVING subquery that itself nests an IN over a
# LIKE-filtered part list.  sum(l_quantity) is an integer-valued double —
# exact in any summation order.
Q20_SQL = """
SELECT s.s_name AS name, n.n_name AS nation
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING sum(l.l_quantity) > 50
)
ORDER BY name
""".strip()

# q21 shape: EXISTS (another supplier on the order) + NOT EXISTS (another
# *late* supplier on the order), late = shipped >60 days after order date
# (no receipt/commit dates in the testdata).
Q21_SQL = """
SELECT s.s_name AS name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND n.n_name = 'NATION_3'
  AND CAST(l1.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND CAST(l3.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, name
LIMIT 100
""".strip()


# (name, sql, tables, doc) — registry consumes this.
TPCH_EXTRA = [
    ("tpch_q2_min_cost_supplier", Q2_SQL, ("part", "lineitem", "supplier", "nation", "region"), "correlated scalar-min subquery repeating the outer join tree (q2 shape)"),
    ("tpch_q4_order_priority", Q4_SQL, ("orders", "lineitem"), "EXISTS semi-join + group (q4 shape)"),
    ("tpch_q7_volume_shipping", Q7_SQL, ("supplier", "lineitem", "orders", "customer", "nation"), "5-way join, two-dimension group + year extract (q7 shape)"),
    ("tpch_q8_market_share", Q8_SQL, ("lineitem", "part", "supplier", "orders", "nation"), "conditional-ratio market share by year (q8 shape)"),
    ("tpch_q9_product_profit", Q9_SQL, ("lineitem", "supplier", "part", "orders", "nation"), "LIKE-filtered 5-way join, profit by nation/year (q9 shape)"),
    ("tpch_q10_returned_items", Q10_SQL, ("customer", "orders", "lineitem", "nation"), "join + agg + top-k by measure (q10 shape)"),
    ("tpch_q11_important_stock", Q11_SQL, ("lineitem", "supplier", "nation"), "grouped HAVING vs fraction-of-global scalar subquery (q11 shape)"),
    ("tpch_q12_priority_shipping", Q12_SQL, ("orders", "lineitem"), "join + conditional two-sum aggregate (q12 shape)"),
    ("tpch_q13_customer_distribution", Q13_SQL, ("customer", "orders"), "left outer join with ON-filter + grouped histogram (q13 shape)"),
    ("tpch_q14_promo_revenue", Q14_SQL, ("lineitem", "part"), "conditional-ratio aggregate with LIKE (q14 shape)"),
    ("tpch_q15_top_supplier", Q15_SQL, ("supplier", "lineitem"), "CTE revenue view + scalar-subquery max (q15 shape)"),
    ("tpch_q16_distinct_suppliers", Q16_SQL, ("lineitem", "part"), "count(DISTINCT) aggregation + IN-list filter (q16 shape)"),
    ("tpch_q17_small_qty_revenue", Q17_SQL, ("lineitem", "part"), "correlated scalar avg subquery (q17 shape)"),
    ("tpch_q18_large_volume_customer", Q18_SQL, ("customer", "orders", "lineitem"), "IN over grouped HAVING + top-k (q18 shape)"),
    ("tpch_q19_disjunctive_filter", Q19_SQL, ("lineitem", "part"), "disjunctive multi-predicate join filter (q19 shape)"),
    ("tpch_q20_part_promotion", Q20_SQL, ("supplier", "nation", "lineitem", "part"), "nested IN subqueries with grouped HAVING (q20 shape)"),
    ("tpch_q21_waiting_suppliers", Q21_SQL, ("supplier", "lineitem", "orders", "nation"), "EXISTS + NOT EXISTS correlated self-joins (q21 shape)"),
    ("tpch_q22_acctbal_prospects", Q22_SQL, ("customer", "orders"), "NOT EXISTS anti-join + uncorrelated avg threshold (q22 shape)"),
]
