"""DuckDB oracle SQL — one ANSI-SQL statement per query in
:mod:`ideafast_etl_spark.queries`, semantically (and numerically) identical.

Shared determinism discipline with the Spark side:
  - money aggregates in DECIMAL, cast to DOUBLE at the end;
  - sha256-derived hashing (both engines implement FIPS sha256 identically);
  - minhash permutations share the exact integer constants;
  - similarity math in float64 with matching summation order, round(…, 6).
"""

from __future__ import annotations

from .functions.text import LANG_MARKERS, EN_STOPWORDS, TOKEN_REGEX
from .operators.dedup import LSH_BANDS, LSH_ROWS, MERSENNE31, MINHASH_A, MINHASH_B

# --- shared fragments -------------------------------------------------------

NORM_TEXT = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_WORDS = r"string_split(" + NORM_TEXT + r", ' ')"
_PUNCT_RE = r"[^A-Za-z0-9 \t\n\r]"
_STOP_RE = r"\b(" + "|".join(EN_STOPWORDS) + r")\b"

_SHINGLES = f"""
    SELECT doc_id, lang,
           list_distinct([array_to_string(t[i:i+2], ' ')
                          for i in range(1, len(t) - 1)]) AS shingles
    FROM (SELECT doc_id, lang, {_WORDS} AS t FROM documents)
    WHERE len(t) >= 3
"""

_JACCARD = (
    "round(len(list_intersect(a.shingles, b.shingles))::DOUBLE"
    " / len(list_distinct(list_concat(a.shingles, b.shingles)))::DOUBLE, 6)"
)


def _minhash_sig_sql() -> str:
    """Signature list expression over a hash-value list column ``hv``."""
    parts = [
        f"list_min(list_transform(hv, h -> ({a} * h + {b}) % {MERSENNE31}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]
    return "[" + ", ".join(parts) + "]"


def _lang_scores() -> dict[str, str]:
    return {
        code: (
            r"len(regexp_extract_all(lower(text), '\b("
            + "|".join(words)
            + r")\b'))"
        )
        for code, words in sorted(LANG_MARKERS.items())
    }


ORACLES: dict[str, str] = {}

ORACLES["tpch_q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["revenue_by_nation"] = """
SELECT r_name, n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY r_name, n_name
"""

ORACLES["top_customers_by_revenue"] = """
WITH per_cust AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY o_custkey
), joined AS (
  SELECT n_name, c_custkey, c_name, revenue
  FROM per_cust
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
), ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY n_name ORDER BY revenue DESC, c_custkey ASC) AS INT) AS rank
  FROM joined
)
SELECT n_name, c_custkey, c_name, revenue, rank FROM ranked WHERE rank <= 3
"""

ORACLES["customers_without_orders"] = """
SELECT c_mktsegment, COUNT(*) AS n_customers, MIN(c_custkey) AS min_custkey
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
"""

ORACLES["parts_by_brand"] = """
SELECT p_brand, p_type, COUNT(*) AS n_parts,
  CAST(AVG(CAST(p_size AS DOUBLE)) AS DOUBLE) AS avg_size,
  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total_retail
FROM part
GROUP BY p_brand, p_type
HAVING COUNT(*) >= 2
"""

ORACLES["supplier_balance_by_nation"] = """
SELECT r_name, n_name, COUNT(*) AS n_suppliers,
  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal,
  CAST(SUM(CASE WHEN s_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""

ORACLES["part_revenue_join"] = """
SELECT p_brand,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
  COUNT(DISTINCT s_suppkey) AS n_suppliers
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand
"""

ORACLES["moving_avg_daily_revenue"] = """
WITH daily AS (
  SELECT o_orderdate AS day, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS day_total_dec
  FROM orders GROUP BY o_orderdate
)
SELECT day,
  CAST(day_total_dec AS DOUBLE) AS day_total,
  CAST(SUM(day_total_dec) OVER w AS DOUBLE)
    / COUNT(*) OVER w AS ma7,
  CAST(row_number() OVER (ORDER BY day) AS INT) AS day_rank
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""

ORACLES["rolling_range_revenue"] = """
WITH daily AS (
  SELECT o_orderdate AS day,
    SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS day_total_dec,
    CAST(epoch(o_orderdate) / 86400 AS BIGINT) AS day_num
  FROM orders GROUP BY o_orderdate
)
SELECT day,
  CAST(SUM(day_total_dec) OVER w AS DOUBLE) AS rev_7d,
  CAST(COUNT(*) OVER w AS BIGINT) AS n_days_present
FROM daily
WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""

ORACLES["date_dimension_scalars"] = """
SELECT DISTINCT o_orderdate AS day,
  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
  CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
  CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom,
  CAST(EXTRACT(week FROM o_orderdate) AS INT) AS iso_week,
  CAST(EXTRACT(isodow FROM o_orderdate) AS INT) AS iso_dow,
  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
  date_trunc('month', o_orderdate) AS month_start,
  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS TIMESTAMP) AS plus_2mo,
  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT) AS days_to_eoy
FROM orders
"""

ORACLES["order_priority_counts"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
GROUP BY o_orderpriority
"""

ORACLES["tpch_q6_forecast_revenue"] = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""

ORACLES["tpch_q3_shipping_priority"] = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""

ORACLES["tpch_q10_returned_items"] = """
SELECT c_custkey, c_name, n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

ORACLES["tpch_q14_promo_share"] = """
SELECT
  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
    * 100.0 AS promo_share_pct,
  COUNT(*) AS n_rows
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
"""

ORACLES["tpch_q4_order_priority"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""

ORACLES["tpch_q5_local_supplier_volume"] = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""

ORACLES["tpch_q7_nation_volume"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_11')
   OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_7')
GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(year FROM l_shipdate) AS INT)
"""

ORACLES["tpch_q8_market_share"] = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
  CAST(SUM(CASE WHEN n_s.n_name = 'NATION_7'
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS mkt_share,
  COUNT(*) AS n_rows
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN nation n_s ON s_nationkey = n_s.n_nationkey
WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
GROUP BY CAST(EXTRACT(year FROM o_orderdate) AS INT)
"""

ORACLES["tpch_q12_priority_by_flag"] = """
SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""

ORACLES["tpch_q18_large_orders"] = """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM orders
JOIN big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""

ORACLES["tpch_q22_dormant_customers"] = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS a
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c_custkey AND o.o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""

ORACLES["tpch_q13_customer_distribution"] = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
"""

ORACLES["tpch_q15_top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS total_rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev_dec AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM rev)
"""

ORACLES["tpch_q17_small_quantity_revenue"] = """
WITH j AS (
  SELECT l_quantity, l_extendedprice,
    SUM(l_quantity) OVER (PARTITION BY l_partkey) AS sum_qty,
    COUNT(*) OVER (PARTITION BY l_partkey) AS cnt
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#23'
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM j
WHERE 5.0 * l_quantity * cnt < sum_qty
"""

ORACLES["tpch_q19_disjunctive_join"] = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""

ORACLES["tpch_q21_waiting_suppliers"] = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 50
"""

ORACLES["tpch_q9_product_type_profit"] = """
SELECT n_name AS nation,
  CAST(year(o_orderdate) AS BIGINT) AS o_year,
  CAST(SUM(
    CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
    - CAST(0.60 AS DECIMAL(3,2)) * CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))
  ) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""

ORACLES["tpch_q16_supplier_part_counts"] = """
WITH links AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM links
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 11, 15, 21, 25, 31, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

ORACLES["tpch_q20_excess_inventory_suppliers"] = """
WITH per_pair AS (
  SELECT l_suppkey, l_partkey,
    SUM(CASE WHEN l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
             THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS qty_95,
    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_total
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY l_suppkey, l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
WHERE s_suppkey IN (SELECT l_suppkey FROM per_pair WHERE qty_95 * 2 > qty_total)
ORDER BY s_name
"""

ORACLES["doc_char_chunks"] = """
SELECT doc_id,
  CAST(s / 150 AS BIGINT) AS chunk_idx,
  substr(text, s + 1, 200) AS chunk_text,
  CAST(length(substr(text, s + 1, 200)) AS BIGINT) AS chunk_len
FROM documents, LATERAL unnest(generate_series(0, length(text) - 1, 150)) AS g(s)
WHERE length(text) > 0
"""

ORACLES["pii_scrub"] = """
WITH seeded AS (
  SELECT doc_id,
    text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com or +12 345 6789' AS text
  FROM documents WHERE doc_id < 300
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '\\+[0-9]{2} [0-9]{3} [0-9]{4}')) AS BIGINT) AS n_phones,
  regexp_replace(
    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\\+[0-9]{2} [0-9]{3} [0-9]{4}', '<PHONE>', 'g') AS clean_text
FROM seeded
"""

ORACLES["scd2_customer_segments"] = """
WITH upd AS (
  SELECT c_custkey AS k, 'SEG_' || CAST(c_custkey % 3 AS VARCHAR) AS seg
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'SEG_NEW' FROM customer WHERE c_custkey % 50 = 0
)
SELECT c_custkey, c_mktsegment,
       TIMESTAMP '1990-01-01' AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
FROM customer WHERE c_custkey NOT IN (SELECT k FROM upd)
UNION ALL
SELECT c_custkey, c_mktsegment, TIMESTAMP '1990-01-01', TIMESTAMP '1995-06-01'
FROM customer WHERE c_custkey IN (SELECT k FROM upd)
UNION ALL
SELECT k, seg, TIMESTAMP '1995-06-01', CAST(NULL AS TIMESTAMP)
FROM upd
"""

# Sweep-line concurrency: the oracle computes the SAME total-ordered
# running sum with one window (fine at oracle scale); the Spark side uses
# the distributed two-phase prefix sum — identical integer series.
ORACLES["shipment_concurrency_by_month"] = """
WITH b AS (
  SELECT l_shipdate AS ts, 1 AS delta FROM lineitem
  UNION ALL
  SELECT l_shipdate
           + CAST(1 + (l_orderkey + l_linenumber) % 30 AS INT)
             * INTERVAL 1 DAY,
         -1
  FROM lineitem
), net AS (
  SELECT ts, SUM(delta) AS net FROM b GROUP BY ts
), p AS (
  SELECT ts,
    SUM(net) OVER (ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS in_transit
  FROM net
)
SELECT CAST(year(ts) * 100 + month(ts) AS INT) AS month,
       CAST(MAX(in_transit) AS BIGINT) AS peak_in_transit
FROM p GROUP BY 1
"""

# Point-in-time join: the SCD2 dim enumeration composed with the
# half-open interval join; each order matches exactly one version
# (intervals partition the timeline per key), so row counts are exact.
ORACLES["scd2_point_in_time_join"] = """
WITH upd AS (
  SELECT c_custkey AS k, 'SEG_' || CAST(c_custkey % 3 AS VARCHAR) AS seg
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'SEG_NEW' FROM customer WHERE c_custkey % 50 = 0
), dim AS (
  SELECT c_custkey, c_mktsegment,
         TIMESTAMP '1990-01-01' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
  FROM customer WHERE c_custkey NOT IN (SELECT k FROM upd)
  UNION ALL
  SELECT c_custkey, c_mktsegment, TIMESTAMP '1990-01-01',
         TIMESTAMP '1995-06-01'
  FROM customer WHERE c_custkey IN (SELECT k FROM upd)
  UNION ALL
  SELECT k, seg, TIMESTAMP '1995-06-01', CAST(NULL AS TIMESTAMP)
  FROM upd
)
SELECT d.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM orders o JOIN dim d
  ON o.o_custkey = d.c_custkey
 AND CAST(o.o_orderdate AS TIMESTAMP) >= d.valid_from
 AND (d.valid_to IS NULL OR CAST(o.o_orderdate AS TIMESTAMP) < d.valid_to)
GROUP BY d.c_mktsegment
"""

ORACLES["unpivot_nation_metrics"] = """
WITH wide AS (
  SELECT c_nationkey,
    CAST(COUNT(*) AS DOUBLE) AS n_cust,
    CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
  FROM customer GROUP BY c_nationkey
)
SELECT c_nationkey, 'n_cust' AS metric, n_cust AS value FROM wide
UNION ALL
SELECT c_nationkey, 'total_bal' AS metric, total_bal AS value FROM wide
"""

ORACLES["data_quality_report"] = """
SELECT 'orders' AS table_name, 'row_count' AS metric, CAST(COUNT(*) AS BIGINT) AS value FROM orders
UNION ALL
SELECT 'orders', 'dup_pk', CAST(COUNT(*) AS BIGINT) FROM (
  SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
UNION ALL
SELECT 'orders', 'orphan_custkey', CAST(COUNT(*) AS BIGINT) FROM orders
  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
UNION ALL
SELECT 'lineitem', 'orphan_orderkey', CAST(COUNT(*) AS BIGINT) FROM lineitem
  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
UNION ALL
SELECT 'orders', 'null_orderdate', CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_orderdate IS NULL
UNION ALL
SELECT 'documents', 'empty_text', CAST(COUNT(*) AS BIGINT) FROM documents WHERE length(trim(text)) = 0
"""

ORACLES["top3_customers_per_nation"] = """
WITH rev AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec
  FROM orders GROUP BY o_custkey
)
SELECT c_nationkey, c_custkey, CAST(rev_dec AS DOUBLE) AS revenue, CAST(rk AS INT) AS rk
FROM (
  SELECT c_nationkey, c_custkey, rev_dec,
    row_number() OVER (PARTITION BY c_nationkey ORDER BY rev_dec DESC, c_custkey) AS rk
  FROM rev JOIN customer ON o_custkey = c_custkey
) t
WHERE rk <= 3
"""

ORACLES["orders_digest_per_customer"] = """
SELECT o_custkey,
  list_aggregate(list_sort(list(CAST(o_orderkey AS VARCHAR))), 'string_agg', ',') AS order_keys,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_custkey < 200
GROUP BY o_custkey
"""

ORACLES["grouping_sets_flags"] = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY GROUPING SETS (
  (l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ()
)
"""

ORACLES["revenue_rollup"] = """
SELECT r_name, n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""

ORACLES["order_status_cube"] = """
SELECT o_orderstatus, o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

ORACLES["pivot_priority_by_status"] = """
SELECT o_orderpriority,
  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_partial
FROM orders
GROUP BY o_orderpriority
"""

ORACLES["set_ops_except_intersect"] = """
WITH y96 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
), y97 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_custkey, 'churned' AS cohort FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
UNION ALL
SELECT o_custkey, 'retained' AS cohort FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
"""

ORACLES["distinct_counts_by_flag"] = """
SELECT l_returnflag,
  COUNT(DISTINCT l_partkey) AS n_parts,
  COUNT(DISTINCT l_suppkey) AS n_supps,
  COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY l_returnflag
"""

ORACLES["sessionization"] = """
WITH lagged AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR (epoch_us(ts) - epoch_us(prev_ts)) > 1800 * 1000000
                 THEN 1 ELSE 0 END AS new_sess
  FROM lagged
), sess AS (
  SELECT *, SUM(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess
GROUP BY user_id, session_idx
"""

# bucketed sessionization is output-identical to the single-window plan —
# the decomposition is a physical rewrite, so it shares the oracle verbatim
ORACLES["sessionization_bucketed"] = ORACLES["sessionization"]

ORACLES["hash_dedup_anti_join"] = """
WITH hashed AS (
  SELECT event_id, sha256(event_type || CAST(event_id AS VARCHAR)) AS hash
  FROM events
), state AS (
  SELECT hash FROM hashed WHERE event_id % 7 = 0
)
SELECT h.event_id, h.hash
FROM hashed h
WHERE NOT EXISTS (SELECT 1 FROM state s WHERE s.hash = h.hash)
"""

ORACLES["lookup_enrich"] = """
SELECT event_id, user_id, event_type, c_name, n_name
FROM events
LEFT JOIN customer ON user_id = c_custkey
LEFT JOIN nation   ON c_nationkey = n_nationkey
"""

ORACLES["interval_containment_join"] = """
WITH r AS (
  SELECT o_orderkey AS rec_id, o_custkey AS cust,
         o_orderdate AS "start", o_orderdate AS "end"
  FROM orders
), a AS (
  SELECT o_custkey AS cust, o_orderdate AS start_wear,
         o_orderdate + INTERVAL 90 DAY AS end_wear, o_orderkey AS assignment_id
  FROM orders
), j AS (
  SELECT r.rec_id, r.cust, r."start", r."end", a.assignment_id,
         row_number() OVER (
           PARTITION BY r.rec_id
           ORDER BY a.start_wear ASC NULLS LAST, a.assignment_id ASC NULLS LAST
         ) AS rn
  FROM r
  LEFT JOIN a ON r.cust = a.cust
    AND date_trunc('day', a.start_wear) <= date_trunc('day', r."start")
    AND date_trunc('day', r."start") <= date_trunc('day', a.end_wear)
    AND date_trunc('day', a.start_wear) <= date_trunc('day', r."end")
    AND date_trunc('day', r."end") <= date_trunc('day', a.end_wear)
)
SELECT rec_id, cust, "start", "end", assignment_id FROM j WHERE rn = 1
"""

ORACLES["interval_containment_join_bucketed"] = ORACLES[
    "interval_containment_join"
]

ORACLES["asof_latest_order"] = """
SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice
FROM events e
LEFT JOIN LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
  ORDER BY o_orderdate DESC, o_orderkey DESC
  LIMIT 1
) o ON TRUE
"""

ORACLES["range_join_windows"] = """
WITH points AS (
  SELECT o_orderkey AS rec_id, o_orderdate AS ts FROM orders
), windows AS (
  SELECT o_orderkey AS window_id, o_orderdate AS w_start,
         o_orderdate + INTERVAL 14 DAY AS w_end
  FROM orders WHERE o_orderkey % 997 = 0
)
SELECT p.rec_id, p.ts, w.window_id, w.w_start, w.w_end
FROM points p JOIN windows w
  ON w.w_start <= p.ts AND p.ts <= w.w_end
"""

_DMP_KEY = (
    "replace(device_id, '-', '') || '-' || replace(patient_id, '-', '') || '-' || "
    "strftime(bucket_start, '%Y%m%d') || '-' || strftime(bucket_end, '%Y%m%d')"
)

ORACLES["day_window_grouping"] = f"""
WITH ev AS (
  SELECT event_id, ts, event_type AS device_id, CAST(user_id AS VARCHAR) AS patient_id,
         date_trunc('day', ts - INTERVAL 43200 SECONDS) AS bucket_start,
         date_trunc('day', ts - INTERVAL 43200 SECONDS) + INTERVAL 1 DAY AS bucket_end
  FROM events
)
SELECT {_DMP_KEY} AS dmp_id,
       COUNT(*) AS n_records, MIN(ts) AS first_ts, MAX(ts) AS last_ts
FROM ev
GROUP BY dmp_id
"""

ORACLES["tumbling_window_hourly"] = """
SELECT event_type,
  date_trunc('hour', ts) AS window_start,
  date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""

ORACLES["day_window_grouping_midnight"] = f"""
WITH ev AS (
  SELECT event_id, ts, event_type AS device_id, CAST(user_id AS VARCHAR) AS patient_id,
         date_trunc('day', ts) AS bucket_start,
         date_trunc('day', ts) AS bucket_end
  FROM events
)
SELECT {_DMP_KEY} AS dmp_id, COUNT(*) AS n_records
FROM ev
GROUP BY dmp_id
"""

ORACLES["json_extract_props"] = """
SELECT event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""

ORACLES["top_bigrams"] = f"""
WITH toks AS (
  SELECT doc_id, {_WORDS} AS t FROM documents
), grams AS (
  SELECT unnest([array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]) AS bigram
  FROM toks WHERE len(t) >= 2
)
SELECT bigram, COUNT(*) AS freq
FROM grams
GROUP BY bigram
ORDER BY freq DESC, bigram ASC
LIMIT 20
"""

ORACLES["lifecycle_worklist"] = """
WITH state AS (
  SELECT event_id, event_type,
    CASE WHEN event_id % 3 = 0 THEN CAST(user_id AS VARCHAR) END AS device_serial,
    CASE WHEN event_id % 6 = 0 THEN 'DEV-' || CAST(user_id AS VARCHAR) END AS device_id
  FROM events
)
SELECT event_id, device_serial
FROM state
WHERE event_type = 'click' AND device_serial IS NOT NULL AND device_id IS NULL
"""

ORACLES["distinct_worklists"] = """
SELECT DISTINCT event_type AS work_key FROM events WHERE value > 50.0
"""

ORACLES["text_stats"] = f"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS chars,
  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS words,
  CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT) AS tokens,
  round(CASE WHEN length(text) = 0 THEN 0.0
        ELSE len(regexp_extract_all(text, '{_PUNCT_RE}'))::DOUBLE / length(text)::DOUBLE END, 6) AS punct_ratio,
  round(CASE WHEN length(trim(text)) = 0 THEN 0.0
        WHEN len(string_split_regex(trim(text), '\\s+')) = 0 THEN 0.0
        ELSE len(regexp_extract_all(lower(text), '{_STOP_RE}'))::DOUBLE
             / len(string_split_regex(trim(text), '\\s+'))::DOUBLE END, 6) AS stopword_ratio
FROM documents
"""


def _quality_score_expr(col: str = "text") -> str:
    """The quality_score column expression (functions/text.py twin) over an
    arbitrary text column — shared by quality_filter and the corpus-prep
    pipeline oracle."""
    wc = rf"CASE WHEN length(trim({col})) = 0 THEN 0 ELSE len(string_split_regex(trim({col}), '\s+')) END"
    sw_hits = f"len(regexp_extract_all(lower({col}), '{_STOP_RE}'))"
    sw = f"(CASE WHEN ({wc}) = 0 THEN 0.0 ELSE ({sw_hits})::DOUBLE / ({wc})::DOUBLE END)"
    pr = f"(CASE WHEN length({col}) = 0 THEN 0.0 ELSE len(regexp_extract_all({col}, '{_PUNCT_RE}'))::DOUBLE / length({col})::DOUBLE END)"
    return (
        f"(CASE WHEN length({col}) BETWEEN 200 AND 20000 THEN 0.4 ELSE 0.0 END)"
        f" + (CASE WHEN {sw} > 0.05 THEN 0.4 ELSE {sw} * 8 END)"
        f" + (CASE WHEN {pr} < 0.1 THEN 0.2 ELSE greatest(0.0, 0.2 - ({pr} - 0.1)) END)"
    )


def _quality_sql() -> str:
    score = _quality_score_expr()
    return f"""
SELECT doc_id, lang, round({score}, 4) AS quality
FROM documents
WHERE round({score}, 4) >= 0.6
"""


ORACLES["quality_filter"] = _quality_sql()


def _lang_id_sql() -> str:
    scores = _lang_scores()
    cols = ", ".join(f"{expr} AS s_{code}" for code, expr in scores.items())
    codes = list(scores.keys())
    total = " + ".join(f"s_{c}" for c in codes)
    greatest = "greatest(" + ", ".join(f"s_{c}" for c in codes) + ")"
    case = " ".join(
        f"WHEN s_{c} = {greatest} THEN '{c}'" for c in codes
    )
    return f"""
WITH scored AS (SELECT doc_id, lang, {cols} FROM documents)
SELECT doc_id, lang,
  CASE WHEN ({total}) = 0 THEN 'und' {case} END AS lang_guess
FROM scored
"""


ORACLES["lang_id"] = _lang_id_sql()

ORACLES["doc_fingerprint"] = f"""
SELECT doc_id, substr(sha256({NORM_TEXT}), 1, 16) AS fingerprint FROM documents
"""

ORACLES["exact_dedup"] = f"""
WITH fp AS (
  SELECT doc_id, sha256({NORM_TEXT}) AS fingerprint FROM documents
)
SELECT MIN(doc_id) AS doc_id, fingerprint, COUNT(*) AS n_dupes
FROM fp GROUP BY fingerprint
"""

ORACLES["ngram_jaccard_pairs"] = f"""
WITH sh AS ({_SHINGLES})
SELECT a.doc_id AS id_a, b.doc_id AS id_b, {_JACCARD} AS jaccard_sim
FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE {_JACCARD} >= 0.2
"""

_MINHASH_CANDS_ALL = """
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
"""

# bucket-representative candidates (dedup.py candidates="star"): every
# bucket member pairs with the bucket's MIN doc id only
_MINHASH_CANDS_STAR = """
  SELECT DISTINCT reps.id_a AS id_a, m.doc_id AS id_b
  FROM banded m
  JOIN (
    SELECT band, band_key, MIN(doc_id) AS id_a
    FROM banded GROUP BY band, band_key
  ) reps
    ON m.band = reps.band AND m.band_key = reps.band_key
   AND m.doc_id > reps.id_a
"""


def _minhash_pairs_sql(cands_sql: str = _MINHASH_CANDS_ALL) -> str:
    return f"""
WITH sh AS ({_SHINGLES}),
hs AS (
  SELECT doc_id, shingles,
         list_transform(shingles,
           s -> ('0x' || substr(sha256(s), 1, 15))::BIGINT % {MERSENNE31}) AS hv
  FROM sh
),
sig AS (
  SELECT doc_id, shingles, {_minhash_sig_sql()} AS mh FROM hs
),
banded AS (
  SELECT doc_id, b.range AS band,
         array_to_string(mh[(b.range * {LSH_ROWS} + 1):(b.range * {LSH_ROWS} + {LSH_ROWS})], ',') AS band_key
  FROM sig, range({LSH_BANDS}) b
),
cands AS ({cands_sql})
SELECT c.id_a, c.id_b, {_JACCARD} AS jaccard_sim
FROM cands c
JOIN sh a ON a.doc_id = c.id_a
JOIN sh b ON b.doc_id = c.id_b
WHERE {_JACCARD} >= 0.2
"""


ORACLES["minhash_near_dup"] = _minhash_pairs_sql()
ORACLES["minhash_near_dup_star"] = _minhash_pairs_sql(_MINHASH_CANDS_STAR)

def _simhash_sql(bits: int = 32) -> str:
    votes = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split({NORM_TEXT}, ' ')) AS t
  FROM documents
), h AS (
  SELECT doc_id, ('0x' || substr(sha256(t), 1, 15))::BIGINT % {MERSENNE31} AS h
  FROM tok
), votes AS (
  SELECT doc_id, {votes}
  FROM h GROUP BY doc_id
)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes
"""


ORACLES["simhash_fingerprint"] = _simhash_sql()

def _simhash_df_filtered_sql(bits: int = 32, max_df_ratio: float = 0.25) -> str:
    votes = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split({NORM_TEXT}, ' ')) AS t
  FROM documents
), rare AS (
  SELECT t FROM tok GROUP BY t
  HAVING COUNT(*) <= CAST({max_df_ratio} * (SELECT COUNT(DISTINCT doc_id) FROM documents) AS BIGINT)
), h AS (
  SELECT doc_id, ('0x' || substr(sha256(tok.t), 1, 15))::BIGINT % {MERSENNE31} AS h
  FROM tok JOIN rare ON tok.t = rare.t
), votes AS (
  SELECT doc_id, {votes}
  FROM h GROUP BY doc_id
)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes
"""


ORACLES["simhash_near_dup"] = f"""
WITH sims AS (
  {_simhash_df_filtered_sql()}
), banded AS (
  SELECT doc_id, simhash, b.range AS band,
         (simhash >> (b.range * 8)) & 255 AS band_key
  FROM sims, range(4) b
), cands AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
         l.simhash AS sa, r.simhash AS sb
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cands
WHERE bit_count(xor(sa, sb)) <= 3
"""

ORACLES["simhash_near_dup_star"] = f"""
WITH sims AS (
  {_simhash_df_filtered_sql()}
), banded AS (
  SELECT doc_id, simhash, b.range AS band,
         (simhash >> (b.range * 8)) & 255 AS band_key
  FROM sims, range(4) b
), cands AS (
  SELECT DISTINCT reps.id_a, m.doc_id AS id_b, reps.sa, m.simhash AS sb
  FROM banded m
  JOIN (
    SELECT band, band_key, MIN(doc_id) AS id_a,
           arg_min(simhash, doc_id) AS sa
    FROM banded GROUP BY band, band_key
  ) reps
    ON m.band = reps.band AND m.band_key = reps.band_key
   AND m.doc_id > reps.id_a
)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cands
WHERE bit_count(xor(sa, sb)) <= 3
"""

ORACLES["dreem_pipeline_e2e"] = """
WITH feed AS (
  SELECT sha256('ORD' || CAST(o_orderkey AS VARCHAR)) AS hash,
         o_orderkey AS rec_id, o_custkey AS cust,
         o_orderdate AS "start", o_orderdate AS "end"
  FROM orders
), state AS (
  SELECT hash FROM feed WHERE rec_id % 7 = 0
), fresh AS (
  SELECT f.* FROM feed f WHERE NOT EXISTS (SELECT 1 FROM state s WHERE s.hash = f.hash)
), enriched AS (
  SELECT f.hash, f.rec_id, f.cust, f."start", f."end",
         c.c_name AS device_serial, n.n_name AS device_id
  FROM fresh f
  LEFT JOIN customer c ON f.cust = c.c_custkey
  LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
), assignments AS (
  SELECT o_custkey AS cust, o_orderdate AS start_wear,
         o_orderdate + INTERVAL 90 DAY AS end_wear,
         'P' || CAST(o_orderkey AS VARCHAR) AS patient_id
  FROM orders
), joined AS (
  SELECT e.*, a.patient_id,
         row_number() OVER (
           PARTITION BY e.hash
           ORDER BY a.start_wear ASC NULLS LAST, a.patient_id ASC NULLS LAST
         ) AS rn
  FROM enriched e
  LEFT JOIN assignments a ON e.cust = a.cust
    AND date_trunc('day', a.start_wear) <= date_trunc('day', e."start")
    AND date_trunc('day', e."start") <= date_trunc('day', a.end_wear)
    AND date_trunc('day', a.start_wear) <= date_trunc('day', e."end")
    AND date_trunc('day', e."end") <= date_trunc('day', a.end_wear)
), resolved AS (
  SELECT * FROM joined WHERE rn = 1 AND patient_id IS NOT NULL
), grouped AS (
  SELECT *,
         date_trunc('day', "start" - INTERVAL 43200 SECONDS) AS bucket_start,
         date_trunc('day', "start" - INTERVAL 43200 SECONDS) + INTERVAL 1 DAY AS bucket_end
  FROM resolved
)
SELECT replace(device_id, '-', '') || '-' || replace(patient_id, '-', '') || '-' ||
       strftime(bucket_start, '%Y%m%d') || '-' || strftime(bucket_end, '%Y%m%d') AS dmp_id,
       COUNT(*) AS n_records,
       MIN("start") AS first_start,
       MAX("end") AS last_end
FROM grouped
GROUP BY dmp_id
"""

ORACLES["incremental_near_dup"] = f"""
WITH pairs AS (
  {ORACLES["minhash_near_dup"]}
)
SELECT CASE WHEN id_a % 5 = 0 THEN id_a ELSE id_b END AS incoming_id,
       CASE WHEN id_a % 5 = 0 THEN id_b ELSE id_a END AS state_id,
       jaccard_sim
FROM pairs
WHERE (id_a % 5 = 0 AND id_b % 5 != 0) OR (id_b % 5 = 0 AND id_a % 5 != 0)
"""

ORACLES["near_dup_clusters"] = f"""
WITH RECURSIVE pairs AS (
  {ORACLES["minhash_near_dup"]}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
)
SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
FROM reach
GROUP BY a
"""

ORACLES["near_dup_clusters_star"] = f"""
WITH RECURSIVE pairs AS (
  {ORACLES["minhash_near_dup_star"]}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
)
SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
FROM reach
GROUP BY a
"""

# unit-normalise once per vector, exactly like the Spark side (x / sqrt(Σx²)
# element-wise), so cosine is a single dot product per pair with matching
# float ops
_UNIT = (
    "list_transform(embedding::DOUBLE[],"
    " x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))"
)

ORACLES["embedding_topk"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, {_UNIT} AS qv FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS neighbor_id, {_UNIT} AS v FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id, round(list_dot_product(qv, v), 6) AS cosine_sim
  FROM c, q WHERE neighbor_id != query_id
), ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""

ORACLES["window_function_suite"] = """
SELECT user_id, event_id,
  lag(event_type) OVER w AS prev_type,
  lead(event_type) OVER w AS next_type,
  CAST(row_number() OVER w AS INT) AS rn,
  CAST(ntile(4) OVER w AS INT) AS quartile,
  cume_dist() OVER w AS cume,
  percent_rank() OVER w AS pct_rank
FROM events
WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

ORACLES["incremental_embedding_near_dup"] = """
WITH pert AS (
  SELECT vec_id + 1000000 AS vec_id,
         [emb0[i] * (1 + 0.001 * (((i - 1) % 7) - 3))
          FOR i IN generate_series(1, len(emb0))] AS emb
  FROM (SELECT vec_id, embedding::DOUBLE[] AS emb0
        FROM embeddings WHERE vec_id % 10 = 0)
), new_side AS (
  SELECT vec_id, list_transform(emb, x -> x / sqrt(list_dot_product(emb, emb))) AS v
  FROM pert
), seen AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS v
  FROM embeddings
)
SELECT n.vec_id AS id_a, s.vec_id AS id_b,
  round(list_dot_product(n.v, s.v), 6) AS cosine_sim
FROM new_side n JOIN seen s ON n.vec_id != s.vec_id
WHERE round(list_dot_product(n.v, s.v), 6) >= 0.95
"""

ORACLES["value_quantiles"] = """
SELECT event_type,
  ROUND(quantile_cont(value, 0.25), 6) AS p25,
  ROUND(quantile_cont(value, 0.5), 6) AS p50,
  ROUND(quantile_cont(value, 0.75), 6) AS p75,
  ROUND(quantile_cont(value, 0.95), 6) AS p95
FROM events
GROUP BY event_type
"""

ORACLES["latest_event_per_user"] = """
SELECT user_id, event_type AS last_type, ts AS last_ts, ROUND(value, 6) AS last_value
FROM (
  SELECT user_id, event_type, ts, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1
"""

ORACLES["salted_dim_join"] = """
SELECT c_nationkey,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(14,6))) AS DOUBLE) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_nationkey
"""

ORACLES["stratified_sample_docs"] = """
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || 's1'), 1, 15))::BIGINT % 10000 <
  CASE lang WHEN 'en' THEN 5000 WHEN 'fr' THEN 2500 WHEN 'de' THEN 2500
            WHEN 'es' THEN 1000 WHEN 'zh' THEN 7500 ELSE 0 END
"""

ORACLES["train_shard_manifest"] = """
WITH h AS (
  SELECT doc_id, lang,
    ('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || 'epoch0|shard'), 1, 15))::BIGINT % 8 AS shard_id,
    ('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || 'epoch0|order'), 1, 15))::BIGINT % 1152921504606846975 AS ok
  FROM documents
)
SELECT doc_id, lang, shard_id,
  CAST(row_number() OVER (PARTITION BY shard_id ORDER BY ok, doc_id) - 1 AS BIGINT) AS shuffle_pos
FROM h
"""

ORACLES["sequence_packing"] = f"""
WITH RECURSIVE toks AS (
  SELECT lang, doc_id,
    CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT) AS tokens,
    CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS rn
  FROM documents
), packed AS (
  SELECT lang, doc_id, tokens, rn,
    CAST(0 AS BIGINT) AS bin_id, CAST(0 AS BIGINT) AS bin_pos, tokens AS cur
  FROM toks WHERE rn = 1
  UNION ALL
  SELECT t.lang, t.doc_id, t.tokens, t.rn,
    CASE WHEN p.cur + t.tokens > 1024 THEN p.bin_id + 1 ELSE p.bin_id END,
    CASE WHEN p.cur + t.tokens > 1024 THEN CAST(0 AS BIGINT) ELSE p.bin_pos + 1 END,
    CASE WHEN p.cur + t.tokens > 1024 THEN t.tokens ELSE p.cur + t.tokens END
  FROM toks t JOIN packed p ON t.lang = p.lang AND t.rn = p.rn + 1
)
SELECT doc_id, lang, tokens, bin_id, bin_pos FROM packed
"""

ORACLES["image_decode_features"] = """
SELECT doc_id,
  CAST(1 + doc_id % 16 AS INT) AS width,
  CAST(1 + doc_id % 9 AS INT) AS height,
  ROUND((0.114*(doc_id % 256) + 0.587*(doc_id % 256) + 0.299*(doc_id % 256)) / 255.0, 6) AS mean_luma
FROM documents
WHERE doc_id < 500
"""

ORACLES["jpeg_decode_features"] = """
SELECT doc_id,
  CAST(1 + doc_id % 13 AS INT) AS width,
  CAST(1 + doc_id % 7 AS INT) AS height,
  ROUND((0.114*((doc_id*37) % 256) + 0.587*((doc_id*37) % 256) + 0.299*((doc_id*37) % 256)) / 255.0, 6) AS mean_luma
FROM documents
WHERE doc_id < 400
"""

ORACLES["png_decode_features"] = """
SELECT doc_id,
  CAST(1 + doc_id % 11 AS INT) AS width,
  CAST(1 + doc_id % 5 AS INT) AS height,
  ROUND((0.114*(doc_id % 256) + 0.587*((doc_id*3) % 256) + 0.299*((doc_id*7) % 256)) / 255.0, 6) AS mean_luma
FROM documents
WHERE doc_id < 400
"""

ORACLES["gif_decode_features"] = """
SELECT doc_id,
  CAST(1 + doc_id % 9 AS INT) AS width,
  CAST(1 + doc_id % 6 AS INT) AS height,
  ROUND((0.114*((doc_id*5) % 256) + 0.587*((doc_id*11) % 256) + 0.299*(doc_id % 256)) / 255.0, 6) AS mean_luma
FROM documents
WHERE doc_id < 400
"""

ORACLES["audio_decode_features"] = """
SELECT doc_id,
  CAST(8000 AS INT) AS sample_rate,
  CAST(1 AS INT) AS n_channels,
  ROUND((400 + (doc_id % 100) * 8) / 8000.0, 6) AS duration_s,
  ROUND(ROUND((doc_id % 100) / 200.0 * 32767) / 32768.0, 6) AS rms,
  ROUND(ROUND((doc_id % 100) / 200.0 * 32767) / 32768.0, 6) AS peak
FROM documents
WHERE doc_id < 300
"""

# FLAC square wave ±a: lossless decode, even sample count → RMS = peak =
# round(a·32767)/32768 exactly (same quantisation grid as the WAV check).
ORACLES["flac_audio_features"] = """
SELECT doc_id,
  CAST(8000 AS INT) AS sample_rate,
  CAST(1 AS INT) AS n_channels,
  ROUND((800 + (doc_id % 50) * 16) / 8000.0, 6) AS duration_s,
  ROUND(ROUND((doc_id % 100) / 200.0 * 32767) / 32768.0, 6) AS rms,
  ROUND(ROUND((doc_id % 100) / 200.0 * 32767) / 32768.0, 6) AS peak
FROM documents
WHERE doc_id < 200
"""

ORACLES["g711_audio_features"] = """
WITH g AS (
  SELECT doc_id,
    255 - (doc_id % 256) AS u,
    160 + (doc_id % 50) * 8 AS n
  FROM documents WHERE doc_id < 300
), e AS (
  SELECT doc_id, n,
    (((u % 16) * 8 + 132) * POWER(2, (u // 16) % 8) - 132)
      * (CASE WHEN u >= 128 THEN -1 ELSE 1 END) AS val
  FROM g
)
SELECT doc_id,
  CAST(8000 AS INT) AS sample_rate,
  CAST(1 AS INT) AS n_channels,
  ROUND(n / 8000.0, 6) AS duration_s,
  ROUND(ABS(val) / 32768.0, 6) AS rms,
  ROUND(ABS(val) / 32768.0, 6) AS peak
FROM e
"""

ORACLES["multimodal_metadata"] = """
WITH binm AS (
  SELECT doc_id,
    unhex(CASE WHEN doc_id % 4 = 0 THEN 'ffd8ff'
               WHEN doc_id % 4 = 1 THEN '89504e47'
               WHEN doc_id % 4 = 2 THEN '494433'
               ELSE '' END) || encode(text) AS content
  FROM documents
)
SELECT doc_id,
  CASE WHEN doc_id % 4 = 0 THEN 'image/jpeg'
       WHEN doc_id % 4 = 1 THEN 'image/png'
       WHEN doc_id % 4 = 2 THEN 'audio/mp3'
       ELSE 'application/octet-stream' END AS media_type,
  octet_length(content) AS n_bytes,
  sha256(lower(hex(content))) AS checksum_hex
FROM binm
"""

ORACLES["salted_event_counts"] = """
SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY event_type
"""

# Same planted-duplicate augmentation as queries._augmented_embeddings, then
# brute-force exact pairs — the grid-blocked Spark plan must reproduce this
# bit-for-bit (recall 1.0 by construction).
ORACLES["embedding_near_dup"] = """
WITH aug AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         [emb0[i] * (1 + 0.001 * (((i - 1) % 7) - 3))
          FOR i IN generate_series(1, len(emb0))]
  FROM (SELECT vec_id, embedding::DOUBLE[] AS emb0
        FROM embeddings WHERE vec_id % 10 = 0)
), e AS (
  SELECT vec_id,
         list_transform(emb, x -> x / sqrt(list_dot_product(emb, emb))) AS v
  FROM aug
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_dot_product(a.v, b.v), 6) AS cosine_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v), 6) >= 0.95
"""


# Star posture of embedding_near_dup (r9): same augmentation and unit
# vectors, then the star semantics replayed literally — full-dimension fine
# quantization floor(v_i / r) at r = sqrt(2 - 2*0.95) (sqrt is correctly
# rounded in IEEE 754, so the SQL-computed r equals the Python-computed
# literal the Spark plan carries), min-id representative per fine group,
# verified member→rep pairs, then the normal 3-dim grid all-pairs over the
# representatives only.
ORACLES["embedding_near_dup_star"] = """
WITH aug AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         [emb0[i] * (1 + 0.001 * (((i - 1) % 7) - 3))
          FOR i IN generate_series(1, len(emb0))]
  FROM (SELECT vec_id, embedding::DOUBLE[] AS emb0
        FROM embeddings WHERE vec_id % 10 = 0)
), e AS (
  SELECT vec_id,
         list_transform(emb, x -> x / sqrt(list_dot_product(emb, emb))) AS v
  FROM aug
), fine AS (
  SELECT vec_id, v,
         array_to_string(
           list_transform(v, x ->
             CAST(CAST(floor(x / sqrt(2 - 2 * 0.95)) AS BIGINT) AS VARCHAR)),
           ':') AS fk
  FROM e
), reps AS (
  SELECT fk, min(vec_id) AS rid FROM fine GROUP BY fk
), reps_v AS (
  SELECT r.fk, r.rid, f.v AS rv,
         CAST(floor(f.v[1] / sqrt(2 - 2 * 0.95)) AS BIGINT) AS c0,
         CAST(floor(f.v[2] / sqrt(2 - 2 * 0.95)) AS BIGINT) AS c1,
         CAST(floor(f.v[3] / sqrt(2 - 2 * 0.95)) AS BIGINT) AS c2
  FROM reps r JOIN fine f ON f.vec_id = r.rid
), intra AS (
  SELECT rp.rid AS id_a, m.vec_id AS id_b,
         round(list_dot_product(rp.rv, m.v), 6) AS cosine_sim
  FROM fine m JOIN reps_v rp ON m.fk = rp.fk
  WHERE m.vec_id > rp.rid
    AND round(list_dot_product(rp.rv, m.v), 6) >= 0.95
), offs AS (
  SELECT o0, o1, o2
  FROM (VALUES (-1), (0), (1)) t0(o0),
       (VALUES (-1), (0), (1)) t1(o1),
       (VALUES (-1), (0), (1)) t2(o2)
), cross_pairs AS (
  SELECT a.rid AS id_a, b.rid AS id_b,
         round(list_dot_product(a.rv, b.rv), 6) AS cosine_sim
  FROM reps_v a
  JOIN offs ON TRUE
  JOIN reps_v b
    ON b.c0 = a.c0 + o0 AND b.c1 = a.c1 + o1 AND b.c2 = a.c2 + o2
  WHERE a.rid < b.rid
    AND round(list_dot_product(a.rv, b.rv), 6) >= 0.95
)
SELECT id_a, id_b, cosine_sim FROM intra
UNION ALL
SELECT id_a, id_b, cosine_sim FROM cross_pairs
"""


# Corpus hygiene (§2.13): eval-set 4-gram overlap, the same slice arithmetic
# as queries.decontaminate_ngrams (i runs so every gram has exactly 4 tokens).
ORACLES["decontaminate_ngrams"] = f"""
WITH tok AS (
  SELECT doc_id, source, string_split({NORM_TEXT}, ' ') AS t FROM documents
), grams AS (
  SELECT DISTINCT doc_id, source,
    unnest([array_to_string(t[i:i+3], ' ') for i in range(1, len(t) - 2)]) AS g
  FROM tok
), eval_g AS (
  SELECT DISTINCT g FROM grams WHERE source = 'src0'
), corpus AS (
  SELECT doc_id, g FROM grams WHERE source <> 'src0'
), tot AS (
  SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id
), hit AS (
  SELECT doc_id, COUNT(*) AS n_hits
  FROM corpus JOIN eval_g USING (g) GROUP BY doc_id
)
SELECT h.doc_id, CAST(n_hits AS BIGINT) AS n_hits,
  CAST(n_grams AS BIGINT) AS n_grams,
  ROUND(CAST(n_hits AS DOUBLE) / n_grams, 6) AS hit_ratio
FROM hit h JOIN tot t ON h.doc_id = t.doc_id
ORDER BY h.doc_id
"""

# Gopher repetition signals; ties break on the lexicographically smallest
# token in BOTH engines (row_number ORDER BY c DESC, token ASC).
ORACLES["repetition_stats"] = f"""
WITH tok AS (
  SELECT doc_id, string_split({NORM_TEXT}, ' ') AS t FROM documents
), words AS (
  SELECT doc_id, unnest(t) AS w FROM tok
), base AS (
  SELECT doc_id, COUNT(*) AS n_words, COUNT(DISTINCT w) AS n_distinct
  FROM words GROUP BY doc_id
), wc AS (
  SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
), topw AS (
  SELECT doc_id, w AS top_word, c AS wcnt FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY c DESC, w ASC) AS rn FROM wc
  ) WHERE rn = 1
), bg AS (
  SELECT doc_id,
    unnest([array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]) AS b
  FROM tok
), bc AS (
  SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b
), topb AS (
  SELECT doc_id, b AS top_bigram, c AS bcnt FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY c DESC, b ASC) AS rn FROM bc
  ) WHERE rn = 1
)
SELECT base.doc_id, CAST(n_words AS BIGINT) AS n_words,
  CAST(n_distinct AS BIGINT) AS n_distinct,
  ROUND(CAST(n_distinct AS DOUBLE) / n_words, 6) AS distinct_ratio,
  top_word, ROUND(CAST(wcnt AS DOUBLE) / n_words, 6) AS top_word_frac,
  top_bigram,
  CASE WHEN n_words > 1
       THEN ROUND(CAST(bcnt AS DOUBLE) / (n_words - 1), 6) END AS top_bigram_frac
FROM base JOIN topw USING (doc_id) LEFT JOIN topb USING (doc_id)
ORDER BY base.doc_id
"""

# α=0.5 temperature resampling: rate_l = sqrt(cnt_min/cnt_l) (normaliser
# cancels — no cross-row float sums), acceptance via the repo-standard
# sha256 bucket. Same salt ('temp0') and modulus as the Spark side.
ORACLES["lang_temperature_sample"] = """
WITH cnt AS (
  SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang
), rates AS (
  SELECT lang, sqrt(CAST((SELECT MIN(c) FROM cnt) AS DOUBLE) / c) AS r
  FROM cnt
)
SELECT d.doc_id, d.lang, ROUND(r, 6) AS sample_rate
FROM documents d JOIN rates USING (lang)
WHERE ('0x' || substr(sha256(d.doc_id::VARCHAR || 'temp0'), 1, 15))::BIGINT
      % 1000000 < floor(r * 1000000)
ORDER BY d.doc_id
"""


def _zorder_sql(bits: int = 8) -> str:
    n = (1 << bits) - 1
    terms = " | ".join(
        f"(((zx >> {b}) & 1) << {2 * b}) | (((zy >> {b}) & 1) << {2 * b + 1})"
        for b in range(bits)
    )
    def bucket(col: str, lo: float, hi: float) -> str:
        return (
            f"CAST(GREATEST(0, LEAST({n}, FLOOR((CAST({col} AS DOUBLE) - {lo})"
            f" / ({hi} - {lo}) * {n + 1}))) AS BIGINT)"
        )
    return f"""
WITH b AS (
  SELECT event_id, user_id, value,
    {bucket('user_id', 0.0, 150.0)} AS zx,
    {bucket('value', 0.0, 500.0)} AS zy
  FROM events
)
SELECT event_id, user_id, value, CAST({terms} AS BIGINT) AS z_key
FROM b ORDER BY event_id
"""


# Morton curve: same bucket arithmetic and bit interleave as
# queries.zorder_curve_q / operators/layout.py.
ORACLES["zorder_curve"] = _zorder_sql()


# VARIANT extraction twin: DuckDB parses the same JSON path; integer k sums
# stay BIGINT on both sides.
ORACLES["variant_props_stats"] = """
SELECT CAST(user_id // 10 AS BIGINT) AS user_decade,
  COUNT(*) AS n_events,
  COUNT(json_extract_string(props, '$.k')) AS n_with_k,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY user_decade
ORDER BY user_decade
"""


# BSEQ frame sampling: frames j in [0, 1 + doc_id % 3), kept when j % 2 = 0;
# same dim/level arithmetic and Rec.601 float math as the Spark synthesis.
ORACLES["video_frame_sample"] = """
SELECT doc_id,
  CAST(j AS INT) AS frame_idx,
  CAST(2 + (doc_id + j) % 5 AS INT) AS width,
  CAST(1 + (doc_id + j) % 4 AS INT) AS height,
  ROUND((0.114*((doc_id*7 + j*13) % 256)
       + 0.587*((doc_id*7 + j*13) % 256)
       + 0.299*((doc_id*7 + j*13) % 256)) / 255.0, 6) AS mean_luma
FROM documents, LATERAL unnest(generate_series(0, doc_id % 3, 2)) AS g(j)
WHERE doc_id < 400
ORDER BY doc_id, frame_idx
"""


ORACLES["avi_frame_sample"] = """
SELECT doc_id,
  CAST(j AS INT) AS frame_idx,
  CAST(2 + doc_id % 6 AS INT) AS width,
  CAST(1 + doc_id % 4 AS INT) AS height,
  ROUND((0.114*((doc_id*11 + j*29) % 256)
       + 0.587*((doc_id*11 + j*29) % 256)
       + 0.299*((doc_id*11 + j*29) % 256)) / 255.0, 6) AS mean_luma
FROM documents, LATERAL unnest(generate_series(0, doc_id % 3, 2)) AS g(j)
WHERE doc_id < 300
ORDER BY doc_id, frame_idx
"""


# M-JPEG AVI: flat q=8 JPEG frames decode exactly, so the same
# generate_series replay predicts the decoded luma bit-for-bit.
ORACLES["avi_mjpeg_frame_sample"] = """
SELECT doc_id,
  CAST(j AS INT) AS frame_idx,
  CAST(2 + doc_id % 6 AS INT) AS width,
  CAST(1 + doc_id % 4 AS INT) AS height,
  ROUND((0.114*((doc_id*17 + j*23) % 256)
       + 0.587*((doc_id*17 + j*23) % 256)
       + 0.299*((doc_id*17 + j*23) % 256)) / 255.0, 6) AS mean_luma
FROM documents, LATERAL unnest(generate_series(0, doc_id % 3, 2)) AS g(j)
WHERE doc_id < 200
ORDER BY doc_id, frame_idx
"""


# Deterministic 80/10/10 split: same sha256-bucket recipe (salt 'split0').
# Efraimidis-Spirakis weighted sample: sha256-uniform u, quantized -ln(u)
# micro-units over quantized weight — the sort key is one IEEE division of
# two exact integers, so the sampled SET (not just its size) replays.
ORACLES["weighted_doc_sample"] = """
WITH keyed AS (
  SELECT doc_id,
    CAST(GREATEST(length(text), 1) AS DOUBLE) AS weight,
    round(-ln((('0x' || substr(sha256(doc_id::VARCHAR || 'ws0'), 1, 15))::BIGINT
               + 1) / 1152921504606846976.0) * 1e6)
      / round(CAST(GREATEST(length(text), 1) AS DOUBLE) * 1e6) AS es_key
  FROM documents
), ranked AS (
  SELECT doc_id, weight, es_key,
    CAST(row_number() OVER (ORDER BY es_key ASC, doc_id ASC) AS INT) AS rank
  FROM keyed
)
SELECT doc_id, weight, round(es_key, 6) AS es_key, rank
FROM ranked WHERE rank <= 100
"""

# Leakage-safe splits: the recursive-CTE component labels composed with
# the same sha256 bucket rule, applied to the representative instead of
# the doc id — every per-doc assignment is value-checked.
ORACLES["leakage_safe_splits"] = f"""
WITH RECURSIVE pairs AS (
  {ORACLES["minhash_near_dup"]}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
), reach AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
), cl AS (
  SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a
), rep AS (
  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS rep
  FROM documents d LEFT JOIN cl USING (doc_id)
)
SELECT doc_id, rep,
  CASE WHEN ('0x' || substr(sha256(rep::VARCHAR || 'split0'), 1, 15))::BIGINT
            % 100 < 80 THEN 'train'
       WHEN ('0x' || substr(sha256(rep::VARCHAR || 'split0'), 1, 15))::BIGINT
            % 100 < 90 THEN 'val'
       ELSE 'test' END AS split
FROM rep
"""

ORACLES["dataset_splits"] = """
WITH b AS (
  SELECT lang,
    ('0x' || substr(sha256(doc_id::VARCHAR || 'split0'), 1, 15))::BIGINT % 100 AS bk
  FROM documents
)
SELECT CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val' ELSE 'test' END AS split,
  lang, COUNT(*) AS n_docs
FROM b GROUP BY split, lang ORDER BY split, lang
"""


# Length-curriculum packing: same next-fit fold as sequence_packing but in
# (n_chars, doc_id) order and 512-token bins.
ORACLES["curriculum_packing"] = f"""
WITH RECURSIVE toks AS (
  SELECT lang, doc_id,
    CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT) AS tokens,
    CAST(row_number() OVER (
      PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS rn
  FROM documents
), packed AS (
  SELECT lang, doc_id, tokens, rn,
    CAST(0 AS BIGINT) AS bin_id, CAST(0 AS BIGINT) AS bin_pos, tokens AS cur
  FROM toks WHERE rn = 1
  UNION ALL
  SELECT t.lang, t.doc_id, t.tokens, t.rn,
    CASE WHEN p.cur + t.tokens > 512 THEN p.bin_id + 1 ELSE p.bin_id END,
    CASE WHEN p.cur + t.tokens > 512 THEN CAST(0 AS BIGINT) ELSE p.bin_pos + 1 END,
    CASE WHEN p.cur + t.tokens > 512 THEN t.tokens ELSE p.cur + t.tokens END
  FROM toks t JOIN packed p ON t.lang = p.lang AND t.rn = p.rn + 1
)
SELECT doc_id, lang, tokens, bin_id, bin_pos FROM packed
"""


# BM25 twin: identical operand order everywhere (see operators/retrieval.py
# float discipline); ln is the one transcendental, absorbed by ROUND 6.
ORACLES["bm25_retrieval"] = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({NORM_TEXT}, ' ')) AS t FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), stats AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, COUNT(*) AS n_docs FROM dl
), tf AS (
  SELECT doc_id, t, COUNT(*) AS tf FROM tok
  WHERE t IN ('join','query','spark','table','window')
  GROUP BY doc_id, t
), dfreq AS (
  SELECT t, COUNT(*) AS df FROM tf GROUP BY t
), per AS (
  SELECT tf.doc_id, tf.t,
    ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * tf.tf /
      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS ts
  FROM tf JOIN dfreq d USING (t) JOIN dl USING (doc_id), stats s
)
SELECT doc_id, COUNT(*) AS n_terms_hit,
  ROUND(
    COALESCE(SUM(CASE WHEN t='join' THEN ts END), 0)
    + COALESCE(SUM(CASE WHEN t='query' THEN ts END), 0)
    + COALESCE(SUM(CASE WHEN t='spark' THEN ts END), 0)
    + COALESCE(SUM(CASE WHEN t='table' THEN ts END), 0)
    + COALESCE(SUM(CASE WHEN t='window' THEN ts END), 0), 6) AS score
FROM per GROUP BY doc_id ORDER BY doc_id
"""

def _mmr_sql(k: int = 10, pool: int = 30, lam_num: int = 1, lam_den: int = 2) -> str:
    """MMR greedy trajectory replayed as k unrolled CTEs (REPRO.md pattern
    8): sel1 is the pure-relevance argmax; each sel{t} anti-joins the
    already-selected set, computes max selected-similarity per survivor
    from the precomputed candidate-pair table, and picks the integer-score
    argmax with the same (score DESC, id ASC) tie order as the engine."""
    lm = lam_den - lam_num
    sels = [
        "sel1 AS MATERIALIZED (SELECT query_id, neighbor_id, rel_fp,"
        " 1 AS mmr_rank FROM cand WHERE rn = 1)"
    ]
    for t in range(2, k + 1):
        prev = f"sel{t - 1}"
        sels.append(f"""win{t} AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel_fp, {t} AS mmr_rank FROM (
    SELECT c.query_id, c.neighbor_id, c.rel_fp,
      row_number() OVER (PARTITION BY c.query_id
        ORDER BY {lam_num} * c.rel_fp - {lm} * m.maxsim_fp DESC,
                 c.neighbor_id ASC) AS rw
    FROM cand c
    JOIN (SELECT p.query_id, p.a, MAX(p.sim_fp) AS maxsim_fp
          FROM pairs p JOIN {prev} s
            ON p.query_id = s.query_id AND p.b = s.neighbor_id
          GROUP BY p.query_id, p.a) m
      ON m.query_id = c.query_id AND m.a = c.neighbor_id
    WHERE NOT EXISTS (SELECT 1 FROM {prev} s2
                      WHERE s2.query_id = c.query_id
                        AND s2.neighbor_id = c.neighbor_id)
  ) WHERE rw = 1)""")
        sels.append(
            f"sel{t} AS MATERIALIZED (SELECT * FROM {prev}"
            f" UNION ALL SELECT * FROM win{t})"
        )
    union = f"SELECT * FROM sel{k}"
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, {_UNIT} AS qv FROM embeddings WHERE vec_id < 5
), c0 AS (
  SELECT vec_id AS neighbor_id, {_UNIT} AS v FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id, v,
    CAST(round(list_dot_product(qv, v) * 1000000) AS BIGINT) AS rel_fp
  FROM c0, q WHERE neighbor_id != query_id
), cand AS MATERIALIZED (
  SELECT * FROM (
    SELECT query_id, neighbor_id, rel_fp, v,
      CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY rel_fp DESC, neighbor_id ASC) AS INT) AS rn
    FROM scored)
  WHERE rn <= {pool}
), pairs AS MATERIALIZED (
  SELECT a.query_id, a.neighbor_id AS a, b.neighbor_id AS b,
    CAST(round(list_dot_product(a.v, b.v) * 1000000) AS BIGINT) AS sim_fp
  FROM cand a JOIN cand b
    ON a.query_id = b.query_id AND a.neighbor_id != b.neighbor_id
), {",".join(sels)}
SELECT query_id, neighbor_id, CAST(mmr_rank AS INT) AS mmr_rank,
  (rel_fp :: DOUBLE) / 1000000.0 AS relevance
FROM ({union})
ORDER BY query_id, mmr_rank
"""


ORACLES["mmr_diversified_topk"] = _mmr_sql(k=10, pool=30)

# RRF hybrid retrieval: BM25 CTE chain + unit-vector cosine to probe 0,
# each row_number-ranked (score DESC, id ASC — the same total order as
# global_rank) and truncated to top-100; fused with the fixed-order
# 1/(60+rank) sum. Rank columns are INTs on both engines.
ORACLES["hybrid_retrieval_rrf"] = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({NORM_TEXT}, ' ')) AS t FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), stats AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, COUNT(*) AS n_docs FROM dl
), tf AS (
  SELECT doc_id, t, COUNT(*) AS tf FROM tok
  WHERE t IN ('join','query','spark','table','window')
  GROUP BY doc_id, t
), dfreq AS (
  SELECT t, COUNT(*) AS df FROM tf GROUP BY t
), per AS (
  SELECT tf.doc_id, tf.t,
    ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * tf.tf /
      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS ts
  FROM tf JOIN dfreq d USING (t) JOIN dl USING (doc_id), stats s
), bm AS (
  SELECT doc_id,
    ROUND(
      COALESCE(SUM(CASE WHEN t='join' THEN ts END), 0)
      + COALESCE(SUM(CASE WHEN t='query' THEN ts END), 0)
      + COALESCE(SUM(CASE WHEN t='spark' THEN ts END), 0)
      + COALESCE(SUM(CASE WHEN t='table' THEN ts END), 0)
      + COALESCE(SUM(CASE WHEN t='window' THEN ts END), 0), 6) AS score
  FROM per GROUP BY doc_id
), bmr AS (
  SELECT doc_id,
    CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT)
      AS rank_bm25
  FROM bm QUALIFY rank_bm25 <= 100
), qv AS (
  SELECT {_UNIT} AS qv FROM embeddings WHERE vec_id = 0
), cosd AS (
  SELECT vec_id AS doc_id,
    round(list_dot_product({_UNIT}, q.qv), 6) AS score
  FROM embeddings, qv q WHERE vec_id != 0
), cr AS (
  SELECT doc_id,
    CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT)
      AS rank_cos
  FROM cosd QUALIFY rank_cos <= 100
)
SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id, b.rank_bm25, c.rank_cos,
  ROUND(COALESCE(1.0/(60.0 + rank_bm25), 0.0)
      + COALESCE(1.0/(60.0 + rank_cos), 0.0), 6) AS rrf_score
FROM bmr b FULL OUTER JOIN cr c ON b.doc_id = c.doc_id
"""

# Heavy hitters: the Spark side accelerates with a count-min sketch, but the
# exact verify pass makes its OUTPUT a plain relative-threshold GROUP BY —
# integer threshold arithmetic (freq * 500 >= total) is exact in any engine.
ORACLES["token_heavy_hitters"] = f"""
WITH toks AS (
  SELECT unnest({_WORDS}) AS token FROM documents
), tot AS (
  SELECT COUNT(*) AS total FROM toks
)
SELECT token, COUNT(*) AS freq
FROM toks, tot
GROUP BY token, tot.total
HAVING COUNT(*) * 500 >= tot.total
"""

# tf-idf twin: integer tf/df/n_docs; one ln per (doc, term); both engines
# rank the ROUNDED score with a term tie-break, so orderings agree.
ORACLES["tfidf_top_terms"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({_WORDS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
    ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 6) AS score
  FROM tf JOIN dfreq d USING (term), n
), ranked AS (
  SELECT doc_id, term, tf, score,
    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term)
         AS INTEGER) AS term_rank
  FROM scored
)
SELECT doc_id, term, tf, score, term_rank FROM ranked WHERE term_rank <= 5
"""

# Bigram-LM add-1 perplexity twin: integer counts, fixed-point (1e-6 grid)
# log-prob quantized to BIGINT before the per-doc sum — the sum is an
# associative integer reduction, identical in any engine; the final exp/round
# runs on identical inputs.
ORACLES["ngram_lm_perplexity"] = f"""
WITH toks AS (
  SELECT doc_id, {_WORDS} AS t FROM documents
), g2 AS (
  SELECT doc_id, g['ctx'] AS ctx, g['w'] AS w
  FROM (
    SELECT doc_id,
      unnest([{{'ctx': t[i], 'w': t[i+1]}} for i in range(1, len(t))]) AS g
    FROM toks WHERE len(t) >= 2
  )
), nc AS (
  SELECT ctx, w, COUNT(*) AS c_nw FROM g2 GROUP BY ctx, w
), cc AS (
  SELECT ctx, COUNT(*) AS c_ctx FROM g2 GROUP BY ctx
), v AS (
  SELECT COUNT(DISTINCT w) AS n_vocab
  FROM (SELECT unnest({_WORDS}) AS w FROM documents)
), scored AS (
  SELECT g2.doc_id,
    CAST(ROUND((LN(COALESCE(nc.c_nw, 0) + 1)
                - LN(COALESCE(cc.c_ctx, 0) + v.n_vocab)) * 1000000)
         AS BIGINT) AS lp
  FROM g2 LEFT JOIN nc USING (ctx, w) LEFT JOIN cc USING (ctx), v
), agg AS (
  SELECT doc_id, COUNT(*) AS n_ngrams, SUM(lp) AS s FROM scored GROUP BY doc_id
)
SELECT doc_id, n_ngrams,
  CAST(ROUND(CAST(s AS DOUBLE) / n_ngrams) AS BIGINT) / 1000000.0
    AS avg_logprob,
  ROUND(EXP(-(CAST(s AS DOUBLE) / 1000000 / n_ngrams)), 4) AS perplexity
FROM agg
"""

# Span-level exact dedup twin: 20-word non-overlapping spans, first
# occurrence by (doc_id, span_idx) wins; sha256 agrees across engines and
# the dup ratio is an integer-derived division.
ORACLES["span_dedup"] = f"""
WITH toks AS (
  SELECT doc_id, {_WORDS} AS t FROM documents
), spans AS (
  SELECT doc_id, sp['span_idx'] AS span_idx,
    sha256(sp['span_text']) AS span_hash
  FROM (
    SELECT doc_id,
      unnest([{{'span_idx': CAST(s AS BIGINT),
                'span_text': array_to_string(t[s*20+1 : s*20+20], ' ')}}
              for s in range(0, CAST(floor((len(t)-1)/20) AS BIGINT) + 1)]) AS sp
    FROM toks
  )
), flagged AS (
  SELECT doc_id,
    CASE WHEN ROW_NUMBER() OVER (
      PARTITION BY span_hash ORDER BY doc_id, span_idx) > 1
    THEN 1 ELSE 0 END AS is_dup
  FROM spans
)
SELECT doc_id, COUNT(*) AS n_spans, CAST(SUM(is_dup) AS BIGINT) AS n_dup_spans,
  CAST(SUM(is_dup) AS DOUBLE) / COUNT(*) AS dup_ratio
FROM flagged
GROUP BY doc_id
"""

# M-JPEG MP4: flat q=8 JPEG frames decode exactly; same generate_series
# replay as the AVI leg but over the BMFF sample-table demux path.
ORACLES["mp4_frame_sample"] = """
SELECT doc_id,
  CAST(j AS INT) AS frame_idx,
  CAST(2 + doc_id % 5 AS INT) AS width,
  CAST(1 + doc_id % 3 AS INT) AS height,
  ROUND((0.114*((doc_id*13 + j*29) % 256)
       + 0.587*((doc_id*13 + j*29) % 256)
       + 0.299*((doc_id*13 + j*29) % 256)) / 255.0, 6) AS mean_luma
FROM documents, LATERAL unnest(generate_series(0, doc_id % 4, 2)) AS g(j)
WHERE doc_id < 200
ORDER BY doc_id, frame_idx
"""

# mp4v (MPEG-4 Part 2 intra) leg: qp=4 puts dc_scaler at 8, so the DC of a
# flat block quantizes losslessly and the decoded frame equals the input —
# the same closed-form replay as the M-JPEG leg, over the real bitstream
# decoder (VLC tables + DC prediction + dequant + IDCT).
ORACLES["mp4v_frame_sample"] = """
SELECT doc_id,
  CAST(j AS INT) AS frame_idx,
  CAST(2 + doc_id % 5 AS INT) AS width,
  CAST(1 + doc_id % 3 AS INT) AS height,
  ROUND((0.114*((doc_id*13 + j*29) % 256)
       + 0.587*((doc_id*13 + j*29) % 256)
       + 0.299*((doc_id*13 + j*29) % 256)) / 255.0, 6) AS mean_luma
FROM documents, LATERAL unnest(generate_series(0, doc_id % 4, 2)) AS g(j)
WHERE doc_id < 200
ORDER BY doc_id, frame_idx
"""

# Index-only MP4 metadata: codec/geometry/frames/duration are all exact
# integers (duration = n_frames/25 at media timescale 25).
ORACLES["mp4_stream_info"] = """
SELECT doc_id,
  'jpeg' AS codec,
  CAST(2 + doc_id % 5 AS INT) AS width,
  CAST(1 + doc_id % 3 AS INT) AS height,
  CAST(1 + doc_id % 4 AS INT) AS n_frames,
  CAST(1 + doc_id % 4 AS DOUBLE) / 25 AS duration_s
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
"""

# MP3 framing arithmetic replay: every field of the header walk is exact
# integer arithmetic (frame length = floor(144|72 * br / rate), duration =
# n * spf / rate) — the walker's ID3 skip, version/LSF handling and
# truncation rules all mismatch if wrong.
ORACLES["mp3_stream_info"] = """
WITH p AS (
  SELECT doc_id,
    doc_id % 4 AS m,
    CAST(5 + doc_id % 20 AS INT) AS n_frames,
    CASE doc_id % 4 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                    WHEN 2 THEN 32000 ELSE 22050 END AS rate,
    CASE doc_id % 4 WHEN 0 THEN 128 WHEN 1 THEN 192
                    WHEN 2 THEN 320 ELSE 64 END AS br,
    CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 2 END AS channels
  FROM documents WHERE doc_id < 300
), q AS (
  SELECT *,
    CASE WHEN m = 3 THEN '2' ELSE '1' END AS version,
    CASE WHEN m = 3 THEN 576 ELSE 1152 END AS spf,
    CASE WHEN m = 3 THEN (72 * br * 1000) // rate
         ELSE (144 * br * 1000) // rate END AS flen
  FROM p
)
SELECT doc_id, version, CAST(3 AS INT) AS layer,
  CAST(rate AS INT) AS sample_rate, CAST(channels AS INT) AS channels,
  n_frames,
  ROUND(CAST(n_frames * spf AS DOUBLE) / rate, 6) AS duration_s,
  CAST(br AS INT) AS nominal_bitrate_kbps,
  ROUND(CAST(n_frames * flen * 8 AS DOUBLE)
        / (CAST(n_frames * spf AS DOUBLE) / rate) / 1000, 6) AS avg_bitrate_kbps,
  'CBR' AS mode,
  doc_id % 3 = 0 AS has_id3v2,
  doc_id % 5 = 0 AS has_id3v1,
  CAST(n_frames * flen AS BIGINT) AS audio_bytes
FROM q
ORDER BY doc_id
"""

# Interpolated Kneser-Ney twin: all counts integer aggregates; the float
# tree (d=0.75 binary-exact) is written with identical association on both
# sides; per-doc sum in fixed-point BIGINTs.
ORACLES["kneser_ney_perplexity"] = f"""
WITH toks AS (
  SELECT doc_id, {_WORDS} AS t FROM documents
), g2 AS (
  SELECT doc_id, g['ctx'] AS ctx, g['w'] AS w
  FROM (
    SELECT doc_id,
      unnest([{{'ctx': t[i], 'w': t[i+1]}} for i in range(1, len(t))]) AS g
    FROM toks WHERE len(t) >= 2
  )
), nc AS (
  SELECT ctx, w, COUNT(*) AS c_nw FROM g2 GROUP BY ctx, w
), cc AS (
  SELECT ctx, COUNT(*) AS c_ctx FROM g2 GROUP BY ctx
), n1pc AS (
  SELECT ctx, COUNT(*) AS n1p_ctx FROM nc GROUP BY ctx
), n1pl AS (
  SELECT w, COUNT(*) AS n1p_left FROM nc GROUP BY w
), nt AS (
  SELECT COUNT(*) AS n_types FROM nc
), v AS (
  SELECT COUNT(DISTINCT w) AS n_vocab
  FROM (SELECT unnest({_WORDS}) AS w FROM documents)
), scored AS (
  SELECT g2.doc_id,
    CAST(ROUND(LN(
      CASE WHEN COALESCE(cc.c_ctx, 0) > 0 THEN
        (GREATEST(CAST(COALESCE(nc.c_nw, 0) AS DOUBLE) - 0.75, 0.0)
         / CAST(cc.c_ctx AS DOUBLE))
        + ((0.75 * CAST(COALESCE(n1pc.n1p_ctx, 0) AS DOUBLE))
           / CAST(cc.c_ctx AS DOUBLE))
          * (CAST(COALESCE(n1pl.n1p_left, 0) + 1 AS DOUBLE)
             / CAST(nt.n_types + v.n_vocab AS DOUBLE))
      ELSE
        CAST(COALESCE(n1pl.n1p_left, 0) + 1 AS DOUBLE)
        / CAST(nt.n_types + v.n_vocab AS DOUBLE)
      END) * 1000000) AS BIGINT) AS lp
  FROM g2
  LEFT JOIN nc USING (ctx, w)
  LEFT JOIN cc USING (ctx)
  LEFT JOIN n1pc USING (ctx)
  LEFT JOIN n1pl USING (w)
  , nt, v
), agg AS (
  SELECT doc_id, COUNT(*) AS n_ngrams, SUM(lp) AS s FROM scored GROUP BY doc_id
)
SELECT doc_id, n_ngrams,
  CAST(ROUND(CAST(s AS DOUBLE) / n_ngrams) AS BIGINT) / 1000000.0
    AS avg_logprob,
  ROUND(EXP(-(CAST(s AS DOUBLE) / 1000000 / n_ngrams)), 4) AS perplexity
FROM agg
"""

# Bloom decontamination twin: the Bloom table is a performance prefilter
# whose false positives die in the exact verify join, so the oracle is the
# same exact n-gram overlap SQL (held-out = src1).
ORACLES["bloom_decontaminate"] = f"""
WITH tok AS (
  SELECT doc_id, source, string_split({NORM_TEXT}, ' ') AS t FROM documents
), grams AS (
  SELECT DISTINCT doc_id, source,
    unnest([array_to_string(t[i:i+3], ' ') for i in range(1, len(t) - 2)]) AS g
  FROM tok
), eval_g AS (
  SELECT DISTINCT g FROM grams WHERE source = 'src1'
), corpus AS (
  SELECT doc_id, g FROM grams WHERE source <> 'src1'
), tot AS (
  SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id
), hit AS (
  SELECT doc_id, COUNT(*) AS n_hits
  FROM corpus JOIN eval_g USING (g) GROUP BY doc_id
)
SELECT h.doc_id, CAST(n_hits AS BIGINT) AS n_hits,
  CAST(n_grams AS BIGINT) AS n_grams,
  ROUND(CAST(n_hits AS DOUBLE) / n_grams, 6) AS hit_ratio
FROM hit h JOIN tot t ON h.doc_id = t.doc_id
ORDER BY h.doc_id
"""

# DSIR twin: hashed unigram+bigram buckets (same sha256 bucketing as the
# Spark side), add-1 bucket distributions as integer rationals, per-bucket
# log-ratio quantized to a fixed-point BIGINT before the per-doc sum.
ORACLES["dsir_selection"] = f"""
WITH toks AS (
  SELECT doc_id, source, {_WORDS} AS t FROM documents
), grams AS (
  SELECT doc_id, source, unnest(
    list_concat(t,
      [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))])) AS g
  FROM toks
), feats AS (
  SELECT doc_id, source,
    ('0x' || substr(sha256(g || 'dsir'), 1, 15))::BIGINT % 4096 AS bucket,
    COUNT(*) AS cnt
  FROM grams GROUP BY doc_id, source, bucket
), tgt AS (
  SELECT bucket, SUM(cnt) AS c_t FROM feats WHERE source = 'src0' GROUP BY bucket
), raw AS (
  SELECT doc_id, bucket, cnt FROM feats WHERE source <> 'src0'
), rawtot AS (
  SELECT bucket, SUM(cnt) AS c_r FROM raw GROUP BY bucket
), nt AS (SELECT COALESCE(SUM(c_t), 0) AS n_t FROM tgt),
   nr AS (SELECT COALESCE(SUM(c_r), 0) AS n_r FROM rawtot),
scored AS (
  SELECT raw.doc_id, raw.cnt,
    CAST(ROUND((LN(COALESCE(tgt.c_t, 0) + 1) - LN(nt.n_t + 4096)
              - LN(COALESCE(rawtot.c_r, 0) + 1) + LN(nr.n_r + 4096))
               * 1000000) AS BIGINT) * raw.cnt AS lw
  FROM raw
  LEFT JOIN tgt USING (bucket)
  LEFT JOIN rawtot USING (bucket)
  , nt, nr
), agg AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_feats, SUM(lw) AS s
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_feats,
  ROUND(CAST(s AS DOUBLE) / 1000000, 6) AS log_weight,
  s > 0 AS selected
FROM agg
ORDER BY doc_id
"""

# Substring-dup spans twin: same 15-token windows, same global count>=2
# rule, same gaps-and-islands merge (adjacent spans coalesce) — every
# quantity an integer.
ORACLES["substring_dup_spans"] = f"""
WITH toks AS (
  SELECT doc_id, t FROM (SELECT doc_id, {_WORDS} AS t FROM documents)
  WHERE len(t) >= 15
), wins AS (
  SELECT doc_id, g['pos'] AS pos, g['w'] AS w
  FROM (
    SELECT doc_id,
      unnest([{{'pos': i, 'w': array_to_string(t[i:i+14], ' ')}}
              for i in range(1, len(t) - 13)]) AS g
    FROM toks
  )
), dup_w AS (
  SELECT w FROM wins GROUP BY w HAVING COUNT(*) >= 2
), dups AS (
  SELECT doc_id, pos FROM wins JOIN dup_w USING (w)
), flagged AS (
  SELECT doc_id, pos,
    CASE WHEN MAX(pos + 14) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         OR pos > MAX(pos + 14) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
    THEN 1 ELSE 0 END AS new_island
  FROM dups
), islands AS (
  SELECT doc_id, pos,
    SUM(new_island) OVER (
      PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
)
SELECT doc_id,
  MIN(pos) AS span_start,
  CAST(MAX(pos) + 14 AS BIGINT) AS span_end,
  COUNT(*) AS n_windows
FROM islands
GROUP BY doc_id, island
ORDER BY doc_id, span_start
"""

# Waterfill twin: caps/prefix sums exact integers, λ one integer-derived
# double division; the feasible set is a prefix so MAX(feasible idx) is
# the true saturated count.
ORACLES["token_budget_mix"] = f"""
WITH counts AS (
  SELECT source, SUM(len(t)) AS tokens
  FROM (SELECT source, {_WORDS} AS t FROM documents) GROUP BY source
), b AS (
  SELECT 2 * SUM(tokens) AS budget FROM counts
), ranked AS (
  SELECT source, tokens, 4 * tokens AS cap,
    ROW_NUMBER() OVER (ORDER BY 4 * tokens, source) AS idx,
    SUM(4 * tokens) OVER (ORDER BY 4 * tokens, source
                          ROWS UNBOUNDED PRECEDING) AS cum_cap,
    COUNT(*) OVER () AS n, budget
  FROM counts, b
), feas AS (
  SELECT *,
    CAST(budget - cum_cap AS DOUBLE) / (n - idx) AS lam_i,
    CASE WHEN idx < n
          AND CAST(budget - cum_cap AS DOUBLE) / (n - idx)
              >= CAST(cap AS DOUBLE)
    THEN 1 ELSE 0 END AS feasible
  FROM ranked
), m AS (
  SELECT MAX(CASE WHEN feasible = 1 THEN idx END) AS m FROM feas
), lvl AS (
  SELECT lam_i AS level FROM feas, m WHERE feas.idx = m.m
  UNION ALL
  SELECT CAST(budget AS DOUBLE) / n AS level FROM feas, m
  WHERE m.m IS NULL AND idx = 1
)
SELECT source, CAST(tokens AS BIGINT) AS tokens, CAST(cap AS BIGINT) AS cap,
  ROUND(LEAST(CAST(cap AS DOUBLE), level), 6) AS allocation,
  ROUND(LEAST(CAST(cap AS DOUBLE), level) / tokens, 6) AS epochs
FROM feas, lvl
ORDER BY source
"""

# WebM metadata replay: every field round-trips exactly (durations are
# multiples of 0.25 stored as float64 milliseconds; rates are integers
# representable in float32).
ORACLES["webm_stream_info"] = """
SELECT doc_id,
  'webm' AS doctype,
  CAST(1 + doc_id % 10 AS DOUBLE) / 4 AS duration_s,
  CAST(2 AS INT) AS n_tracks,
  CASE doc_id % 3 WHEN 0 THEN 'V_VP8' WHEN 1 THEN 'V_VP9' ELSE 'V_AV1' END
    AS video_codec,
  CAST(320 + 16 * (doc_id % 5) AS INT) AS width,
  CAST(240 + 16 * (doc_id % 3) AS INT) AS height,
  CASE doc_id % 2 WHEN 0 THEN 'A_OPUS' ELSE 'A_VORBIS' END AS audio_codec,
  CASE doc_id % 3 WHEN 0 THEN 48000.0 WHEN 1 THEN 44100.0 ELSE 16000.0 END
    AS audio_rate
FROM documents
WHERE doc_id < 250
ORDER BY doc_id
"""

# Ogg metadata replay: quarter-second durations are exact in both the
# 48 kHz Opus granule clock and the Vorbis rates used.
ORACLES["ogg_stream_info"] = """
SELECT doc_id,
  CASE WHEN doc_id % 2 = 0 THEN 'opus' ELSE 'vorbis' END AS codec,
  CAST(1 + doc_id % 2 AS INT) AS channels,
  CAST(CASE WHEN doc_id % 2 = 0 THEN 48000
            WHEN doc_id % 4 = 1 THEN 44100 ELSE 16000 END AS INT)
    AS sample_rate,
  CAST(1 + doc_id % 8 AS DOUBLE) / 4 AS duration_s,
  CAST(3 AS INT) AS n_pages,
  CAST(1 AS INT) AS n_streams
FROM documents
WHERE doc_id < 250
ORDER BY doc_id
"""

# TIFF is lossless: the flat-color replay predicts the decoded luma
# bit-for-bit across both byte orders and strip layouts.
ORACLES["tiff_decode_features"] = """
SELECT doc_id,
  CAST(1 + doc_id % 9 AS INT) AS width,
  CAST(2 + doc_id % 4 AS INT) AS height,
  ROUND((0.114*(doc_id % 256) + 0.587*((doc_id*5) % 256)
       + 0.299*((doc_id*11) % 256)) / 255.0, 6) AS mean_luma
FROM documents
WHERE doc_id < 300
"""

# ZIP manifest replay: STORED entries make compressed == uncompressed ==
# the deterministic payload length per (doc, entry ordinal).
ORACLES["zip_manifest"] = """
SELECT doc_id,
  'rec' || CAST(j AS VARCHAR) || '.h5' AS entry_name,
  CAST(10 + j AS BIGINT) AS uncompressed_size,
  CAST(10 + j AS BIGINT) AS compressed_size,
  'stored' AS method
FROM documents, LATERAL unnest(generate_series(0, doc_id % 3)) AS g(j)
WHERE doc_id < 200
ORDER BY doc_id, entry_name
"""

# Q9-shape twin: same surrogate cost (no partsupp in the fixture set),
# decimal-exact profit.
ORACLES["profit_by_nation_year"] = """
SELECT n.n_name AS nation,
  CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))
         - CAST(0.1 AS DECIMAL(12,2))
           * CAST(p.p_retailprice AS DECIMAL(12,2))
           * CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY nation, o_year
"""

# Q16-shape twin: lineitem pairs stand in for partsupp; NOT IN exclusion.
ORACLES["supplier_count_by_part_attrs"] = """
WITH pairs AS (
  SELECT DISTINCT l_partkey AS p_partkey, l_suppkey AS suppkey FROM lineitem
)
SELECT p.p_brand, p.p_type, p.p_size,
  COUNT(DISTINCT pr.suppkey) AS supplier_cnt
FROM pairs pr
JOIN part p USING (p_partkey)
WHERE p.p_brand <> 'Brand#13'
  AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
  AND pr.suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 1500)
GROUP BY p.p_brand, p.p_type, p.p_size
"""

# Q20-shape twin: grouped-HAVING semi-join chain.
ORACLES["promo_supplier_candidates"] = """
WITH heavy AS (
  SELECT l_suppkey AS s_suppkey
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE 'small%'
    AND l.l_shipdate >= TIMESTAMP '1995-01-01'
    AND l.l_shipdate < TIMESTAMP '1996-01-01'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > CAST(80 AS DECIMAL(12,2))
)
SELECT s.s_name, n.n_name AS nation, s.s_acctbal
FROM supplier s
JOIN heavy USING (s_suppkey)
JOIN nation n ON s.s_nationkey = n.n_nationkey
ORDER BY s.s_name
"""

# WARC manifest replay: record fields are deterministic per doc; the
# response payload is the document text itself, so its byte length and
# sha256 replay in SQL (both engines hash UTF-8 bytes).
ORACLES["warc_manifest"] = """
SELECT doc_id, CAST(0 AS INT) AS rec_idx, 'warcinfo' AS warc_type,
  '' AS target_uri, 'application/warc-fields' AS content_type,
  CAST(23 AS BIGINT) AS content_length,
  sha256('software: spark-graft' || chr(13) || chr(10)) AS payload_sha256
FROM documents WHERE doc_id < 200
UNION ALL
SELECT doc_id, CAST(1 AS INT) AS rec_idx, 'response' AS warc_type,
  'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
  'text/plain' AS content_type,
  CAST(strlen(text) AS BIGINT) AS content_length,
  sha256(text) AS payload_sha256
FROM documents WHERE doc_id < 200
ORDER BY doc_id, rec_idx
"""


# --- corpus-cleaning heuristics (operators/cleaning.py) ---------------------

_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_STOP_HITS = " + ".join(
    rf"(CASE WHEN regexp_matches(lower(text), '\b{w}\b') THEN 1 ELSE 0 END)"
    for w in _GOPHER_STOPS
)

ORACLES["gopher_quality"] = f"""
WITH base AS (
  SELECT doc_id, text,
    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         ELSE string_split_regex(trim(text), '\\s+') END AS w,
    string_split(text, chr(10)) AS ln
  FROM documents),
sig AS (
  SELECT doc_id,
    CAST(len(w) AS BIGINT) AS words,
    round(CASE WHEN len(w) > 0
      THEN length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE / len(w)::DOUBLE
      ELSE 0.0 END, 6) AS mean_word_len,
    round(CASE WHEN len(w) > 0
      THEN len(regexp_extract_all(text, '[#]|[.][.][.]'))::DOUBLE / len(w)::DOUBLE
      ELSE 0.0 END, 6) AS symbol_ratio,
    round(len(list_filter(ln, l -> regexp_matches(l, '^[ \\t]*[-*\u2022]')))::DOUBLE
      / len(ln)::DOUBLE, 6) AS bullet_frac,
    round(len(list_filter(ln, l -> regexp_matches(l, '([.][.][.]|\u2026)[ \\t]*$')))::DOUBLE
      / len(ln)::DOUBLE, 6) AS ellipsis_frac,
    round(CASE WHEN len(w) > 0
      THEN len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE / len(w)::DOUBLE
      ELSE 0.0 END, 6) AS alpha_frac,
    CAST({_STOP_HITS} AS BIGINT) AS stop_hits
  FROM base)
SELECT *,
  (words BETWEEN 50 AND 100000
   AND mean_word_len BETWEEN 3.0 AND 10.0
   AND symbol_ratio <= 0.1
   AND bullet_frac <= 0.9
   AND ellipsis_frac <= 0.3
   AND alpha_frac >= 0.8
   AND stop_hits >= 2) AS keep
FROM sig
ORDER BY doc_id
"""

ORACLES["c4_line_filter"] = """
WITH base AS (
  SELECT doc_id, text, string_split(text, chr(10)) AS ln FROM documents),
k AS (
  SELECT doc_id, text, ln,
    list_filter(ln, l ->
      regexp_matches(l, '[.!?]"?[ \\t]*$')
      AND length(trim(l)) > 0
      AND len(string_split_regex(trim(l), '\\s+')) >= 5
      AND NOT contains(lower(l), 'javascript')
      AND NOT contains(l, '{')) AS kept
  FROM base)
SELECT doc_id,
  CAST(len(ln) AS BIGINT) AS n_lines,
  CAST(len(kept) AS BIGINT) AS n_kept,
  CASE WHEN text IS NULL THEN NULL
       ELSE md5(coalesce(array_to_string(kept, chr(10)), '')) END AS clean_md5,
  (len(kept) >= 3 AND NOT contains(lower(text), 'lorem ipsum')) AS keep_doc
FROM k
ORDER BY doc_id
"""

_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
_PII_IP = r"\b[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}\b"
_PII_SSN = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
_PII_PHONE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"

ORACLES["pii_redaction"] = f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT) AS n_ip,
  CAST(len(regexp_extract_all(text, '{_PII_SSN}')) AS BIGINT) AS n_ssn,
  CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
  md5(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
          '{_PII_IP}', '<IP>', 'g'),
        '{_PII_SSN}', '<SSN>', 'g'),
      '{_PII_PHONE}', '<PHONE>', 'g')
  ) AS redacted_md5
FROM documents
ORDER BY doc_id
"""

ORACLES["line_dedup_first_wins"] = """
WITH l AS (
  SELECT doc_id,
    unnest(string_split(text, chr(10))) AS line,
    generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM documents),
nb AS (
  SELECT doc_id, pos, line,
    row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM l WHERE length(trim(line)) > 0),
kept AS (
  SELECT doc_id, pos, line FROM nb WHERE rn = 1
  UNION ALL
  SELECT doc_id, pos, line FROM l WHERE length(trim(line)) = 0)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_kept,
  md5(string_agg(line, chr(10) ORDER BY pos)) AS text_md5
FROM kept
GROUP BY doc_id
ORDER BY doc_id
"""

ORACLES["doc_chunks"] = """
WITH b AS (
  SELECT doc_id,
    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         ELSE string_split_regex(trim(text), '\\s+') END AS w
  FROM documents),
s AS (
  SELECT doc_id, w, len(w) AS n,
    unnest(generate_series(0, len(w) - 1, 48)) AS start
  FROM b WHERE len(w) > 0)
SELECT doc_id,
  CAST(start // 48 AS BIGINT) AS chunk_id,
  CAST(least(64, n - start) AS BIGINT) AS n_words,
  md5(array_to_string(w[start + 1 : start + 64], ' ')) AS chunk_md5
FROM s
ORDER BY doc_id, chunk_id
"""


ORACLES["order_value_percentiles"] = """
SELECT o_orderpriority,
  CAST(count(*) AS BIGINT) AS n_orders,
  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
  round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLES["order_status_pivot"] = """
SELECT o_orderpriority,
  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def _pagerank_sql(iters: int = 5) -> str:
    scale, base = 1_000_000_000, 150_000_000
    its = ["it0 AS (SELECT node, CAST(%d AS BIGINT) AS irank FROM nodes)" % scale]
    for i in range(iters):
        its.append(f"""it{i + 1} AS (
  SELECT n.node,
    CAST({base} + ((85 * COALESCE(x.contrib, 0)) // 100) AS BIGINT) AS irank
  FROM nodes n LEFT JOIN (
    SELECT e.dst, sum(r.irank // d.outdeg) AS contrib
    FROM it{i} r JOIN edges e ON r.node = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst) x ON x.dst = n.node)""")
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs),
nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
{",".join(its)}
SELECT CAST((node - 1) // 2 AS BIGINT) AS s_suppkey,
  irank,
  ((irank + 500) // 1000) / 1000000.0 AS rank
FROM it{iters}
WHERE node % 2 = 1
ORDER BY irank DESC, s_suppkey
LIMIT 25
"""


ORACLES["supplier_pagerank"] = _pagerank_sql()

ORACLES["event_funnel"] = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id)
SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
UNION ALL
SELECT '2_click_after_view', CAST(count(*) AS BIGINT) FROM c
UNION ALL
SELECT '3_purchase_after_click', CAST(count(*) AS BIGINT) FROM p
ORDER BY stage
"""


ORACLES["ccnet_perplexity_buckets"] = f"""
WITH kn AS ({ORACLES["kneser_ney_perplexity"]}),
r AS (
  SELECT doc_id, perplexity,
    row_number() OVER (ORDER BY perplexity, doc_id) AS rank,
    count(*) OVER () AS n
  FROM kn)
SELECT doc_id, perplexity, CAST(rank AS BIGINT) AS rank,
  ['head', 'middle', 'tail'][CAST((3 * (rank - 1)) // n AS INT) + 1] AS bucket
FROM r
ORDER BY rank
"""

ORACLES["per_lang_sample"] = """
WITH h AS (
  SELECT doc_id, lang, sha256(CAST(doc_id AS VARCHAR)) AS pick_hash
  FROM documents),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY lang ORDER BY pick_hash, doc_id) AS pick_rank
  FROM h)
SELECT doc_id, lang, pick_hash, CAST(pick_rank AS BIGINT) AS pick_rank
FROM r WHERE pick_rank <= 20
ORDER BY lang, pick_rank
"""


def _lsh_topk_sql(dim: int = 64, n_planes: int = 16, band_bits: int = 8, k: int = 5) -> str:
    """Exact algorithm replay of similarity.lsh_topk: the hyperplanes are a
    deterministic affine sequence, so the signature/banding/candidate-join/
    rerank pipeline is fully SQL-expressible — this converts the LSH path
    from a rows-only check to a full differential oracle."""
    from .operators.similarity import _hyperplane

    sig_terms = []
    for i in range(n_planes):
        plane = "[" + ", ".join(repr(v) for v in _hyperplane(dim, i)) + "]"
        sig_terms.append(
            f"(CASE WHEN list_dot_product(v, {plane}) >= 0"
            f" THEN {1 << i} ELSE 0 END)"
        )
    sig = " + ".join(sig_terms)
    n_bands = n_planes // band_bits
    bands = "[" + ", ".join(str(b) for b in range(n_bands)) + "]"
    mask = (1 << band_bits) - 1
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sigs AS (
  SELECT vec_id, ({sig}) AS sig FROM e),
banded AS (
  SELECT vec_id, band, (sig >> (band * {band_bits})) & {mask} AS band_key
  FROM sigs, unnest({bands}) AS t(band)),
cands AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM banded c
  JOIN banded q USING (band, band_key)
  WHERE q.vec_id < 5 AND c.vec_id != q.vec_id),
scored AS (
  SELECT query_id, neighbor_id,
    round(list_dot_product(qe.v, ce.v)
          / (sqrt(list_dot_product(qe.v, qe.v))
             * sqrt(list_dot_product(ce.v, ce.v))), 6) AS cosine_sim
  FROM cands
  JOIN e qe ON qe.vec_id = query_id
  JOIN e ce ON ce.vec_id = neighbor_id),
ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= {k}
"""


ORACLES["embedding_topk_lsh"] = _lsh_topk_sql()


def _kmeans_cte(k: int = 8, iters: int = 4) -> str:
    """CTE chain replaying clustering.kmeans_assign EXACTLY: fixed-point
    quantisation, integer dot products, HALF-rounded centroid updates,
    quantised renormalisation — every float op in the same order as the
    Spark expression tree, every cross-row sum an exact integer. The final
    CTE ``assign`` holds (id, cid, s) with s the integer similarity sum."""
    S, S2 = 1_000_000, 1_000_000_000_000
    parts = [f"""e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
nrm AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nf FROM e),
pts AS (
  SELECT vec_id AS id,
    generate_subscripts(v, 1) - 1 AS pos,
    CAST(round((unnest(v) / nf) * {S}) AS BIGINT) AS ival
  FROM nrm WHERE nf > 0),
seeds AS (
  SELECT vec_id, CAST(rn - 1 AS INT) AS cid
  FROM (SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn
        FROM embeddings)
  WHERE rn <= {k}),
cent0 AS (
  SELECT s.cid, p.pos, p.ival AS icval
  FROM pts p JOIN seeds s ON p.id = s.vec_id)"""]
    for j in range(1, iters + 1):
        parts.append(f"""sims{j} AS (
  SELECT p.id, c.cid, sum(p.ival * c.icval) AS s
  FROM pts p JOIN cent{j - 1} c ON p.pos = c.pos
  GROUP BY p.id, c.cid),
best{j} AS (
  SELECT id, cid FROM (
    SELECT id, cid, row_number() OVER (
      PARTITION BY id ORDER BY CAST(s AS DOUBLE) / {S2} DESC, cid) AS rn
    FROM sims{j})
  WHERE rn = 1),
sums{j} AS (
  SELECT b.cid, p.pos, sum(p.ival) AS s, count(*) AS n
  FROM pts p JOIN best{j} b ON p.id = b.id
  GROUP BY b.cid, p.pos),
im{j} AS (
  SELECT cid, pos,
    CAST(round((CAST(s AS DOUBLE) / (n * {S})) * {S}) AS BIGINT) AS imean
  FROM sums{j}),
cent{j} AS (
  SELECT cid, pos,
    CAST(round((imean / (cn * {S})) * {S}) AS BIGINT) AS icval
  FROM (
    SELECT cid, pos, imean,
      sqrt(CAST(sum(imean * imean) OVER (PARTITION BY cid) AS DOUBLE)) / {S} AS cn
    FROM im{j})
  WHERE cn > 0)""")
    parts.append(f"""assign AS (
  SELECT id, cid, s FROM (
    SELECT id, cid, s, row_number() OVER (
      PARTITION BY id ORDER BY CAST(s AS DOUBLE) / {S2} DESC, cid) AS rn
    FROM (
      SELECT p.id, c.cid, sum(p.ival * c.icval) AS s
      FROM pts p JOIN cent{iters} c ON p.pos = c.pos
      GROUP BY p.id, c.cid))
  WHERE rn = 1)""")
    return ",\n".join(parts)


ORACLES["kmeans_embeddings"] = f"""
WITH {_kmeans_cte(8, 4)}
SELECT id AS vec_id, CAST(cid AS INT) AS cluster_id,
  round(CAST(s AS DOUBLE) / 1000000000000, 6) AS sim
FROM assign
ORDER BY vec_id
"""

ORACLES["semantic_dedup"] = f"""
WITH {_kmeans_cte(8, 4)},
blocks AS (
  SELECT id, cid,
    (row_number() OVER (PARTITION BY cid ORDER BY id) - 1) // 4096 AS blk
  FROM assign),
pair_sims AS (
  SELECT ba.cid, ba.id AS id_a, bb.id AS id_b,
    CAST(sum(pa.ival * pb.ival) AS DOUBLE) / 1000000000000 AS sim
  FROM blocks ba
  JOIN blocks bb ON ba.cid = bb.cid AND ba.blk = bb.blk AND ba.id < bb.id
  JOIN pts pa ON pa.id = ba.id
  JOIN pts pb ON pb.id = bb.id AND pb.pos = pa.pos
  GROUP BY ba.cid, ba.id, bb.id),
dups AS (
  SELECT DISTINCT id_b FROM pair_sims WHERE sim >= 0.9)
SELECT a.id AS vec_id, CAST(a.cid AS INT) AS cluster_id,
  (d.id_b IS NULL) AS keep
FROM assign a LEFT JOIN dups d ON a.id = d.id_b
ORDER BY vec_id
"""


def _pq_topk_sql(m: int = 4, k_cb: int = 16, iters: int = 4, k: int = 5) -> str:
    """Exact replay of operators/pq.py pq_topk: per-subspace codebook
    training (L2 argmin over fixed-point ints), encoding, and ADC scoring,
    all unrolled as CTEs — same fixed-point discipline as the k-means
    oracle, so the iterative PQ path gets a full value-hash check."""
    S, S2 = 1_000_000, 1_000_000_000_000
    parts = [f"""e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
nrm AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nf, len(v) AS dim
  FROM e),
pts AS (
  SELECT vec_id AS id,
    (generate_subscripts(v, 1) - 1) // (dim // {m}) AS sub,
    (generate_subscripts(v, 1) - 1) % (dim // {m}) AS spos,
    CAST(round((unnest(v) / nf) * {S}) AS BIGINT) AS ival
  FROM nrm WHERE nf > 0),
seeds AS (
  SELECT vec_id, CAST(rn - 1 AS INT) AS cid
  FROM (SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn
        FROM embeddings)
  WHERE rn <= {k_cb}),
cent0 AS (
  SELECT p.sub, s.cid, p.spos, p.ival AS icval
  FROM pts p JOIN seeds s ON p.id = s.vec_id)"""]
    assign = """(
  SELECT id, sub, cid FROM (
    SELECT d.id, d.sub, d.cid, row_number() OVER (
      PARTITION BY d.id, d.sub ORDER BY d.d2 ASC, d.cid ASC) AS rn
    FROM (
      SELECT p.id, p.sub, c.cid,
        sum((p.ival - c.icval) * (p.ival - c.icval)) AS d2
      FROM pts p JOIN cent{prev} c ON p.sub = c.sub AND p.spos = c.spos
      GROUP BY p.id, p.sub, c.cid) d)
  WHERE rn = 1)"""
    for j in range(1, iters + 1):
        parts.append(f"""best{j} AS {assign.format(prev=j - 1)},
cent{j} AS (
  SELECT p.sub, b.cid, p.spos,
    CAST(round(CAST(sum(p.ival) AS DOUBLE) / count(*)) AS BIGINT) AS icval
  FROM pts p JOIN best{j} b ON p.id = b.id AND p.sub = b.sub
  GROUP BY p.sub, b.cid, p.spos)""")
    parts.append(f"""codes AS {assign.format(prev=iters)},
qtab AS (
  SELECT p.id AS qid, p.sub, c.cid, sum(p.ival * c.icval) AS ip
  FROM pts p JOIN cent{iters} c ON p.sub = c.sub AND p.spos = c.spos
  WHERE p.id < 5
  GROUP BY p.id, p.sub, c.cid),
scored AS (
  SELECT t.qid AS query_id, co.id AS neighbor_id,
    round(CAST(sum(t.ip) AS DOUBLE) / {S2}, 6) AS approx_sim
  FROM codes co JOIN qtab t ON t.sub = co.sub AND t.cid = co.cid
  WHERE co.id != t.qid
  GROUP BY t.qid, co.id)""")
    return (
        "WITH " + ",\n".join(parts) + f""",
ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id
      ORDER BY approx_sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored)
SELECT query_id, neighbor_id, approx_sim, rank FROM ranked WHERE rank <= {k}
"""
    )


ORACLES["embedding_topk_pq"] = _pq_topk_sql()


ORACLES["tpch_q2_min_cost_supplier"] = """
WITH unit AS (
  SELECT l_partkey, l_suppkey,
    round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
               / sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 4)
      AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
scoped AS (
  SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, u.unit_cost, s.s_suppkey
  FROM unit u
  JOIN part p ON u.l_partkey = p.p_partkey AND p.p_brand = 'Brand#1'
  JOIN supplier s ON u.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE')
SELECT p_partkey, p_name, s_name, n_name, unit_cost
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY p_partkey ORDER BY unit_cost ASC, s_suppkey ASC) AS rn
  FROM scoped)
WHERE rn = 1
ORDER BY p_partkey
"""

ORACLES["tpch_q11_important_stock"] = """
WITH scoped AS (
  SELECT l.l_partkey, l.l_extendedprice
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'),
per_part AS (
  SELECT l_partkey,
    sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_d
  FROM scoped GROUP BY l_partkey)
SELECT l_partkey, CAST(value_d AS DOUBLE) AS value
FROM per_part
WHERE value_d > (SELECT sum(value_d) FROM per_part) * 0.001
ORDER BY value DESC, l_partkey
"""


ORACLES["purchase_attribution"] = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, ts AS click_ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts >= c.click_ts
ORDER BY p.event_id
"""

ORACLES["cohort_retention"] = """
WITH s AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_w
  FROM events WHERE event_type = 'signup' GROUP BY user_id),
act AS (
  SELECT DISTINCT e.user_id, s.cohort_w, date_trunc('week', e.ts) AS act_w
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE date_trunc('week', e.ts) >= s.cohort_w)
SELECT CAST(cohort_w AS TIMESTAMP) AS cohort_week,
  CAST(date_diff('day', CAST(cohort_w AS DATE), CAST(act_w AS DATE)) // 7
       AS BIGINT) AS week_offset,
  CAST(count(*) AS BIGINT) AS n_users
FROM act
GROUP BY 1, 2
ORDER BY cohort_week, week_offset
"""


ORACLES["char_entropy"] = """
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
hist AS (
  SELECT doc_id, ch, count(*) AS cnt FROM chars GROUP BY doc_id, ch),
terms AS (
  SELECT doc_id, cnt,
    CAST(round(
      (CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY doc_id) AS DOUBLE))
      * log2(CAST(cnt AS DOUBLE) / CAST(sum(cnt) OVER (PARTITION BY doc_id) AS DOUBLE))
      * 1000000.0) AS BIGINT) AS term
  FROM hist)
SELECT doc_id,
  CAST(sum(cnt) AS BIGINT) AS n_chars,
  CAST(count(*) AS BIGINT) AS uniq_chars,
  round(-CAST(sum(term) AS DOUBLE) / 1000000.0, 6) AS entropy
FROM terms
GROUP BY doc_id
ORDER BY doc_id
"""


def _materialize_ctes(sql: str) -> str:
    """Hint DuckDB to materialize every CTE in ``sql`` (semantics
    unchanged — pure evaluation strategy). The composed IVF-PQ replay
    references its expensive chains (coarse k-means, hot-cell split,
    residual relation) from several downstream CTEs; without the hint
    DuckDB 1.0 re-inlines them and the replay goes super-linear in CTE
    depth."""
    import re as _re

    sql = _re.sub(r"(?m)^(\w+) AS \(", r"\1 AS MATERIALIZED (", sql)
    return _re.sub(r"WITH (\w+) AS \(", r"WITH \1 AS MATERIALIZED (", sql)


def _ivfpq_split_cte(
    coarse_iters: int, max_cell_size: int, split_iters: int,
    max_split: int,
) -> str:
    """CTE chain replaying ivfpq.py::_split_hot_cells EXACTLY: cells over
    the cap re-cluster with a second fixed-point spherical k-means
    (k₂ = min(ceil(size/cap), max_split) lowest-id seeds per hot cell,
    the kmeans_assign_hierarchical level-2 discipline keyed by parent
    cell), ending in ``cellsf`` (id, cell, sub) and ``fcent`` (cell,
    sub, pos, icval) where hot cells' centroids are replaced by
    sub-centroids."""
    S, S2 = 1_000_000, 1_000_000_000_000
    parts = [f"""csz AS (
  SELECT cid, count(*) AS csz FROM assign GROUP BY cid),
hot AS (
  SELECT cid, csz FROM csz WHERE csz > {max_cell_size}),
hpts AS (
  SELECT a.cid AS cell, p.id, p.pos, p.ival
  FROM pts p JOIN assign a ON p.id = a.id JOIN hot h ON a.cid = h.cid),
sseed AS (
  SELECT cell, id, CAST(rn - 1 AS INT) AS scid FROM (
    SELECT a.cid AS cell, a.id, h.csz,
      row_number() OVER (PARTITION BY a.cid ORDER BY a.id) AS rn
    FROM assign a JOIN hot h ON a.cid = h.cid)
  WHERE rn <= least(
    CAST(ceil(CAST(csz AS DOUBLE) / {max_cell_size}) AS BIGINT),
    CAST({max_split} AS BIGINT))),
scent0 AS (
  SELECT s.cell, s.scid, p.pos, p.ival AS icval
  FROM hpts p JOIN sseed s ON p.id = s.id AND p.cell = s.cell)"""]
    for j in range(1, split_iters + 1):
        parts.append(f"""ssims{j} AS (
  SELECT p.id, p.cell, c.scid, sum(p.ival * c.icval) AS s
  FROM hpts p JOIN scent{j - 1} c ON p.cell = c.cell AND p.pos = c.pos
  GROUP BY p.id, p.cell, c.scid),
sbest{j} AS (
  SELECT id, scid FROM (
    SELECT id, scid, row_number() OVER (
      PARTITION BY id ORDER BY CAST(s AS DOUBLE) / {S2} DESC, scid) AS rn
    FROM ssims{j})
  WHERE rn = 1),
ssums{j} AS (
  SELECT p.cell, b.scid, p.pos,
    CAST(round((CAST(sum(p.ival) AS DOUBLE) / (count(*) * {S})) * {S})
         AS BIGINT) AS imean
  FROM hpts p JOIN sbest{j} b ON p.id = b.id
  GROUP BY p.cell, b.scid, p.pos),
scent{j} AS (
  SELECT cell, scid, pos,
    CAST(round((imean / (cn * {S})) * {S}) AS BIGINT) AS icval
  FROM (
    SELECT cell, scid, pos, imean,
      sqrt(CAST(sum(imean * imean) OVER (PARTITION BY cell, scid) AS DOUBLE))
        / {S} AS cn
    FROM ssums{j})
  WHERE cn > 0)""")
    parts.append(f"""fbest AS (
  SELECT id, scid FROM (
    SELECT p.id, c.scid, row_number() OVER (
      PARTITION BY p.id
      ORDER BY CAST(sum(p.ival * c.icval) AS DOUBLE) / {S2} DESC, c.scid)
      AS rn
    FROM hpts p JOIN scent{split_iters} c
      ON p.cell = c.cell AND p.pos = c.pos
    GROUP BY p.id, p.cell, c.scid)
  WHERE rn = 1),
cellsf AS (
  SELECT a.id, a.cid AS cell, CAST(coalesce(f.scid, 0) AS INT) AS sub
  FROM assign a LEFT JOIN fbest f ON a.id = f.id),
fcent AS (
  SELECT c.cid AS cell, CAST(0 AS INT) AS sub, c.pos, c.icval
  FROM cent{coarse_iters} c
  WHERE c.cid NOT IN (SELECT cid FROM hot)
  UNION ALL
  SELECT cell, CAST(scid AS INT) AS sub, pos, icval
  FROM scent{split_iters})""")
    return ",\n".join(parts)


def _ivfpq_sql(
    n_cells: int = 8,
    coarse_iters: int = 4,
    m: int = 4,
    k_codes: int = 16,
    pq_iters: int = 3,
    n_probe: int = 2,
    k: int = 5,
    max_cell_size: int | None = None,
    split_iters: int = 2,
    max_split: int = 32,
) -> str:
    """Replay of operators/ivfpq.py: the coarse k-means CTEs feed integer
    residual encoding, unrolled PQ codebook training on the residuals,
    probe ranking, and the q·c + ADC score — all exact integers until the
    final division (REPRO.md pattern 8, composed). With ``max_cell_size``
    the hot-cell sub-split (ivfpq.py::_split_hot_cells) is replayed too:
    residuals, probing, and candidate lists key on (cell, sub)."""
    S2 = 1_000_000_000_000
    parts = [_kmeans_cte(n_cells, coarse_iters)]
    if max_cell_size is not None:
        parts.append(
            _ivfpq_split_cte(
                coarse_iters, max_cell_size, split_iters, max_split
            )
        )
    else:
        parts.append(f"""cellsf AS (
  SELECT id, cid AS cell, CAST(0 AS INT) AS sub FROM assign),
fcent AS (
  SELECT cid AS cell, CAST(0 AS INT) AS sub, pos, icval
  FROM cent{coarse_iters})""")
    parts.append(f"""dims AS (
  SELECT (max(pos) + 1) // {m} AS subdim FROM pts),
rpts AS (
  SELECT p.id, CAST(p.pos // d.subdim AS INT) AS sub,
    p.pos % d.subdim AS spos, p.ival - c.icval AS ival
  FROM pts p
  JOIN cellsf a ON p.id = a.id
  JOIN fcent c ON c.cell = a.cell AND c.sub = a.sub AND c.pos = p.pos,
  dims d),
pseeds AS (
  SELECT vec_id, CAST(rn - 1 AS INT) AS cid
  FROM (SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn
        FROM embeddings)
  WHERE rn <= {k_codes}),
pcent0 AS (
  SELECT r.sub, s.cid, r.spos, r.ival AS icval
  FROM rpts r JOIN pseeds s ON r.id = s.vec_id)""")
    passign = """(
  SELECT id, sub, cid FROM (
    SELECT d.id, d.sub, d.cid, row_number() OVER (
      PARTITION BY d.id, d.sub ORDER BY d.d2 ASC, d.cid ASC) AS rn
    FROM (
      SELECT r.id, r.sub, c.cid,
        sum((r.ival - c.icval) * (r.ival - c.icval)) AS d2
      FROM rpts r JOIN pcent{prev} c ON r.sub = c.sub AND r.spos = c.spos
      GROUP BY r.id, r.sub, c.cid) d)
  WHERE rn = 1)"""
    for j in range(1, pq_iters + 1):
        parts.append(f"""pbest{j} AS {passign.format(prev=j - 1)},
pcent{j} AS (
  SELECT r.sub, b.cid, r.spos,
    CAST(round(CAST(sum(r.ival) AS DOUBLE) / count(*)) AS BIGINT) AS icval
  FROM rpts r JOIN pbest{j} b ON r.id = b.id AND r.sub = b.sub
  GROUP BY r.sub, b.cid, r.spos)""")
    parts.append(f"""pcodes AS {passign.format(prev=pq_iters)},
qcell AS (
  SELECT p.id AS qid, c.cell, c.sub, sum(p.ival * c.icval) AS qc
  FROM pts p JOIN fcent c ON c.pos = p.pos
  WHERE p.id < 5
  GROUP BY p.id, c.cell, c.sub),
probed AS (
  SELECT qid, cell, sub, qc FROM (
    SELECT *, row_number() OVER (
      PARTITION BY qid ORDER BY qc DESC, cell ASC, sub ASC) AS rn
    FROM qcell)
  WHERE rn <= {n_probe}),
qsub AS (
  SELECT p.id AS qid, CAST(p.pos // d.subdim AS INT) AS sub,
    p.pos % d.subdim AS spos, p.ival
  FROM pts p, dims d WHERE p.id < 5),
tab AS (
  SELECT q.qid, q.sub, c.cid, sum(q.ival * c.icval) AS ip
  FROM qsub q JOIN pcent{pq_iters} c ON q.sub = c.sub AND q.spos = c.spos
  GROUP BY q.qid, q.sub, c.cid),
cands AS (
  SELECT pr.qid, pr.qc, a.id
  FROM probed pr JOIN cellsf a ON a.cell = pr.cell AND a.sub = pr.sub
  WHERE a.id != pr.qid),
adc AS (
  SELECT cn.qid, cn.id, cn.qc, sum(t.ip) AS adc
  FROM cands cn
  JOIN pcodes pc ON pc.id = cn.id
  JOIN tab t ON t.qid = cn.qid AND t.sub = pc.sub AND t.cid = pc.cid
  GROUP BY cn.qid, cn.id, cn.qc),
scored AS (
  SELECT qid AS query_id, id AS neighbor_id,
    round(CAST(qc + adc AS DOUBLE) / {S2}, 6) AS approx_sim
  FROM adc),
ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id
      ORDER BY approx_sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored)""")
    return _materialize_ctes(
        "WITH " + ",\n".join(parts)
        + f"""
SELECT query_id, neighbor_id, approx_sim, rank FROM ranked WHERE rank <= {k}
"""
    )


ORACLES["embedding_topk_ivfpq"] = _ivfpq_sql()
ORACLES["embedding_topk_ivfpq_hotsplit"] = _ivfpq_sql(
    n_probe=3, max_cell_size=64
)


def _ivf_sql(n_cells: int = 16, iters: int = 4, n_probe: int = 4, k: int = 5) -> str:
    """Replay of operators/similarity.py::ivf_topk (r8 native coarse
    quantizer): the exact-integer k-means CTEs, probe ranking by the
    fixed-point query·centroid dot (same double rendering and cell
    tie-break as the Spark window), then the embedding_topk exact-rerank
    discipline (unit vectors, list_dot_product, round 6) over only the
    probed candidates."""
    S2 = 1_000_000_000_000
    return (
        "WITH "
        + _kmeans_cte(n_cells, iters)
        + f""",
qcell AS (
  SELECT p.id AS qid, c.cid AS cell, sum(p.ival * c.icval) AS qc
  FROM pts p JOIN cent{iters} c ON c.pos = p.pos
  WHERE p.id < 5
  GROUP BY p.id, c.cid),
probed AS (
  SELECT qid, cell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY qid ORDER BY CAST(qc AS DOUBLE) / {S2} DESC, cell ASC) AS rn
    FROM qcell)
  WHERE rn <= {n_probe}),
cands AS (
  SELECT pr.qid, a.id
  FROM probed pr JOIN assign a ON a.cid = pr.cell
  WHERE a.id != pr.qid),
cu AS (
  SELECT vec_id, {_UNIT} AS v FROM embeddings),
ivf_scored AS (
  SELECT cn.qid AS query_id, cn.id AS neighbor_id,
    round(list_dot_product(q.v, c.v), 6) AS cosine_sim
  FROM cands cn
  JOIN cu q ON q.vec_id = cn.qid
  JOIN cu c ON c.vec_id = cn.id),
ivf_ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id
      ORDER BY cosine_sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM ivf_scored)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ivf_ranked WHERE rank <= {k}
"""
    )


# r8: the native fixed-point coarse quantizer upgrades IVF from rows-only
# to a FULL value-hash oracle (training replayed, probes, exact rerank)
ORACLES["embedding_topk_ivf"] = _ivf_sql()


ORACLES["kmv_distinct_users"] = """
WITH h AS (
  SELECT DISTINCT event_type,
    CAST(concat('0x', substring(sha256(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1 AS hv
  FROM events),
bottom AS (
  SELECT event_type, hv,
    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_seen_k,
  round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
        ELSE 63.0 / (CAST(max(hv) AS DOUBLE) / 1152921504606846976.0) END,
        4) AS est_distinct
FROM bottom WHERE rn <= 64
GROUP BY event_type
ORDER BY event_type
"""


ORACLES["kmv_click_purchase_overlap"] = """
WITH hashes AS (
  SELECT DISTINCT event_type AS lab,
    CAST(concat('0x', substring(sha256(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1 AS h
  FROM events WHERE event_type IN ('click', 'purchase')),
ranked AS (
  SELECT lab, h, row_number() OVER (PARTITION BY lab ORDER BY h) AS rn
  FROM hashes),
thetas AS (
  SELECT lab, coalesce(max(CASE WHEN rn = 64 THEN h END),
                       1152921504606846977) AS theta
  FROM ranked GROUP BY lab),
theta AS (SELECT min(theta) AS theta FROM thetas),
below AS (
  SELECT r.lab, r.h, t.theta FROM ranked r, theta t WHERE r.h < t.theta),
sides AS (
  SELECT h, theta,
    max(CASE WHEN lab = 'click' THEN 1 ELSE 0 END) AS in_a,
    max(CASE WHEN lab = 'purchase' THEN 1 ELSE 0 END) AS in_b
  FROM below GROUP BY h, theta)
SELECT
  CAST(sum(in_a) AS BIGINT) AS n_a_sample,
  CAST(sum(in_b) AS BIGINT) AS n_b_sample,
  round(sum(in_a) / (CASE WHEN theta > 1152921504606846976 THEN 1.0
        ELSE CAST(theta AS DOUBLE) / 1152921504606846976.0 END), 4) AS est_a,
  round(sum(in_b) / (CASE WHEN theta > 1152921504606846976 THEN 1.0
        ELSE CAST(theta AS DOUBLE) / 1152921504606846976.0 END), 4) AS est_b,
  round(count(*) / (CASE WHEN theta > 1152921504606846976 THEN 1.0
        ELSE CAST(theta AS DOUBLE) / 1152921504606846976.0 END), 4) AS est_union,
  round(sum(in_a * in_b) / (CASE WHEN theta > 1152921504606846976 THEN 1.0
        ELSE CAST(theta AS DOUBLE) / 1152921504606846976.0 END), 4) AS est_intersection
FROM sides
GROUP BY theta
"""


ORACLES["event_value_histogram"] = """
SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bin,
  CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2
ORDER BY event_type, bin
"""

ORACLES["price_quantity_regression"] = """
WITH q AS (
  SELECT l_returnflag,
    CAST(round(l_quantity * 100) AS BIGINT) AS x,
    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem),
m AS (
  SELECT l_returnflag,
    CAST(count(*) AS BIGINT) AS n,
    sum(x) AS sx, sum(y) AS sy,
    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM q GROUP BY l_returnflag)
SELECT l_returnflag, n,
  round(CAST(n * sxy - sx * sy AS DOUBLE)
        / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
  round((CAST(sy AS DOUBLE)
         - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
           * CAST(sx AS DOUBLE))
        / CAST(n AS DOUBLE) / 100.0, 4) AS intercept,
  round(CAST(n * sxy - sx * sy AS DOUBLE)
        / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)),
        6) AS r
FROM m
ORDER BY l_returnflag
"""


def _corpus_prep_sql() -> str:
    toks = "CAST(len(regexp_extract_all({c}, '" + TOKEN_REGEX + "')) AS BIGINT)"
    q = _quality_score_expr("text")
    return f"""
WITH l0 AS (
  SELECT doc_id,
    unnest(string_split(text, chr(10))) AS line,
    generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM documents),
nb AS (
  SELECT doc_id, pos, line,
    row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM l0 WHERE length(trim(line)) > 0),
kept AS (
  SELECT doc_id, pos, line FROM nb WHERE rn = 1
  UNION ALL
  SELECT doc_id, pos, line FROM l0 WHERE length(trim(line)) = 0),
d1 AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
  FROM kept GROUP BY doc_id),
d2 AS (
  SELECT doc_id, text FROM d1 WHERE round({q}, 4) >= 0.6),
d3 AS (
  SELECT doc_id,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
          '{_PII_IP}', '<IP>', 'g'),
        '{_PII_SSN}', '<SSN>', 'g'),
      '{_PII_PHONE}', '<PHONE>', 'g') AS text
  FROM d2),
d4 AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text, row_number() OVER (
      PARTITION BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
      ORDER BY doc_id) AS rn
    FROM d3)
  WHERE rn = 1)
SELECT '0_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
  coalesce(sum({toks.format(c='text')}), 0)::BIGINT AS n_tokens FROM documents
UNION ALL
SELECT '1_line_dedup', CAST(count(*) AS BIGINT),
  coalesce(sum({toks.format(c='text')}), 0)::BIGINT FROM d1
UNION ALL
SELECT '2_quality', CAST(count(*) AS BIGINT),
  coalesce(sum({toks.format(c='text')}), 0)::BIGINT FROM d2
UNION ALL
SELECT '3_pii_redacted', CAST(count(*) AS BIGINT),
  coalesce(sum({toks.format(c='text')}), 0)::BIGINT FROM d3
UNION ALL
SELECT '4_exact_dedup', CAST(count(*) AS BIGINT),
  coalesce(sum({toks.format(c='text')}), 0)::BIGINT FROM d4
ORDER BY stage
"""


ORACLES["corpus_prep_e2e"] = _corpus_prep_sql()


def _sql_half_up(a: str, b: str) -> str:
    """DuckDB twin of timeseries._half_up: round-half-away-from-zero of
    a/b (b > 0) in integer arithmetic, sign-safe under `//` flooring."""
    return (
        f"(CASE WHEN ({a}) < 0"
        f" THEN -(((-({a})) * 2 + ({b})) // (({b}) * 2))"
        f" ELSE ((({a}) * 2 + ({b})) // (({b}) * 2)) END)"
    )


ORACLES["timeseries_gapfill"] = """
WITH obs AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         SUM(CAST(round(value * 1e6) AS BIGINT)) AS sq,
         COUNT(*) AS n_obs
  FROM events
  WHERE user_id % 20 = 0
  GROUP BY 1, 2
), span AS (
  SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM obs GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
  FROM span
), j AS (
  SELECT g.user_id, g.bucket, o.sq, o.n_obs,
         CAST(epoch(g.bucket) AS BIGINT) AS t
  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.bucket = o.bucket
), w AS (
  SELECT *,
    last_value(sq IGNORE NULLS) OVER wp AS p_sq,
    last_value(n_obs IGNORE NULLS) OVER wp AS p_n,
    last_value(CASE WHEN n_obs IS NOT NULL THEN t END IGNORE NULLS) OVER wp AS p_t,
    first_value(sq IGNORE NULLS) OVER wn AS nx_sq,
    first_value(n_obs IGNORE NULLS) OVER wn AS nx_n,
    first_value(CASE WHEN n_obs IS NOT NULL THEN t END IGNORE NULLS) OVER wn AS nx_t
  FROM j
  WINDOW
    wp AS (PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wn AS (PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
, r AS (
  -- exact-integer half-up (away-from-zero) rounding to micro-units:
  -- sign(a) * ((2|a| + b) // (2b)); no float round() anywhere
  -- (cross-engine .5 ties flip otherwise), and the abs/sign guard keeps
  -- negative quantized sums exact (// floors, Spark's div truncates)
  SELECT *,
    CAST(p_sq AS HUGEINT) * nx_n * (nx_t - t)
      + CAST(nx_sq AS HUGEINT) * p_n * (t - p_t) AS gap_num,
    CAST(p_n AS HUGEINT) * nx_n * (nx_t - p_t) AS gap_den
  FROM w
)
SELECT user_id,
       bucket AS bucket_ts,
       coalesce(n_obs, 0) AS n_obs,
       CAST(__HU_OBS__ AS DOUBLE) / 1e6 AS v_obs,
       CAST(__HU_LOCF__ AS DOUBLE) / 1e6 AS v_locf,
       CAST(CASE
         WHEN n_obs IS NOT NULL THEN __HU_OBS__
         WHEN p_n IS NOT NULL AND nx_n IS NOT NULL THEN __HU_GAP__
         WHEN p_n IS NOT NULL THEN __HU_LOCF__
         ELSE __HU_NX__
       END AS DOUBLE) / 1e6 AS v_interp
FROM r
""".replace("__HU_OBS__", _sql_half_up("sq", "n_obs")).replace(
    "__HU_LOCF__", _sql_half_up("p_sq", "p_n")
).replace("__HU_NX__", _sql_half_up("nx_sq", "nx_n")).replace(
    "__HU_GAP__", _sql_half_up("gap_num", "gap_den")
)


ORACLES["event_transition_matrix"] = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       round(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS share
FROM pairs
"""


ORACLES["fuzzy_name_pairs"] = """
WITH grp AS (
  SELECT p_name AS name, MIN(p_partkey) AS id, COUNT(*) AS n
  FROM part GROUP BY 1
), base AS (
  SELECT concat(split_part(name, ' ', 1), '#',
                CAST(length(name) // 4 AS VARCHAR)) AS blk,
         id, name, n
  FROM grp
)
SELECT l.id AS id_a, r.id AS id_b,
       l.name AS name_a, r.name AS name_b,
       levenshtein(l.name, r.name) AS dist,
       l.n AS n_a, r.n AS n_b
FROM base l JOIN base r ON l.blk = r.blk AND l.id < r.id
WHERE levenshtein(l.name, r.name) <= 4
"""


_STATS_COL_NUM = """
SELECT '{c}' AS col_name, COUNT(*) AS n,
       COUNT(*) FILTER ({c} IS NULL) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS DOUBLE) AS min_num, CAST(MAX({c}) AS DOUBLE) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM lineitem
"""

_STATS_COL_STR = """
SELECT '{c}' AS col_name, COUNT(*) AS n,
       COUNT(*) FILTER ({c} IS NULL) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
       MIN({c}) AS min_str, MAX({c}) AS max_str
FROM lineitem
"""

ORACLES["analyze_table_stats"] = " UNION ALL ".join(
    [_STATS_COL_NUM.format(c=c) for c in ("l_orderkey", "l_quantity", "l_extendedprice")]
    + [_STATS_COL_STR.format(c=c) for c in ("l_returnflag", "l_linestatus")]
)


ORACLES["incremental_revenue_mv"] = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


ORACLES["time_weighted_avg"] = """
WITH s AS (
  SELECT user_id,
         epoch_us(ts) AS t,
         CAST(round(value * 1e6) AS BIGINT) AS qv,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_us(ts) AS dt
  FROM events
), a AS (
  SELECT user_id, COUNT(*) AS n_obs,
         SUM(CAST(qv AS HUGEINT) * dt) AS num,
         CAST(SUM(dt) AS BIGINT) AS span_us
  FROM s GROUP BY 1
)
SELECT user_id, n_obs, coalesce(span_us, 0) AS span_us,
       CASE WHEN span_us > 0
            THEN CAST(__HU_TWA__ AS DOUBLE) / 1e6
       END AS twa
FROM a
""".replace("__HU_TWA__", _sql_half_up("num", "span_us"))


ORACLES["event_anomaly_zscore"] = """
WITH base AS (
  SELECT event_id, event_type, value,
         CAST(round(value * 1e6) AS BIGINT) AS qv
  FROM events
), m AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(qv AS HUGEINT)) AS sx,
         SUM(CAST(qv AS HUGEINT) * qv) AS sxx
  FROM base GROUP BY 1
)
SELECT event_id, b.event_type, value,
       round(CAST(qv * m.n - m.sx AS DOUBLE)
             / sqrt(CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)), 6) AS z
FROM base b JOIN m USING (event_type)
WHERE abs(CAST(qv * m.n - m.sx AS DOUBLE)
          / sqrt(CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE))) >= 2.5
"""


ORACLES["supplier_reachability"] = """
WITH RECURSIVE edges AS (
  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
  UNION ALL
  SELECT l_suppkey * 2 + 1 AS src, o_custkey * 2 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), r AS (
  SELECT CAST(2 AS BIGINT) AS node, 0 AS hops
  UNION
  SELECT e.dst AS node, r.hops + 1 AS hops
  FROM r JOIN edges e ON e.src = r.node
  WHERE r.hops < 2
)
SELECT node, CAST(MIN(hops) AS INT) AS hops FROM r GROUP BY node
"""


ORACLES["value_equidepth_histogram"] = """
WITH ranked AS (
  SELECT value,
         row_number() OVER (ORDER BY value, event_id) AS rnk,
         COUNT(*) OVER () AS total
  FROM events
)
SELECT CAST((10 * (rnk - 1)) // total AS INT) AS bucket,
       COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi
FROM ranked
GROUP BY 1
"""


ORACLES["key_skew_report"] = """
WITH counts AS (
  SELECT user_id AS key, COUNT(*) AS cnt FROM events GROUP BY 1
), t AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS nkeys FROM counts
), top AS (
  SELECT key, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, key ASC) AS INT) AS rank
  FROM counts
  QUALIFY rank <= 10
)
SELECT rank, CAST(key AS VARCHAR) AS key, cnt,
       round(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
       round(CAST(cnt AS DOUBLE) * CAST(nkeys AS DOUBLE)
             / CAST(total AS DOUBLE), 6) AS uniform_ratio
FROM top, t
"""


ORACLES["cusum_drift"] = """
WITH base AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 1e6) AS BIGINT) AS qv
  FROM events
), m AS (
  SELECT user_id, COUNT(*) AS n, SUM(CAST(qv AS HUGEINT)) AS sx
  FROM base GROUP BY 1
), w AS (
  SELECT b.user_id, b.event_id, b.ts, m.n,
         SUM(CAST(b.qv AS HUGEINT) * m.n - m.sx) OVER pk AS p
  FROM base b JOIN m USING (user_id)
  WINDOW pk AS (PARTITION BY b.user_id ORDER BY b.ts, b.event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), s AS (
  SELECT user_id, event_id, ts, n,
         p - LEAST(CAST(0 AS HUGEINT),
                   MIN(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS cs
  FROM w
)
SELECT user_id, event_id, ts,
       CAST(__HU_CS__ AS DOUBLE) / 1e6 AS drift
FROM s
WHERE cs > CAST(100000000 AS HUGEINT) * n
""".replace("__HU_CS__", _sql_half_up("cs", "n"))


ORACLES["rolling_zscore_anomaly"] = """
WITH base AS (
  SELECT event_id, user_id, ts, value,
         CAST(round(value * 1e6) AS BIGINT) AS qv
  FROM events
), r AS (
  SELECT *,
    COUNT(*) OVER tw AS rn,
    SUM(CAST(qv AS HUGEINT)) OVER tw AS rsum,
    SUM(CAST(qv AS HUGEINT) * qv) OVER tw AS rss
  FROM base
  WINDOW tw AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
), s AS (
  SELECT *, rn * rss - rsum * rsum AS varn,
         CAST(qv * rn - rsum AS DOUBLE) AS znum
  FROM r
  WHERE rn = 24
)
SELECT event_id, user_id, ts, value,
       round(znum / sqrt(CAST(varn AS DOUBLE)), 6) AS z
FROM s
WHERE varn > 0 AND abs(znum / sqrt(CAST(varn AS DOUBLE))) >= 3.0
"""


ORACLES["value_distribution_drift"] = """
WITH binned AS (
  SELECT LEAST(GREATEST(CAST(floor((value - 0.0) / 25.0) AS INT), 0), 19) AS bin,
         ts < TIMESTAMP '2024-07-01' AS is_ref
  FROM events
), a AS (
  SELECT bin, COUNT(*) AS n_ref FROM binned WHERE is_ref GROUP BY 1
), c AS (
  SELECT bin, COUNT(*) AS n_cur FROM binned WHERE NOT is_ref GROUP BY 1
), grid AS (
  SELECT CAST(unnest(generate_series(0, 19)) AS INT) AS bin
), merged AS (
  SELECT g.bin, coalesce(a.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur
  FROM grid g LEFT JOIN a USING (bin) LEFT JOIN c USING (bin)
), t AS (
  SELECT *,
    CAST(SUM(n_ref) OVER () + 20 AS DOUBLE) AS ta,
    CAST(SUM(n_cur) OVER () + 20 AS DOUBLE) AS tc
  FROM merged
)
SELECT bin, n_ref, n_cur,
  CAST(CAST(round(
    (CAST(n_ref + 1 AS DOUBLE) / ta - CAST(n_cur + 1 AS DOUBLE) / tc)
    * ln((CAST(n_ref + 1 AS DOUBLE) / ta) / (CAST(n_cur + 1 AS DOUBLE) / tc))
    * 1e6) AS BIGINT) AS DOUBLE) / 1e6 AS psi_term
FROM t
"""


ORACLES["event_gaps_report"] = """
WITH s AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS t,
         lead(ts) OVER pk AS next_ts,
         lead(epoch_us(ts)) OVER pk AS next_t
  FROM events
  WINDOW pk AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, ts AS gap_start, next_ts AS gap_end,
       (next_t - t) / 1e6 AS gap_s
FROM s
WHERE next_t - t > CAST(3600 AS BIGINT) * 1000000
"""


ORACLES["funnel_latency_percentiles"] = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2, MIN(v.t1) AS t1
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3, MIN(c.t2) AS t2
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY 1
), lat AS (
  SELECT 'view_to_click' AS edge,
         (epoch_us(t2) - epoch_us(t1)) / 1e6 AS lat_s FROM c
  UNION ALL
  SELECT 'click_to_purchase' AS edge,
         (epoch_us(t3) - epoch_us(t2)) / 1e6 AS lat_s FROM p
)
SELECT edge, COUNT(*) AS n,
       round(quantile_cont(lat_s, 0.5), 6) AS p50,
       round(quantile_cont(lat_s, 0.9), 6) AS p90,
       round(quantile_cont(lat_s, 0.99), 6) AS p99
FROM lat GROUP BY edge
"""

# r8 skew-proof bucketed twins are physical rewrites with identical output
ORACLES["event_gaps_report_bucketed"] = ORACLES["event_gaps_report"]
ORACLES["event_transition_matrix_bucketed"] = ORACLES["event_transition_matrix"]
ORACLES["cusum_drift_bucketed"] = ORACLES["cusum_drift"]
ORACLES["rolling_zscore_bucketed"] = ORACLES["rolling_zscore_anomaly"]
ORACLES["time_weighted_avg_bucketed"] = ORACLES["time_weighted_avg"]
ORACLES["purchase_attribution_bucketed"] = ORACLES["purchase_attribution"]
