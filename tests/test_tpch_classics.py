"""Classic TPC-H analytics expressed in Cypher over the graph overlay,
verified against the canonical SQL in DuckDB — the 'a reference user can
run their real reports' demonstration (Q1, Q3, Q5, Q10 shapes, lightly
adapted to the overlay's exposed properties)."""

from __future__ import annotations

from opencyphertranspiler_spark.testing import assert_frames_match


def check(engine, duck, cypher: str, sql: str):
    assert_frames_match(engine.cypher(cypher).toPandas(), duck.sql(sql).df())


def test_q1_pricing_summary(engine, duck):
    check(
        engine,
        duck,
        """
        MATCH (l:Lineitem)
        WHERE l.l_shipdate <= '1998-09-02'
        RETURN l.l_returnflag AS l_returnflag, l.l_linestatus AS l_linestatus,
               round(sum(l.l_quantity), 2) AS sum_qty,
               round(sum(l.l_extendedprice), 2) AS sum_base_price,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS sum_disc_price,
               round(sum(l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax)), 2)
                   AS sum_charge,
               round(avg(l.l_quantity), 4) AS avg_qty,
               round(avg(l.l_extendedprice), 4) AS avg_price,
               round(avg(l.l_discount), 4) AS avg_disc,
               count(*) AS count_order
        """,
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                   AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """,
    )


def test_q3_shipping_priority(engine, duck):
    check(
        engine,
        duck,
        """
        MATCH (c:Customer)-[:PLACED]->(o:Orders)-[:CONTAINS]->(l:Lineitem)
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < '1995-03-15' AND l.l_shipdate > '1995-03-15'
        RETURN id(o) AS o_orderkey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               o.o_orderdate AS o_orderdate
        ORDER BY revenue DESC, o_orderkey LIMIT 10
        """,
        """
        SELECT o.o_orderkey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               o.o_orderdate
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15'
          AND l.l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY o.o_orderkey, o.o_orderdate
        ORDER BY revenue DESC, o.o_orderkey LIMIT 10
        """,
    )


def test_q5_local_supplier_volume(engine, duck):
    check(
        engine,
        duck,
        """
        MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)-[:IN_REGION]->(r:Region),
              (c)-[:PLACED]->(o:Orders)-[:CONTAINS]->(l:Lineitem)
                  -[:FROM_SUPPLIER]->(s:Supplier),
              (s)-[:FROM_NATION]->(n)
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= '1994-01-01' AND o.o_orderdate < '1995-01-01'
        RETURN n.n_name AS n_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        ORDER BY revenue DESC
        """,
        """
        SELECT n.n_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
                       AND s.s_nationkey = n.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1994-01-01'
          AND o.o_orderdate < TIMESTAMP '1995-01-01'
        GROUP BY n.n_name
        ORDER BY revenue DESC
        """,
    )


def test_q10_returned_items(engine, duck):
    check(
        engine,
        duck,
        """
        MATCH (c:Customer)-[:PLACED]->(o:Orders)-[:CONTAINS]->(l:Lineitem),
              (c)-[:FROM_NATION]->(n:Nation)
        WHERE o.o_orderdate >= '1993-10-01' AND o.o_orderdate < '1994-01-01'
          AND l.l_returnflag = 'R'
        RETURN id(c) AS c_custkey, c.c_name AS c_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               round(c.c_acctbal, 2) AS c_acctbal, n.n_name AS n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
        """,
        """
        SELECT c.c_custkey, c.c_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               round(c.c_acctbal, 2) AS c_acctbal, n.n_name
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1993-10-01'
          AND o.o_orderdate < TIMESTAMP '1994-01-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c.c_custkey LIMIT 20
        """,
    )
