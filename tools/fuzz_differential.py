"""Seeded differential query fuzzer: Spark SQL vs DuckDB.

Generates random-but-reproducible relational queries from a bounded
grammar over the TPC-H-ish tables (scan → optional FK join → filters
→ aggregate | distinct | sort-limit shapes), renders ONE SQL string
in the dialect subset both engines share, runs it through
``spark.sql`` AND DuckDB on the same parquet files, and compares row
count + column names + the order-insensitive value multiset (the
same strict comparator as tools/verify_local.py).

This complements the 400+-query curated contract the way a fuzzer
complements golden tests: the grammar explores PLAN SPACE (join
order × predicate × aggregate combinations nobody hand-wrote) while
every value stays engine-exact by construction:

- ORDER BY always spells ``NULLS FIRST`` (Spark defaults nulls-first
  ascending, DuckDB nulls-last — the one dialect divergence in this
  subset);
- SUM over doubles goes through ``FLOOR(x * 100)`` → BIGINT cents so
  the aggregate is integer-exact under any association order (a raw
  double SUM differs between engines in the last ulp);
- AVG is excluded (decimal-width rules differ); MIN/MAX/COUNT are
  arithmetic-free and safe raw;
- filter constants come from seeded quantile probes, string
  constants from seeded OFFSET picks of real values, so predicates
  are selective against the actual data distribution at any sf.

Usage:
    python tools/fuzz_differential.py [sf_dir] [n_seeds] [start_seed]

Prints one line per seed (ok/FAIL + the SQL on failure), exits 1 on
any failure. tests/test_fuzz_differential.py runs a fixed seed range
at sf0.001 in CI.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = {
    "lineitem": {
        "l_orderkey": "int", "l_partkey": "int", "l_suppkey": "int",
        "l_linenumber": "int", "l_quantity": "num",
        "l_extendedprice": "num", "l_discount": "num", "l_tax": "num",
        "l_returnflag": "str", "l_linestatus": "str",
    },
    "orders": {
        "o_orderkey": "int", "o_custkey": "int", "o_orderstatus": "str",
        "o_totalprice": "num", "o_orderpriority": "str",
    },
    "customer": {
        "c_custkey": "int", "c_name": "str", "c_nationkey": "int",
        "c_acctbal": "num", "c_mktsegment": "str",
    },
    "supplier": {
        "s_suppkey": "int", "s_name": "str", "s_nationkey": "int",
        "s_acctbal": "num",
    },
    "part": {
        "p_partkey": "int", "p_name": "str", "p_brand": "str",
        "p_type": "str", "p_size": "int", "p_retailprice": "num",
    },
    "nation": {"n_nationkey": "int", "n_name": "str", "n_regionkey": "int"},
    "region": {"r_regionkey": "int", "r_name": "str"},
}

# Per-table unique key (composite for lineitem) — used as the window
# tie-break so row_number shapes are deterministic in both engines.
PKS = {
    "lineitem": ["l_orderkey", "l_linenumber"],
    "orders": ["o_orderkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "nation": ["n_nationkey"],
    "region": ["r_regionkey"],
}

# FK edges: (fact table, fact col, dim table, dim col)
JOINS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _cols(tables, kind=None):
    out = []
    for t in tables:
        for c, k in TABLES[t].items():
            if kind is None or k == kind:
                out.append(c)
    return out


def gen_query(seed: int, con) -> str:
    """Render one deterministic SQL statement for ``seed``.

    ``con`` (DuckDB, views registered) is probed for quantile/offset
    constants so predicates stay selective at any scale factor; the
    probes are seeded, so the statement is a pure function of
    (seed, data)."""
    rng = random.Random(seed)
    t0 = rng.choice(list(TABLES))
    tables, joins = [t0], []
    for _ in range(rng.randrange(3)):
        edges = [e for e in JOINS
                 if (e[0] in tables) != (e[2] in tables)]
        if not edges:
            break
        e = rng.choice(edges)
        new = e[2] if e[0] in tables else e[0]
        # LEFT JOIN only when the NEW table is the nullable side, so
        # predicates on already-placed tables keep their semantics.
        kind = "LEFT JOIN" if rng.random() < 0.25 else "JOIN"
        tables.append(new)
        joins.append((e, kind, new))

    # Predicates only on tables joined INNER along the whole chain
    # (a WHERE on a left-joined table's column would silently turn
    # the join back into an inner one — legal SQL, but we want the
    # null-extension path actually exercised).
    inner_tables = [tables[0]] + [
        j[2] for j in joins if j[1] == "JOIN"
    ]
    preds = []
    for _ in range(rng.randrange(3)):
        kind = rng.choice(["int", "num", "str"])
        cands = _cols(inner_tables, kind)
        if not cands:
            continue
        c = rng.choice(cands)
        t = next(t for t in tables if c in TABLES[t])
        if kind == "str":
            n = con.execute(
                f"SELECT count(DISTINCT {c}) FROM {t}"
            ).fetchone()[0]
            if not n:
                continue
            v = con.execute(
                f"SELECT DISTINCT {c} FROM {t} ORDER BY {c} "
                f"LIMIT 1 OFFSET {rng.randrange(n)}"
            ).fetchone()[0]
            v = str(v).replace("'", "''")
            op = rng.choice(["=", "<>", "<=", ">="])
            preds.append(f"{c} {op} '{v}'")
        else:
            q = round(rng.uniform(0.05, 0.95), 2)
            v = con.execute(
                f"SELECT quantile_cont({c}, {q}) FROM {t}"
            ).fetchone()[0]
            if v is None:
                continue
            op = rng.choice(["<", "<=", ">", ">=", "<>"])
            preds.append(f"{c} {op} {float(v):.4f}")

    # FROM clause in join discovery order (each edge adds one table)
    frm = tables[0]
    for e, kind, new in joins:
        frm += f" {kind} {new} ON {e[1]} = {e[3]}"

    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    shapes = ["agg", "agg", "distinct", "toplist", "union"]
    if len(tables) == 1:
        shapes.append("window")
    shape = rng.choice(shapes)
    if shape == "window":
        t = tables[0]
        parts = [c for c in TABLES[t] if TABLES[t][c] == "str"]
        part = rng.choice(parts) if parts else PKS[t][0]
        val = rng.choice(_cols([t], "num") + _cols([t], "int"))
        pk_order = ", ".join(
            f"{c} ASC NULLS FIRST" for c in PKS[t]
        )
        n = rng.randrange(2, 6)
        return (
            f"SELECT * FROM (SELECT {part}, {val}, "
            f"CAST(row_number() OVER (PARTITION BY {part} "
            f"ORDER BY {val} DESC NULLS FIRST, {pk_order}) AS BIGINT)"
            f" AS rn FROM {t}{where}) w WHERE rn <= {n}"
        )
    if shape == "union":
        ucands = _cols([tables[0]], "str") + _cols([tables[0]], "int")
        cols = rng.sample(
            ucands, k=max(1, min(rng.randrange(1, 3), len(ucands)))
        )
        sel = ", ".join(cols)
        t = tables[0]
        setop = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
        own = [p for p in preds if p.split()[0] in TABLES[t]]
        p2 = f" WHERE {own[0]}" if own else ""
        return (
            f"SELECT {sel} FROM {t}{p2} {setop} SELECT {sel} FROM {t}"
        )
    if shape == "agg":
        kcands = _cols(tables, "str") + _cols(tables, "int")
        keys = rng.sample(kcands, k=min(rng.randrange(0, 3), len(kcands)))
        aggs = ["CAST(count(*) AS BIGINT) AS n_rows"]
        nums = _cols(tables, "num")
        ints = _cols(tables, "int")
        if nums and rng.random() < 0.8:
            c = rng.choice(nums)
            aggs.append(
                f"sum(CAST(floor({c} * 100) AS BIGINT)) AS sum_{c}_cents"
            )
        if nums and rng.random() < 0.5:
            c = rng.choice(nums)
            fn = rng.choice(["min", "max"])
            aggs.append(f"{fn}({c}) AS {fn}_{c}")
        if ints and rng.random() < 0.5:
            c = rng.choice(ints)
            aggs.append(f"CAST(count(DISTINCT {c}) AS BIGINT) AS nd_{c}")
        sel = ", ".join(keys + aggs)
        grp = f" GROUP BY {', '.join(keys)}" if keys else ""
        having = ""
        if keys and rng.random() < 0.3:
            having = f" HAVING count(*) >= {rng.randrange(2, 5)}"
        sql = f"SELECT {sel} FROM {frm}{where}{grp}{having}"
        if keys and rng.random() < 0.4:
            # agg + deterministic top-n: order by the count then the
            # full key tuple (total order -> stable LIMIT cut)
            order = ", ".join(
                ["n_rows DESC NULLS FIRST"]
                + [f"{k} ASC NULLS FIRST" for k in keys]
            )
            sql += f" ORDER BY {order} LIMIT {rng.randrange(3, 12)}"
        return sql
    if shape == "distinct":
        kcands = _cols(tables, "str") + _cols(tables, "int")
        keys = rng.sample(
            kcands, k=max(1, min(rng.randrange(1, 3), len(kcands)))
        )
        return f"SELECT DISTINCT {', '.join(keys)} FROM {frm}{where}"
    # toplist: project + total-order sort + limit
    tcands = (_cols(tables, "str") + _cols(tables, "int")
              + _cols(tables, "num"))
    cols = rng.sample(
        tcands, k=max(2, min(rng.randrange(2, 5), len(tcands)))
    )
    order = ", ".join(
        f"{c} {rng.choice(['ASC', 'DESC'])} NULLS FIRST" for c in cols
    )
    return (
        f"SELECT {', '.join(cols)} FROM {frm}{where} "
        f"ORDER BY {order} LIMIT 50"
    )


def run_seeds(spark, con, seeds, verbose=True):
    from tools.verify_local import rowset

    failures = []
    for seed in seeds:
        sql = gen_query(seed, con)
        try:
            sdf = spark.sql(sql)
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:  # either engine erroring is a FAIL
            failures.append(seed)
            print(f"FAIL seed {seed}: error {exc}\n  SQL: {sql}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(
                f"rowcount spark={len(srows)} duck={len(drows)}"
            )
        if sorted(c.lower() for c in scols) != sorted(
            c.lower() for c in dcols
        ):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems and rowset(
            [c.lower() for c in scols], srows
        ) != rowset([c.lower() for c in dcols], drows):
            problems.append("value multiset differs")
        if problems:
            failures.append(seed)
            print(f"FAIL seed {seed}: {'; '.join(problems)}\n  SQL: {sql}")
        elif verbose:
            print(f"ok   seed {seed}: {len(srows)} rows")
    return failures


def main() -> int:
    import duckdb

    from pipeline_dataengineer_spark.catalog import table
    from pipeline_dataengineer_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    start = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = get_spark("fuzz-differential")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    failures = run_seeds(spark, con, range(start, start + n))
    print(f"\n{n - len(failures)}/{n} seeds pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
