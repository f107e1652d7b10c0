#!/usr/bin/env python3
"""Cross-engine pin for the shared exact ln tree (queries/Corpus.scala).

The Spark kernel is spec-pinned bit-equal to the Spark SQL spelling
(MicroLnSpec); this script pins the DUCKDB spelling against a third
independent implementation of the same IEEE tree (Python floats are
IEEE-754 doubles with correctly-rounded ops, like the JVM and DuckDB),
so all three engines are transitively bit-equal:

    kernel == spark tree == (this script) python tree == duckdb tree

Usage: python3 tools/lncheck.py   (exit 0 = all equal)
"""
import math
import random
import sys

import duckdb


def ln_tree_py(n: int) -> float:
    e = n.bit_length() - 1
    a = float(n)
    p = float(1 << e)
    t = (a - p) / (a + p)
    t2 = t * t
    return e * 0.6931471805599453 + t * (2.0 + t2 * (0.6666666666666666 +
        t2 * (0.4 + t2 * (0.2857142857142857 + t2 * (0.2222222222222222 +
            t2 * 0.18181818181818182)))))


def micro_ln_py(n: int) -> int:
    return int(math.floor(1000000.0 * ln_tree_py(n) + 0.5))


def micro_ln_ratio_py(a: int, b: int) -> int:
    return int(math.floor(1000000.0 * (ln_tree_py(a) - ln_tree_py(b)) + 0.5))


def duck_ln_tree(n: str) -> str:
    e = f"(length(bin({n})) - 1)"
    p = f"(CAST(1 AS BIGINT) << {e})"
    a = f"CAST({n} AS DOUBLE)"
    pd = f"CAST({p} AS DOUBLE)"
    t = f"(({a} - {pd}) / ({a} + {pd}))"
    t2 = f"({t} * {t})"
    return (f"(CAST({e} AS DOUBLE) * 0.6931471805599453 + {t} * (2.0 + {t2} * "
            f"(0.6666666666666666 + {t2} * (0.4 + {t2} * (0.2857142857142857 + {t2} * "
            f"(0.2222222222222222 + {t2} * 0.18181818181818182))))))")


def main() -> None:
    rnd = random.Random(71)
    values = list(range(1, 8193))
    for k in range(62):
        for v in ((1 << k) - 1, 1 << k, (1 << k) + 1):
            if v >= 1:
                values.append(v)
    values += [rnd.randrange(1, (1 << 62) - 2) for _ in range(4000)]
    values = sorted(set(values))
    con = duckdb.connect()
    con.execute("CREATE TABLE v (n BIGINT)")
    con.executemany("INSERT INTO v VALUES (?)", [(v,) for v in values])
    ln = duck_ln_tree("n")
    got = con.execute(
        f"SELECT n, CAST(FLOOR(1000000.0 * {ln} + 0.5) AS BIGINT) FROM v ORDER BY n"
    ).fetchall()
    bad = [(n, g, micro_ln_py(n)) for n, g in got if g != micro_ln_py(n)]
    # ratio form on random pairs
    pairs = [(rnd.choice(values), rnd.choice(values)) for _ in range(6000)]
    con.execute("CREATE TABLE p (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    lr = (f"CAST(FLOOR(1000000.0 * ({duck_ln_tree('a')} - {duck_ln_tree('b')})"
          f" + 0.5) AS BIGINT)")
    got2 = con.execute(f"SELECT a, b, {lr} FROM p").fetchall()
    bad += [(a, b, g, micro_ln_ratio_py(a, b))
            for a, b, g in got2 if g != micro_ln_ratio_py(a, b)]
    if bad:
        print(f"FAIL: {len(bad)} mismatches, first 5: {bad[:5]}")
        sys.exit(1)
    print(f"PASS: duckdb ln tree == python IEEE tree on {len(values)} values "
          f"+ {len(pairs)} ratio pairs")


if __name__ == "__main__":
    main()
