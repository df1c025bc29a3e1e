"""Skew-aware join — salting (SURVEY.md §7 hard-part 8 / north star).

The session enables AQE skew-join splitting, which handles most skew at
runtime. This utility is the explicit form for the cases AQE can't fix:
a hot build side that must broadcast-replicate, or a stable pipeline
where the skew is known up front (e.g. one mega-customer holding 10% of
a 100 TB fact table).

Mechanics: the fact side gets a deterministic salt in ``[0, n)`` derived
by hashing a high-cardinality disambiguator column; the dimension side
is replicated n× with every salt value; the join key becomes
``(key, salt)``, splitting each hot key's rows across n reducer
partitions. Results are identical to the unsalted join (the salt is
dropped), only the partitioning changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(facts: DataFrame, dim: DataFrame, key: str,
                disambiguator: str, n_salts: int = 16,
                how: str = "inner") -> DataFrame:
    """Join ``facts`` to ``dim`` on ``key`` with n-way salt splitting.

    ``disambiguator`` is any fact column whose values vary within a hot
    key (a row id, timestamp, line number) — hashing it spreads the hot
    key's rows uniformly and *deterministically* (no ``rand()``: reruns
    and retries land rows in the same partition, SURVEY.md §7
    hard-part 4).
    """
    salt = F.pmod(F.xxhash64(F.col(disambiguator)), F.lit(n_salts))
    salted_facts = facts.withColumn("__salt", salt)
    salted_dim = (dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0),
                                       F.lit(n_salts - 1))))
        .withColumn("__salt", F.col("__salt").cast("bigint")))
    out = salted_facts.join(salted_dim, on=[key, "__salt"], how=how)
    return out.drop("__salt")
