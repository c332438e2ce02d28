"""JDBC source: the production-parity path for the reference's PostgreSQL
extraction (reference S1/S2, ``client.py:33-49`` + ``client.py:300-304``).

The reference ships the whole stream SQL to PostgreSQL over one psycopg2
connection. Spark's JDBC source does the same whole-query pushdown via the
``query`` option — and generalizes it to parallel extraction with
``partitionColumn/lowerBound/upperBound/numPartitions`` (the reference is
architecturally single-connection, ``client.py:106-119``).

No live PostgreSQL (or its JDBC driver jar) exists in this environment, so
``read_jdbc_stream`` is exercised only up to options construction in tests;
the call itself is the standard ``spark.read.format("jdbc")`` path.

Scale: for a 100 TB extraction you'd set ``partitionColumn`` to the
replication key (or any indexed numeric/timestamp column) so N executors
each pull a bounded range; the incremental filter folds into each
partition's WHERE clause server-side.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession


def jdbc_url(config: Mapping[str, Any]) -> str:
    """postgresql JDBC URL from the reference's config shape
    (host/port/database/user/password — ``tap.py:33-61``). An explicit
    ``jdbc_url`` wins — the injected-engine analogue of the reference's
    connection-injection mode (``client.py:28-31``), and what lets the
    test suite point the SAME sync path at embedded Derby."""
    if config.get("jdbc_url"):
        return str(config["jdbc_url"])
    host = config.get("host", "localhost")
    port = config.get("port", 5432)
    database = config["database"]
    return f"jdbc:postgresql://{host}:{port}/{database}"


def jdbc_options(
    config: Mapping[str, Any],
    sql: str,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: Any | None = None,
    upper_bound: Any | None = None,
) -> dict[str, str]:
    """Assemble Spark JDBC reader options with whole-query pushdown."""
    opts: dict[str, str] = {
        "url": jdbc_url(config),
        "driver": str(config.get("driver", "org.postgresql.Driver")),
        "fetchsize": str(config.get("fetchsize", 10_000)),
    }
    # only pass credentials when configured — embedded engines (Derby)
    # reject auth properties they weren't booted with
    for k, src in (("user", "user"), ("password", "password")):
        if config.get(src) is not None:
            opts[k] = str(config[src])
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # fail at assembly time with the real cause — otherwise Spark
            # dies later parsing the stringified 'None' bounds
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        # partitioned parallel read requires dbtable (a derived table)
        opts["dbtable"] = f"({sql}) AS src"
        opts["partitionColumn"] = partition_column
        opts["numPartitions"] = str(num_partitions or 8)
        opts["lowerBound"] = str(lower_bound)
        opts["upperBound"] = str(upper_bound)
    else:
        opts["query"] = sql
    return opts


def read_jdbc_stream(
    spark: SparkSession,
    config: Mapping[str, Any],
    sql: str,
    **partitioning: Any,
) -> DataFrame:
    """Execute stream SQL on the source database (whole-query pushdown)."""
    return (
        spark.read.format("jdbc")
        .options(**jdbc_options(config, sql, **partitioning))
        .load()
    )


def range_predicates(
    column: str,
    lower: int,
    upper: int,
    num_partitions: int,
) -> list[str]:
    """Disjoint, complete WHERE predicates over an integer key range —
    the explicit-predicate form of Spark's partitioned JDBC read
    (``spark.read.jdbc(..., predicates=...)``).

    Unlike lowerBound/upperBound stride partitioning, explicit predicates
    let the caller handle open ends: the first predicate catches values
    below ``lower`` and the last catches values at/above ``upper``, so no
    source row is ever silently dropped (stride partitioning clamps — rows
    outside the bounds land in the edge partitions there too, but the
    explicit form makes the contract visible and testable).
    """
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    if upper <= lower:
        raise ValueError("upper must be > lower")
    if num_partitions == 1:
        return [f"{column} IS NOT NULL OR {column} IS NULL"]  # whole table
    span = upper - lower
    bounds = [lower + (span * i) // num_partitions for i in range(1, num_partitions)]
    preds = [f"{column} < {bounds[0]} OR {column} IS NULL"]
    preds += [
        f"{column} >= {bounds[i]} AND {column} < {bounds[i + 1]}"
        for i in range(len(bounds) - 1)
    ]
    preds.append(f"{column} >= {bounds[-1]}")
    return preds


def hash_predicates(
    column: str, num_partitions: int, dialect: str = "postgresql"
) -> list[str]:
    """Hash-mod WHERE predicates for keys with no usable range (UUIDs,
    skewed ids): source-side hash/mod splits rows evenly regardless of
    key distribution. NULLs ride with bucket 0.

    ``dialect="postgresql"`` (the reference's production target) hashes
    ANY key type via ``hashtext(col::text)``. ``dialect="ansi"`` emits
    plain ``MOD`` on the key — runs on any ANSI engine (Derby, H2, …)
    but requires an INTEGER column; the e2e Derby test executes this
    form live to prove the disjoint-complete contract, which the PG form
    shares structurally (same double-mod bucketing around an int-valued
    expr).

    Scale note: each of the N concurrent queries still scans the table
    server-side unless the column is indexed by an expression index on the
    same hash — prefer ``range_predicates`` on an indexed key when one
    exists; hash split is the fallback that always balances.
    """
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    # sign-safe double mod: hash/key values may be negative and SQL MOD
    # keeps the dividend's sign (and abs(INT_MIN) errors in PostgreSQL,
    # so abs() would fail on ~1/2^32 of keys)
    if dialect == "postgresql":
        inner = f"hashtext({column}::text)"
    elif dialect == "ansi":
        inner = column
    else:
        raise ValueError(f"unknown hash-split dialect {dialect!r}")
    expr = (
        f"mod(mod({inner}, {num_partitions}) "
        f"+ {num_partitions}, {num_partitions})"
    )
    preds = [f"{expr} = {i}" for i in range(num_partitions)]
    preds[0] = f"({preds[0]}) OR {column} IS NULL"
    return preds
