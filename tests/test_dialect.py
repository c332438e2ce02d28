"""PG→Spark dialect translation unit tests (no Spark session)."""

import datetime

import pytest

from youcruit_tap_rawpostgresql_spark.plans.dialect import (
    bind_params,
    translate_pg_sql,
)


def test_uuid_cast():
    # reference tests/test_postgres.py:155
    out = translate_pg_sql("SELECT 'x'::uuid AS id")
    assert out == "SELECT CAST('x' AS string) AS id"


def test_timestamptz_literal():
    # reference tests/test_postgres.py:156
    out = translate_pg_sql("SELECT timestamptz '2021-11-22T11:45:11+00:00' AS t")
    assert out == "SELECT TIMESTAMP '2021-11-22T11:45:11+00:00' AS t"


def test_chained_and_typed_casts():
    assert (
        translate_pg_sql("SELECT a::int8 AS x, (b + 1)::double precision AS y")
        == "SELECT CAST(a AS bigint) AS x, CAST((b + 1) AS double) AS y"
    )


def test_now_translation():
    assert translate_pg_sql("SELECT now() AS t") == "SELECT current_timestamp() AS t"


def test_bind_params():
    # reference client.py:264-298 — :rep_key_val bound as literal
    out = bind_params(
        "SELECT * FROM t WHERE ts > :rep_key_val",
        {"rep_key_val": datetime.datetime(2024, 1, 20)},
    )
    assert out == "SELECT * FROM t WHERE ts > TIMESTAMP '2024-01-20 00:00:00'"


def test_bind_params_quotes_strings():
    out = bind_params("SELECT :v AS v", {"v": "O'Brien"})
    assert out == "SELECT 'O\\'Brien' AS v"


def test_unbound_param_raises():
    with pytest.raises(KeyError):
        bind_params("SELECT :nope", {})


def test_cast_not_confused_by_alias():
    out = translate_pg_sql("SELECT 'v'::uuid AS id, 2 AS two")
    assert out == "SELECT CAST('v' AS string) AS id, 2 AS two"


def test_string_agg_translation():
    out = translate_pg_sql("SELECT string_agg(name, ',') AS s FROM t GROUP BY k")
    assert out == "SELECT listagg(name, ',') AS s FROM t GROUP BY k"


def test_string_agg_with_order_by():
    out = translate_pg_sql("SELECT string_agg(name, ', ' ORDER BY name) AS s FROM t")
    assert (
        out == "SELECT listagg(name, ', ') WITHIN GROUP (ORDER BY name) AS s FROM t"
    )


def test_unnest_translation():
    out = translate_pg_sql("SELECT unnest(tags) AS tag FROM t")
    assert out == "SELECT explode(tags) AS tag FROM t"
