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
        out == "SELECT listagg(name, ', ') WITHIN GROUP (ORDER BY name NULLS LAST) AS s FROM t"
    )


def test_string_agg_nested_call_args():
    # args/sort key with nested calls, parens, and commas — the shape the
    # pre-round-6 paren-free regex missed (sqlsmith v2 catch): the inline
    # ORDER BY must still move to WITHIN GROUP
    out = translate_pg_sql(
        "SELECT string_agg(left(name, 2), '|' "
        "ORDER BY coalesce(rank, 0), id) AS s FROM t"
    )
    assert out == (
        "SELECT listagg(left(name, 2), '|') "
        "WITHIN GROUP (ORDER BY coalesce(rank, 0) NULLS LAST, "
        "id NULLS LAST) AS s FROM t"
    )


def test_string_agg_order_by_in_literal_stays_text():
    out = translate_pg_sql("SELECT string_agg(name, ' ORDER BY x ') AS s FROM t")
    assert out == "SELECT listagg(name, ' ORDER BY x ') AS s FROM t"


def test_array_binops():
    assert translate_pg_sql("SELECT a @> b AS c FROM t") == (
        "SELECT forall(b, _ae -> array_contains(a, _ae)) AS c FROM t"
    )
    assert translate_pg_sql("SELECT a <@ b AS c FROM t") == (
        "SELECT forall(a, _ae -> array_contains(b, _ae)) AS c FROM t"
    )
    assert translate_pg_sql("SELECT tags && ARRAY['x'] AS o FROM t") == (
        "SELECT arrays_overlap(tags, array('x')) AS o FROM t"
    )
    # inside literals the operators are data
    sql = "SELECT '@>' AS a, 'x && y' AS b"
    assert translate_pg_sql(sql) == sql


def test_quantified_comparisons():
    # round-13: = ANY routes through the same exists() lambda as every
    # other operator (the old array_contains fast path died loudly on a
    # bare NULL LHS and missed PG's empty-array-false corner)
    assert translate_pg_sql("SELECT 2 = ANY(xs) AS m FROM t") == (
        "SELECT exists(xs, _qe -> (2) = _qe) AS m FROM t"
    )
    # the FULL arithmetic chain is the comparison's left operand
    # (precedence: comparison binds looser than +)
    assert translate_pg_sql("SELECT n + 1 = ANY(xs) AS m FROM t") == (
        "SELECT exists(xs, _qe -> (n + 1) = _qe) AS m FROM t"
    )
    assert translate_pg_sql("SELECT 2 > ANY(xs) AS m FROM t") == (
        "SELECT exists(xs, _qe -> (2) > _qe) AS m FROM t"
    )
    assert translate_pg_sql("SELECT 5 <> ALL(xs) AS n FROM t") == (
        "SELECT forall(xs, _qe -> (5) <> _qe) AS n FROM t"
    )
    assert translate_pg_sql(
        "SELECT c FROM t WHERE k = ANY(SELECT id FROM u)"
    ) == "SELECT c FROM t WHERE k IN (SELECT id FROM u)"
    assert translate_pg_sql(
        "SELECT c FROM t WHERE k <> ALL(SELECT id FROM u)"
    ) == "SELECT c FROM t WHERE k NOT IN (SELECT id FROM u)"
    # aggregate / builtin names that merely contain ANY stay untouched
    sql = "SELECT any_value(x) AS av FROM t"
    assert translate_pg_sql(sql) == sql


def test_quantified_pattern_matches():
    # PG allows any binary operator with ANY/ALL — including the LIKE and
    # regex families (DuckDB can't even parse these, so they're pinned at
    # string level and execute-verified in test_operators-style suites)
    assert translate_pg_sql(
        "SELECT name LIKE ANY(ARRAY['%a%','b%']) AS m FROM t"
    ) == "SELECT exists(array('%a%','b%'), _qe -> (name) LIKE _qe) AS m FROM t"
    assert translate_pg_sql("SELECT name ILIKE ANY(pats) AS m FROM t") == (
        "SELECT exists(pats, _qe -> ilike((name), _qe)) AS m FROM t"
    )
    assert translate_pg_sql("SELECT name NOT LIKE ALL(pats) AS m FROM t") == (
        "SELECT forall(pats, _qe -> NOT ((name) LIKE _qe)) AS m FROM t"
    )
    assert translate_pg_sql("SELECT name ~~* ANY(pats) AS m FROM t") == (
        "SELECT exists(pats, _qe -> ilike((name), _qe)) AS m FROM t"
    )
    assert translate_pg_sql("SELECT name ~* ANY(pats) AS m FROM t") == (
        "SELECT exists(pats, _qe -> (name) RLIKE concat('(?i)', _qe)) AS m FROM t"
    )
    assert translate_pg_sql("SELECT name !~ ALL(pats) AS m FROM t") == (
        "SELECT forall(pats, _qe -> NOT ((name) RLIKE _qe)) AS m FROM t"
    )


def test_quantified_subquery_unsupported_forms_raise():
    # Spark has no general quantified-comparison subquery; anything other
    # than = ANY / <> ALL must fail loudly with a rewrite hint, never
    # reach Spark as a parse error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="quantified subquery"):
        translate_pg_sql("SELECT 1 WHERE 2 > ANY(SELECT x FROM t)")
    with _pytest.raises(ValueError, match="quantified subquery"):
        translate_pg_sql("SELECT 1 WHERE 2 = ALL(SELECT x FROM t)")


def test_array_position_null_when_absent():
    # PG returns NULL when absent AND compares NULL-safely — since
    # round 12 the rewrite is an indexed transform+filter (the earlier
    # nullif(array_position(...), 0) form returned NULL for a NULL
    # search value where PG finds the first NULL element)
    out = translate_pg_sql("SELECT array_position(xs, 'v') AS p FROM t")
    assert "try_element_at(filter(transform(xs" in out
    assert "x <=> ('v')" in out


def test_unnest_translation():
    out = translate_pg_sql("SELECT unnest(tags) AS tag FROM t")
    assert out == "SELECT explode(tags) AS tag FROM t"


def test_json_extract_operators():
    assert (
        translate_pg_sql("SELECT props->>'k' AS k FROM events")
        == "SELECT get_json_object(props, '$.k') AS k FROM events"
    )
    assert (
        translate_pg_sql("SELECT props->'k' AS k FROM events")
        == "SELECT get_json_object(props, '$.k') AS k FROM events"
    )


def test_regex_match_operators():
    assert (
        translate_pg_sql("SELECT * FROM t WHERE name ~ '^ab'")
        == "SELECT * FROM t WHERE name RLIKE '^ab'"
    )
    assert (
        translate_pg_sql("SELECT * FROM t WHERE name ~* '^ab'")
        == "SELECT * FROM t WHERE name RLIKE '(?i)^ab'"
    )
    assert (
        translate_pg_sql("SELECT * FROM t WHERE name !~ 'x'")
        == "SELECT * FROM t WHERE NOT (name RLIKE 'x')"
    )


def test_like_operator_spellings():
    """PG's `~~` family is LIKE, not regex (round-6 differential-execution
    finding: these reached Spark untranslated and failed to parse)."""
    assert (
        translate_pg_sql("SELECT * FROM t WHERE name ~~ 'a%'")
        == "SELECT * FROM t WHERE name LIKE 'a%'"
    )
    assert (
        translate_pg_sql("SELECT * FROM t WHERE name ~~* 'a%'")
        == "SELECT * FROM t WHERE name ILIKE 'a%'"
    )
    assert (
        translate_pg_sql("SELECT * FROM t WHERE name !~~ 'a%'")
        == "SELECT * FROM t WHERE NOT (name LIKE 'a%')"
    )
    assert (
        translate_pg_sql("SELECT * FROM t WHERE name !~~* 'a%'")
        == "SELECT * FROM t WHERE NOT (name ILIKE 'a%')"
    )


def test_match_op_call_lhs():
    """Match-op LHS can be a function call — including the CAST(...) the
    ::cast rewrite itself produces (round-6 extended fuzz campaign,
    v2#837: `(col)::text ~~ 'p'` became `CAST((col) AS string) ~~ 'p'`
    whose call LHS matched no operand alternative, so `~~` survived to
    Spark and failed to parse). Nesting up to two paren levels."""
    assert (
        translate_pg_sql("SELECT (n_regionkey)::text ~~ '%ER' AS e0 FROM nation")
        == "SELECT CAST((n_regionkey) AS string) LIKE '%ER' AS e0 FROM nation"
    )
    assert (
        translate_pg_sql("SELECT left(name, 2) !~~* 'c%' FROM t")
        == "SELECT NOT (left(name, 2) ILIKE 'c%') FROM t"
    )
    assert (
        translate_pg_sql("SELECT coalesce(nullif(name, ''), 'x') ~ '^A' FROM t")
        == "SELECT coalesce(nullif(name, ''), 'x') RLIKE '^A' FROM t"
    )


def test_match_op_keyword_before_paren_lhs_not_swallowed():
    """A SQL keyword preceding a parenthesized match-op LHS must never be
    swallowed as a callee (round-6 advisory: the call-LHS operand form
    admitted `AND (b)` as a call, emitting `NOT (AND (b) RLIKE 'p')` —
    unparseable; and after a keyword guard alone, the scan resumed
    mid-keyword and accepted `ND (b)`)."""
    assert (
        translate_pg_sql("SELECT * FROM t WHERE x AND (b) !~ 'p'")
        == "SELECT * FROM t WHERE x AND NOT ((b) RLIKE 'p')"
    )
    assert (
        translate_pg_sql("SELECT CASE WHEN (x) !~~ 'p' THEN 1 END FROM t")
        == "SELECT CASE WHEN NOT ((x) LIKE 'p') THEN 1 END FROM t"
    )
    assert (
        translate_pg_sql("SELECT a FROM t WHERE b OR (c) ~~* 'q%'")
        == "SELECT a FROM t WHERE b OR (c) ILIKE 'q%'"
    )
    # whitespace-call form still accepted for a genuine (non-keyword) callee
    assert (
        translate_pg_sql("SELECT coalesce (x, 'y') ~ 'p' FROM t")
        == "SELECT coalesce (x, 'y') RLIKE 'p' FROM t"
    )
    # NO-SPACE keyword-before-paren (round-7 self-review: the first fix's
    # blanket lookbehind blocked the paren alternative here, leaving the
    # PG-only operator untranslated — `WHEN(x) ~~ 'p'` kept its `~~`)
    assert (
        translate_pg_sql("SELECT CASE WHEN(x) ~~ 'B%' THEN 1 END FROM t")
        == "SELECT CASE WHEN(x) LIKE 'B%' THEN 1 END FROM t"
    )
    assert (
        translate_pg_sql("SELECT * FROM t WHERE x AND(b) !~~* 'q%'")
        == "SELECT * FROM t WHERE x AND NOT ((b) ILIKE 'q%')"
    )
    assert (
        translate_pg_sql("SELECT * FROM t WHERE NOT(x) ~ 'p'")
        == "SELECT * FROM t WHERE NOT(x) RLIKE 'p'"
    )
    # …and the SAME no-space class in every other word-leading rewrite
    # (round-7 self-review: quantified rewrites, JSON ->, cast
    # callee, and parenthesized-call LHS all fused or mistranslated)
    assert (
        translate_pg_sql("SELECT * FROM t WHERE a AND(x) = ANY(arr)")
        == "SELECT * FROM t WHERE a AND exists(arr, _qe -> (x) = _qe)"
    )
    assert (
        translate_pg_sql("SELECT CASE WHEN(j) ->> 'k' = 'v' THEN 1 END FROM t")
        == "SELECT CASE WHEN get_json_object((j), '$.k') = 'v' THEN 1 END FROM t"
    )
    assert (
        translate_pg_sql("SELECT * FROM t WHERE a AND(x) @> ARRAY['q']")
        == "SELECT * FROM t WHERE a AND forall(array('q'), "
        "_ae -> array_contains((x), _ae))"
    )
    assert (
        translate_pg_sql("SELECT sum (x)::int8 FROM t")
        == "SELECT CAST(sum (x) AS bigint) FROM t"
    )
    assert (
        translate_pg_sql("SELECT * FROM t WHERE x AND(b)::text ~~ 'p'")
        == "SELECT * FROM t WHERE x AND CAST((b) AS string) LIKE 'p'"
    )
    # parenthesized CALL as the match-op LHS (one nesting level)
    assert (
        translate_pg_sql("SELECT * FROM t WHERE (f(b)) ~~ 'p'")
        == "SELECT * FROM t WHERE (f(b)) LIKE 'p'"
    )
    assert (
        translate_pg_sql("SELECT * FROM t WHERE a AND (f(b)) !~ 'p'")
        == "SELECT * FROM t WHERE a AND NOT ((f(b)) RLIKE 'p')"
    )


def test_quantified_literal_lhs_not_mangled_by_json_rewrite():
    """String-literal LHS in a quantified comparison: an unparenthesized
    generated lambda (``_qe -> 'a' <> _qe`` before round 6) was eaten by
    the JSON -> rewrite into ``get_json_object(_qe, '$.a') <> _qe``
    (round-6 advisory). The LHS is parenthesized — since round-9
    session 2 unconditionally, guarding the integer-index arrow rule
    too — so the lambda arrow survives."""
    assert (
        translate_pg_sql("SELECT * FROM t WHERE 'a' <> ANY(arr)")
        == "SELECT * FROM t WHERE exists(arr, _qe -> ('a') <> _qe)"
    )
    assert (
        translate_pg_sql("SELECT * FROM t WHERE 'a%' !~~ ALL(arr)")
        == "SELECT * FROM t WHERE forall(arr, _qe -> NOT (('a%') LIKE _qe))"
    )
    assert (
        translate_pg_sql("SELECT 'x' LIKE ANY(pats) AS m FROM t")
        == "SELECT exists(pats, _qe -> ('x') LIKE _qe) AS m FROM t"
    )


def test_identifier_ending_in_like_before_any_not_rewritten():
    """`x_like ANY(arr)` (invalid PG, fuzz-reachable) must pass through
    untouched — the LIKE alternative in the quantified-comparison tail
    now word-boundary-anchors so partial identifier tails never match
    (round-6 advisory)."""
    sql = "SELECT * FROM t WHERE x_like ANY(arr)"
    assert translate_pg_sql(sql) == sql
    # the genuine keyword form still translates
    assert (
        translate_pg_sql("SELECT * FROM t WHERE x LIKE ANY(arr)")
        == "SELECT * FROM t WHERE exists(arr, _qe -> (x) LIKE _qe)"
    )


def test_regexp_replace_flags_and_generate_series():
    """PG's 4-arg regexp_replace flags form and generate_series (round-6
    differential-execution findings: 'g' would be read as Spark's integer
    position parameter; generate_series doesn't exist in Spark)."""
    assert (
        translate_pg_sql("SELECT regexp_replace(a, '[0-9]', 'x', 'g') AS r")
        == "SELECT regexp_replace(a, '[0-9]', 'x') AS r"
    )
    assert (
        translate_pg_sql("SELECT regexp_replace(a, '^c', 'K', 'gi') AS r")
        == "SELECT regexp_replace(a, '(?i)^c', 'K') AS r"
    )
    # nested: the inner 'g' call stays a plain replace-all; the outer
    # 'i'-without-g call is FIRST-match in PG, so it compiles to the
    # round-11 position surgery over the translated inner call
    nested = translate_pg_sql(
        "SELECT regexp_replace(regexp_replace(a, ',', '(', 'g'), 'p', 'q', 'i') AS r"
    )
    assert "regexp_replace(a, ',', '(')" in nested
    assert "regexp_instr" in nested and "'(?i)p'" in nested
    # flagless 3-arg form is PG's FIRST-match replace — the round-11
    # probe batch found the old verbatim pass-through silently replaced
    # ALL matches; it now compiles to instr/extract position surgery
    out = translate_pg_sql("SELECT regexp_replace(a, 'x', 'y') AS r")
    assert "regexp_instr(a, 'x')" in out and "ELSE a END" in out
    assert (
        translate_pg_sql("SELECT unnest(generate_series(1, 5)) AS v")
        == "SELECT explode(sequence(1, 5)) AS v"
    )


def test_spark_lambda_not_mangled_by_json_rule():
    # `->` only translates when followed by a quoted key
    sql = "SELECT transform(xs, x -> x + 1) FROM t"
    assert translate_pg_sql(sql) == sql


def test_array_length_epoch_random_strpos():
    # PG's array_length is NULL for empty arrays (size() says 0);
    # nested-call operands are handled structurally (round-6 rebuild)
    assert (
        translate_pg_sql("SELECT array_length(xs, 1) AS n")
        == "SELECT nullif(size(xs), 0) AS n"
    )
    assert (
        translate_pg_sql("SELECT array_length(array_cat(a, b), 1) AS n")
        == "SELECT nullif(size(concat(a, b)), 0) AS n"
    )
    # fractional seconds preserved (PG returns numeric, not floored
    # whole seconds — round-6 differential-execution finding)
    assert (
        translate_pg_sql("SELECT EXTRACT(EPOCH FROM ts) AS e")
        == "SELECT (unix_micros(CAST(ts AS TIMESTAMP)) / 1e6) AS e"
    )
    assert translate_pg_sql("SELECT random() AS r") == "SELECT rand() AS r"
    assert (
        translate_pg_sql("SELECT strpos(name, 'x') AS p")
        == "SELECT instr(name, 'x') AS p"
    )


def test_escape_string_literal_prefix_drops():
    assert translate_pg_sql(r"SELECT E'a\nb' AS s") == r"SELECT 'a\nb' AS s"
    assert translate_pg_sql(r"SELECT e'x' AS s") == r"SELECT 'x' AS s"


def test_parameterized_numeric_rename():
    assert (
        translate_pg_sql("SELECT amount::numeric(12,2) AS a")
        == "SELECT CAST(amount AS decimal(12,2)) AS a"
    )


def test_json_path_operators():
    assert (
        translate_pg_sql("SELECT props #>> '{a,b}' FROM e")
        == "SELECT get_json_object(props, '$.a.b') FROM e"
    )
    assert (
        translate_pg_sql("SELECT props #> '{k}' FROM e")
        == "SELECT get_json_object(props, '$.k') FROM e"
    )


def test_to_char_token_mapping():
    import pytest

    assert (
        translate_pg_sql("SELECT to_char(ts, 'YYYY-MM-DD HH24:MI:SS') FROM e")
        == "SELECT date_format(ts, 'yyyy-MM-dd HH:mm:ss') FROM e"
    )
    # separators pass through; HH12 maps independently of HH24
    assert (
        translate_pg_sql("SELECT to_char(ts, 'DD/HH12') FROM e")
        == "SELECT date_format(ts, 'dd/hh') FROM e"
    )
    # PG quoted literal text → JDK quoted (SQL-doubled) — letters inside
    # quotes are DATA, never pattern letters
    assert (
        translate_pg_sql("""SELECT to_char(ts, 'YYYY"T"HH24') FROM e""")
        == "SELECT date_format(ts, 'yyyy''T''HH') FROM e"
    )
    # round-8: tokens JDK cannot render faithfully raise at TRANSLATION
    # time instead of silently mistranslating (PG D = day-of-week
    # Sunday=1; JDK D = day-of-YEAR) or exploding inside a task.
    # Round-13: Month/Day name forms now translate (rpad'd expression
    # segments — PG pads to 9 chars)
    assert translate_pg_sql(
        "SELECT to_char(ts, 'Month DD') FROM e"
    ) == (
        "SELECT concat(rpad(date_format(ts, 'MMMM'), 9, ' '), "
        "date_format(ts, ' dd')) FROM e"
    )
    with pytest.raises(ValueError, match="'D'"):
        translate_pg_sql("SELECT to_char(ts, 'D') FROM e")
    with pytest.raises(ValueError, match="'THH'"):
        # a bare letter run that is no PG token at all (greedy run: the
        # unmapped T swallows up to the next non-letter boundary)
        translate_pg_sql("SELECT to_char(ts, 'YYYYTHH24') FROM e")


def test_substring_regex_form():
    # group-free pattern: whole match (group 0), NULL-guarded like PG
    assert translate_pg_sql("SELECT substring(name FROM '[0-9]+') FROM t") == (
        "SELECT CASE WHEN name RLIKE '[0-9]+' "
        "THEN regexp_extract(name, '[0-9]+', 0) END FROM t"
    )
    # numeric FROM/FOR is native Spark syntax — must pass through untouched
    sql = "SELECT substring(name FROM 2 FOR 3) FROM t"
    assert translate_pg_sql(sql) == sql


def test_substring_regex_capture_group(spark):
    """PG returns the FIRST CAPTURING GROUP's text when the pattern has
    one (round-8 judge directive 1; PG-derived literal, reference
    tests/test_postgres.py:75-80 inline-expected style)."""
    row = spark.sql(
        translate_pg_sql(
            "SELECT substring('ab123cd' FROM 'b([0-9]+)c') AS g, "
            "substring('ab123cd' FROM 'b[0-9]+c') AS whole, "
            "substring('ab123cd' FROM 'x([0-9]+)y') AS miss, "
            "substring('ab12' FROM 'a\\\\(?b') AS esc, "
            "substring('ab12' FROM '(?:a)(b)') AS noncap"
        )
    ).first()
    assert row["g"] == "123"        # PG: first group, NOT 'b123c'
    assert row["whole"] == "b123c"  # group-free: whole match
    assert row["miss"] is None      # PG: no match -> NULL, not ''
    assert row["esc"] == "ab"       # escaped paren is not a group
    assert row["noncap"] == "b"     # (?: ) skipped; (b) is group 1


def test_regex_capture_group_index_classifier():
    from youcruit_tap_rawpostgresql_spark.plans.dialect import (
        _regex_capture_group_index,
    )

    assert _regex_capture_group_index("'b([0-9]+)c'") == 1
    assert _regex_capture_group_index("'[0-9]+'") == 0
    assert _regex_capture_group_index("'(?:ab)+'") == 0
    assert _regex_capture_group_index("'(?=x)a'") == 0
    # literal TEXT is decoded as Spark's parser will: \\( is a value
    # backslash + paren (regex-escaped paren, no group); \( collapses to
    # a bare paren (IS a group) — the module-wide pass-through policy
    assert _regex_capture_group_index(r"'\\(lit\\)'") == 0
    assert _regex_capture_group_index(r"'\('") == 1
    assert _regex_capture_group_index("'[(]x[)]'") == 0  # class-literal parens
    assert _regex_capture_group_index("'[]()]a'") == 0  # leading ] is literal
    assert _regex_capture_group_index("'[^]]('") == 1
    assert _regex_capture_group_index("'(?:a)(b)'") == 1
    assert _regex_capture_group_index("'it''s (a)'") == 1  # doubled quote
    # escaped ']' inside a class does not close it (round-8 self-review):
    # text '[\\]()]' decodes to value [\]()] — one class, zero groups
    assert _regex_capture_group_index(r"'[\\]()]'") == 0


def test_array_constructor_translates():
    out = translate_pg_sql("SELECT ARRAY[1, 2, 3] AS a, ARRAY[ARRAY[1], ARRAY[2]] AS n")
    assert out == "SELECT array(1, 2, 3) AS a, array(array(1), array(2)) AS n"


def test_similar_to_translates_and_matches(spark):
    out = translate_pg_sql("SELECT n_name FROM nation WHERE n_name SIMILAR TO 'A%_A'")
    assert "RLIKE '^(?:A.*.A)$'" in out
    neg = translate_pg_sql("SELECT 1 WHERE 'abc' NOT SIMILAR TO 'a_c'")
    assert neg == "SELECT 1 WHERE NOT ('abc' RLIKE '^(?:a.c)$')"
    # end-to-end: SIMILAR TO is fully anchored, unlike bare RLIKE
    assert spark.sql(
        translate_pg_sql("SELECT 'abcd' SIMILAR TO 'a%c' AS m")
    ).first()["m"] is False
    assert spark.sql(
        translate_pg_sql("SELECT 'abc' SIMILAR TO 'a%c' AS m")
    ).first()["m"] is True


def test_gen_random_uuid_translates(spark):
    out = translate_pg_sql("SELECT gen_random_uuid() AS u")
    assert out == "SELECT uuid() AS u"
    assert len(spark.sql(out).first()["u"]) == 36


def test_similar_to_dot_is_literal(spark):
    """In SIMILAR TO a bare '.' is a literal character (unlike regex) and
    backslash-escaped wildcards stay literal."""
    assert spark.sql(
        translate_pg_sql("SELECT 'v192-beta' SIMILAR TO 'v1.2%' AS m")
    ).first()["m"] is False
    assert spark.sql(
        translate_pg_sql("SELECT 'v1.2-beta' SIMILAR TO 'v1.2%' AS m")
    ).first()["m"] is True
    assert spark.sql(
        translate_pg_sql(r"SELECT '100%' SIMILAR TO '100\%' AS m")
    ).first()["m"] is True
    assert spark.sql(
        translate_pg_sql(r"SELECT '1000' SIMILAR TO '100\%' AS m")
    ).first()["m"] is False


def test_similar_to_function_call_operand(spark):
    out = translate_pg_sql("SELECT upper(n) NOT SIMILAR TO 'A%' AS m FROM t")
    assert out == "SELECT NOT (upper(n) RLIKE '^(?:A.*)$') AS m FROM t"


def test_rewrites_leave_string_literals_alone():
    sql = (
        "SELECT 'keep ARRAY[1,2] and now() and gen_random_uuid() text' AS note, "
        "ARRAY[1, 2] AS a, now() AS ts"
    )
    out = translate_pg_sql(sql)
    assert "'keep ARRAY[1,2] and now() and gen_random_uuid() text'" in out
    assert "array(1, 2) AS a" in out and "current_timestamp() AS ts" in out


def test_array_ctor_with_brackets_in_literal(spark):
    out = translate_pg_sql("SELECT ARRAY['a[1]', 'b]'] AS a")
    assert out == "SELECT array('a[1]', 'b]') AS a"
    assert spark.sql(out).first()["a"] == ["a[1]", "b]"]


def test_cast_inside_string_literal_is_data():
    """'foo::bar' is data, not a cast (review finding) — while a cast OF
    a literal ('x'::uuid) still translates."""
    out = translate_pg_sql("SELECT 'ns::id' AS tag, 'x'::uuid AS u")
    assert out == "SELECT 'ns::id' AS tag, CAST('x' AS string) AS u"
    out2 = translate_pg_sql("SELECT 'meeting date ''x''' AS note")
    assert out2 == "SELECT 'meeting date ''x''' AS note"


def test_to_char_bare_hh_is_12_hour(spark):
    out = translate_pg_sql("SELECT to_char(TIMESTAMP '2024-01-01 13:05:00', 'HH:MI') AS t")
    assert spark.sql(out).first()["t"] == "01:05"


def test_quote_literal_nan_inf():
    from youcruit_tap_rawpostgresql_spark.plans.dialect import quote_literal

    assert quote_literal(float("nan")) == "CAST('NaN' AS DOUBLE)"
    assert quote_literal(float("inf")) == "CAST('Infinity' AS DOUBLE)"
    assert quote_literal(float("-inf")) == "CAST('-Infinity' AS DOUBLE)"


def test_at_time_zone_translation():
    from youcruit_tap_rawpostgresql_spark.plans.dialect import translate_pg_sql

    assert (
        translate_pg_sql("SELECT ts AT TIME ZONE 'UTC' FROM t")
        == "SELECT from_utc_timestamp(ts, 'UTC') FROM t"
    )
    # function-call operand
    assert (
        translate_pg_sql("SELECT date_trunc('day', ts) AT TIME ZONE 'CET' FROM t")
        == "SELECT from_utc_timestamp(date_trunc('day', ts), 'CET') FROM t"
    )
    # literal interiors untouched
    assert (
        translate_pg_sql("SELECT 'x AT TIME ZONE ''y''' AS s")
        == "SELECT 'x AT TIME ZONE ''y''' AS s"
    )


def test_at_time_zone_naive_literal_inverse_reading():
    """PG: a NAIVE timestamp literal AT TIME ZONE Z is read as wall time
    IN Z (→ to_utc_timestamp), the inverse of the timestamptz reading —
    the silent-inversion hazard flagged in round-3 advice."""
    from youcruit_tap_rawpostgresql_spark.plans.dialect import translate_pg_sql

    assert (
        translate_pg_sql(
            "SELECT TIMESTAMP '2021-01-01 12:00:00' AT TIME ZONE "
            "'America/New_York' AS t"
        )
        == "SELECT to_utc_timestamp(TIMESTAMP '2021-01-01 12:00:00', "
        "'America/New_York') AS t"
    )
    # case-insensitive keyword, DATE literal form
    assert (
        translate_pg_sql("SELECT date '2021-01-01' at time zone 'CET' AS t")
        == "SELECT to_utc_timestamp(DATE '2021-01-01', 'CET') AS t"
    )
    # a TIMESTAMPTZ literal keeps the timestamptz→wall-time reading
    assert (
        translate_pg_sql(
            "SELECT timestamptz '2021-01-01 12:00:00+00' AT TIME ZONE 'CET' AS t"
        )
        == "SELECT from_utc_timestamp(TIMESTAMP '2021-01-01 12:00:00+00', "
        "'CET') AS t"
    )
    # chained: naive literal enters zone A (to_utc), result is an instant
    # so the second hop gets the timestamptz reading (from_utc)
    assert (
        translate_pg_sql(
            "SELECT TIMESTAMP '2021-01-01 12:00:00' AT TIME ZONE 'CET' "
            "AT TIME ZONE 'UTC' AS t"
        )
        == "SELECT from_utc_timestamp(to_utc_timestamp("
        "TIMESTAMP '2021-01-01 12:00:00', 'CET'), 'UTC') AS t"
    )
    # inside a string literal: data, not SQL
    assert (
        translate_pg_sql("SELECT 'TIMESTAMP ''x'' AT TIME ZONE ''y''' AS s")
        == "SELECT 'TIMESTAMP ''x'' AT TIME ZONE ''y''' AS s"
    )


def test_at_time_zone_naive_literal_semantics_spark(spark):
    """End-to-end: the translated SQL yields PG's instant. Noon naive in
    New York (UTC-5 in January) is 17:00 UTC — the OLD from_utc reading
    would have produced 07:00 (a 10-hour silent error)."""
    row = spark.sql(
        __import__(
            "youcruit_tap_rawpostgresql_spark.plans.dialect",
            fromlist=["translate_pg_sql"],
        ).translate_pg_sql(
            "SELECT CAST(TIMESTAMP '2021-01-15 12:00:00' AT TIME ZONE "
            "'America/New_York' AS STRING) AS t"
        )
    ).first()
    assert row["t"] == "2021-01-15 17:00:00"


def test_dow_isodow_translation():
    from youcruit_tap_rawpostgresql_spark.plans.dialect import translate_pg_sql

    assert (
        translate_pg_sql("SELECT EXTRACT(DOW FROM ts) FROM t")
        == "SELECT (dayofweek(ts) - 1) FROM t"
    )
    assert (
        translate_pg_sql("SELECT EXTRACT(ISODOW FROM ts) FROM t")
        == "SELECT (weekday(ts) + 1) FROM t"
    )


def test_quote_literal_styles():
    """spark style: backslash escapes (Spark's literal parser); standard
    style: doubled quotes ONLY — what a live source engine parses. Using
    the spark form server-side would mis-parse (and inject) on engines
    with standard_conforming_strings."""
    from youcruit_tap_rawpostgresql_spark.plans.dialect import (
        bind_params,
        quote_literal,
    )

    assert quote_literal("O'Brien") == "'O\\'Brien'"
    assert quote_literal("O'Brien", style="standard") == "'O''Brien'"
    # a backslash is AMBIGUOUS across server escaping modes (ordinary on
    # standard-conforming engines, an escape on MySQL-family / PG with
    # standard_conforming_strings=off) — the standard style refuses it
    # loudly instead of picking a quoting that injects on the other mode
    with pytest.raises(ValueError, match="backslash"):
        quote_literal("a\\b", style="standard")
    with pytest.raises(ValueError, match="backslash"):
        quote_literal("\\' OR 1=1 --", style="standard")
    assert quote_literal("a\\b") == "'a\\\\b'"
    # injection probe: the classic terminate-and-comment payload stays
    # inside the literal under standard escaping
    evil = "x' OR 1=1 --"
    assert quote_literal(evil, style="standard") == "'x'' OR 1=1 --'"
    out = bind_params("SELECT * FROM t WHERE k > :v", {"v": evil}, style="standard")
    assert out == "SELECT * FROM t WHERE k > 'x'' OR 1=1 --'"


def test_to_timestamp_to_date_pg_format(spark):
    """to_timestamp/to_date with PG format tokens: the token vocabulary
    translates (HH24/MI/SS → JDK), the function names stay (Spark's own
    to_timestamp/to_date take JDK patterns)."""
    out = translate_pg_sql(
        "SELECT to_timestamp(s, 'YYYY-MM-DD HH24:MI:SS') AS t FROM x"
    )
    assert out == "SELECT to_timestamp(s, 'yyyy-MM-dd HH:mm:ss') AS t FROM x"
    out2 = translate_pg_sql("SELECT to_date(s, 'DD/MM/YYYY') AS d FROM x")
    assert out2 == "SELECT to_date(s, 'dd/MM/yyyy') AS d FROM x"
    row = spark.sql(
        translate_pg_sql(
            "SELECT CAST(to_timestamp('2021-07-04 13:05:09', "
            "'YYYY-MM-DD HH24:MI:SS') AS STRING) AS t"
        )
    ).first()
    assert row["t"] == "2021-07-04 13:05:09"
    # a to_timestamp already in JDK form must be a fixed point
    sql = "SELECT to_timestamp(s, 'yyyy-MM-dd') AS t FROM x"
    assert translate_pg_sql(sql) == sql


def test_cast_deeply_nested_operand():
    """Round-6 sqlsmith finds: `::` on an operand with arbitrary paren
    nesting (the old regex admitted one level) and LIKE/regex operators
    with a string-literal left operand (`'x' ~~ 'p'`)."""
    from youcruit_tap_rawpostgresql_spark.plans.dialect import translate_pg_sql

    out = translate_pg_sql(
        "SELECT sum((CASE WHEN (nullif(a, 3) IS NOT NULL) THEN b "
        "ELSE c END))::int8 AS s"
    )
    assert out == (
        "SELECT CAST(sum((CASE WHEN (nullif(a, 3) IS NOT NULL) THEN b "
        "ELSE c END)) AS bigint) AS s"
    )
    assert translate_pg_sql("SELECT ('BUILD' ~~ '%a%') AS x") == (
        "SELECT ('BUILD' LIKE '%a%') AS x"
    )
    # named bind parameter keeps its marker through the cast
    assert translate_pg_sql("SELECT :p::int8 AS v", bind=False) == (
        "SELECT CAST(:p AS bigint) AS v"
    )
    # `::`-looking text inside literals is data on BOTH sides
    assert translate_pg_sql("SELECT 'a::int8' AS v") == "SELECT 'a::int8' AS v"
    assert (
        translate_pg_sql("SELECT x || '::int8' AS v")
        == "SELECT x || '::int8' AS v"
    )


def test_pg_function_renames():
    """strpos/array_to_string/starts_with/jsonb_* → the Spark builtins
    with identical arity and semantics; string_to_array's literal
    delimiter is regex-escaped for split. Executable parity for the
    DuckDB-speakable ones is pinned by test_dialect_differential.py
    (pg_string_fn_renames); the jsonb_* spellings (which DuckDB lacks)
    are pinned here. Names inside string literals stay text."""
    from youcruit_tap_rawpostgresql_spark.plans.dialect import translate_pg_sql

    out = translate_pg_sql(
        "SELECT jsonb_array_length(j) AS n, jsonb_object_keys(j) AS ks, "
        "strpos(s, 'x') AS p, string_to_array(a || b, '.,') AS parts, "
        "'strpos(a) stays' AS lit FROM t"
    )
    assert "json_array_length(j)" in out
    assert "json_object_keys(j)" in out
    assert "instr(s, 'x')" in out
    assert "split(a || b, '\\\\.\\\\,')" in out
    assert "'strpos(a) stays'" in out
    # non-literal delimiter: untranslated (can't be escaped statically)
    out = translate_pg_sql("SELECT string_to_array(s, d) FROM t")
    assert "string_to_array(s, d)" in out


def test_distinct_on_rewrites_to_row_number():
    """The supported DISTINCT ON shape (single top-level SELECT, FROM,
    matching top-level ORDER BY) structurally rewrites to the ROW_NUMBER
    window form — with PG's null-order defaults made explicit (ASC →
    NULLS LAST, DESC → NULLS FIRST; Spark's defaults are the opposite,
    and which row survives depends on it). The phrase inside a literal
    stays text. Executable parity is pinned by
    tests/test_dialect_differential.py (distinct_on_* corpus cases,
    DuckDB running the PG form natively)."""
    from youcruit_tap_rawpostgresql_spark.plans.dialect import translate_pg_sql

    out = translate_pg_sql(
        "SELECT DISTINCT ON (a) a, b FROM t ORDER BY a, b DESC LIMIT 3"
    )
    assert "DISTINCT ON" not in out
    assert (
        "ROW_NUMBER() OVER (PARTITION BY a "
        "ORDER BY a ASC NULLS LAST, b DESC NULLS FIRST)" in out
    )
    assert out.startswith("SELECT * EXCEPT (__don_k0, __don_rn) FROM (")
    assert out.endswith("WHERE __don_rn = 1 ORDER BY __don_k0 ASC NULLS LAST LIMIT 3")
    # ORDER BY naming a select-list alias: the window spec resolves
    # against input columns only, so the alias is inlined
    out = translate_pg_sql(
        "SELECT DISTINCT ON (k) k, v*2 AS d FROM t ORDER BY k, d DESC"
    )
    assert "ORDER BY k ASC NULLS LAST, v*2 DESC NULLS FIRST" in out
    # a WITH prefix is preserved in front of the rewritten block
    out = translate_pg_sql(
        "WITH c AS (SELECT * FROM t) "
        "SELECT DISTINCT ON (k) k FROM c ORDER BY k"
    )
    assert out.startswith("WITH c AS (SELECT * FROM t) SELECT * EXCEPT")
    out = translate_pg_sql("SELECT 'use DISTINCT ON (a) here' AS tip")
    assert "DISTINCT ON (a)" in out


def test_distinct_on_unsupported_shapes_raise_with_recipe():
    """Anything outside the supported shape — no ORDER BY (PG keeps an
    arbitrary row: no deterministic rewrite exists), ORDER BY not led by
    the ON expressions (invalid in PG too), a subquery position, a
    top-level set op, multiple DISTINCT ON — fails loudly with the
    manual ROW_NUMBER recipe instead of Spark's cryptic parse error."""
    import pytest

    from youcruit_tap_rawpostgresql_spark.plans.dialect import translate_pg_sql

    for bad in [
        "SELECT DISTINCT ON (a) a, b FROM t",
        "SELECT DISTINCT ON (a) a, b FROM t ORDER BY b",
        "SELECT * FROM (SELECT DISTINCT ON (a) a FROM t ORDER BY a) x",
        "SELECT DISTINCT ON (a) a FROM t ORDER BY a UNION SELECT 1",
        "SELECT DISTINCT ON (a) a FROM t ORDER BY a, "
        "(SELECT DISTINCT ON (b) b FROM u ORDER BY b)",
    ]:
        with pytest.raises(ValueError, match="ROW_NUMBER"):
            translate_pg_sql(bad)


# ---------------------------------------------------------------------------
# round-9 session-4: operator/function batch (translation-level)
# ---------------------------------------------------------------------------


def test_power_hash_prefix_translations():
    from youcruit_tap_rawpostgresql_spark.plans.dialect import (
        translate_pg_sql as t,
    )

    assert t("SELECT 2 ^ 3") == "SELECT power(2, 3)"
    assert t("SELECT 2 ^ 3 ^ 2") == "SELECT power(power(2, 3), 2)"
    assert t("SELECT -2 ^ 2") == "SELECT power(-2, 2)"  # UMINUS binds tighter
    assert t("SELECT a - 2 ^ 2 FROM t") == "SELECT a - power(2, 2) FROM t"
    assert t("SELECT f(x) ^ (y + 1) FROM t") == "SELECT power(f(x), (y + 1)) FROM t"
    assert t("SELECT 17 # 5") == "SELECT (17 ^ 5)"
    assert t("SELECT a # b # c FROM t") == "SELECT ((a ^ b) ^ c) FROM t"
    assert t("SELECT |/ 25.0") == "SELECT sqrt(25.0)"
    assert t("SELECT ||/ 27.0") == "SELECT cbrt(27.0)"
    assert t("SELECT |/ |/ 16") == "SELECT sqrt(sqrt(16))"
    assert t("SELECT @ -5.5") == "SELECT abs(-5.5)"
    # operators inside literals are data
    assert t("SELECT '2 ^ 3 # @' AS s") == "SELECT '2 ^ 3 # @' AS s"
    # json #> consumed by the path rule, never by the xor rule
    assert "get_json_object" in t("SELECT j #>> '{a,b}' FROM t")
    # a ^ with unscannable operands raises (silence would XOR)
    with pytest.raises(ValueError, match="exponentiation"):
        t("SELECT CASE WHEN p THEN 1 END ^ 2 FROM t")


def test_between_symmetric_and_overlaps_translations():
    from youcruit_tap_rawpostgresql_spark.plans.dialect import (
        translate_pg_sql as t,
    )

    out = t("SELECT x BETWEEN SYMMETRIC a AND b FROM t")
    assert out == (
        "SELECT ((x) >= (a) AND (x) <= (b) OR "
        "(x) >= (b) AND (x) <= (a)) FROM t"
    )
    out = t("SELECT x NOT BETWEEN SYMMETRIC a AND b FROM t")
    assert out.startswith("SELECT NOT ((x)")
    assert t("SELECT x BETWEEN ASYMMETRIC 1 AND 2 FROM t") == (
        "SELECT x BETWEEN 1 AND 2 FROM t"
    )
    # bounds with ^ still capture whole chains (ordering: ^ first)
    out = t("SELECT x BETWEEN SYMMETRIC 2 ^ 2 AND 3 ^ 2 FROM t")
    assert "power(2, 2)" in out and "power(3, 2)" in out
    out = t("SELECT (a, b) OVERLAPS (c, d) FROM t")
    assert out == (
        "SELECT ((least(a, b) < greatest(c, d) AND "
        "least(c, d) < greatest(a, b)) OR least(a, b) = least(c, d)) FROM t"
    )
    with pytest.raises(ValueError, match="OVERLAPS"):
        t("SELECT a OVERLAPS b FROM t")


def test_encode_decode_quote_regexp_translations():
    from youcruit_tap_rawpostgresql_spark.plans.dialect import (
        translate_pg_sql as t,
    )

    assert t("SELECT encode(p, 'hex') FROM t") == "SELECT lower(hex(p)) FROM t"
    assert t("SELECT decode(s, 'hex') FROM t") == "SELECT unhex(s) FROM t"
    # Spark's own charset encode passes through untouched
    assert t("SELECT encode(s, 'UTF-8') FROM t") == (
        "SELECT encode(s, 'UTF-8') FROM t"
    )
    assert "base64(p)" in t("SELECT encode(p, 'base64') FROM t")
    assert "unbase64" in t("SELECT decode(s, 'base64') FROM t")
    with pytest.raises(ValueError, match="escape"):
        t("SELECT decode(s, 'escape') FROM t")
    # quoting family builds NULL-propagating CASE expressions
    assert "CASE WHEN instr" in t("SELECT quote_literal(x) FROM t")
    assert "'NULL'" in t("SELECT quote_nullable(x) FROM t")
    assert "RLIKE '^[a-z_][a-z0-9_]*$'" in t("SELECT quote_ident(x) FROM t")
    # regexp_match: group count drives the array shape
    out = t("SELECT regexp_match(s, 'a(b)(c)') FROM t")
    assert out.count("regexp_extract") == 2 and "RLIKE" in out
    out = t("SELECT regexp_match(s, 'abc') FROM t")
    assert "regexp_extract(s, 'abc', 0)" in out
    # non-literal pattern: group count unknowable -> untouched (loud)
    assert t("SELECT regexp_match(s, p) FROM t") == (
        "SELECT regexp_match(s, p) FROM t"
    )
    # regexp_matches is set-returning: explode forms
    assert t("SELECT regexp_matches(s, 'a(b)', 'g') FROM t").startswith(
        "SELECT explode(transform(regexp_extract_all"
    )
    assert "zip_with" in t("SELECT regexp_matches(s, '(a)(b)', 'g') FROM t")
    with pytest.raises(ValueError, match="3 capture groups"):
        t("SELECT regexp_matches(s, '(a)(b)(c)(d)', 'g') FROM t")


def test_bit_literal_and_char_cast_translations():
    from youcruit_tap_rawpostgresql_spark.plans.dialect import (
        translate_pg_sql as t,
    )

    assert t("SELECT x'1E'::int") == "SELECT CAST(30 AS int)"
    assert t("SELECT X'FFFFFFFF'::int") == "SELECT CAST(-1 AS int)"
    assert t("SELECT b'1001'::bigint") == "SELECT CAST(9 AS bigint)"
    assert t("SELECT x'1E'::text") == "SELECT '00011110'"
    assert t("SELECT 'abcdef'::varchar(3)") == (
        "SELECT substring(CAST('abcdef' AS STRING), 1, 3)"
    )
    assert t("SELECT x::char FROM t") == (
        "SELECT substring(CAST(x AS STRING), 1, 1) FROM t"
    )
    assert t("SELECT '1 day'::interval") == "SELECT INTERVAL '1 day'"
    assert t("SELECT '90 minutes'::interval::text") == (
        "SELECT CAST(INTERVAL '90 minutes' AS string)"
    )
    assert t("SELECT E'ab'::text") == "SELECT CAST('ab' AS string)"
    assert t("SELECT date '2001-01-01'::text") == (
        "SELECT CAST(DATE '2001-01-01' AS string)"
    )
    # a plain identifier before a literal is NOT a typed-literal prefix
    assert t("SELECT mycol::text FROM t") == (
        "SELECT CAST(mycol AS string) FROM t"
    )


def test_make_interval_translations():
    from youcruit_tap_rawpostgresql_spark.plans.dialect import (
        translate_pg_sql as t,
    )

    assert t("SELECT make_interval(days => 10)") == (
        "SELECT make_dt_interval(10, 0, 0, 0)"
    )
    assert t("SELECT make_interval(1, 2)") == "SELECT make_ym_interval(1, 2)"
    assert t("SELECT make_interval(0, 0, 2, 1)") == (
        "SELECT make_dt_interval(((1) + 7 * (2)), 0, 0, 0)"
    )
    assert t("SELECT make_interval()") == (
        "SELECT make_dt_interval(0, 0, 0, 0)"
    )
    with pytest.raises(ValueError, match="no parameter"):
        t("SELECT make_interval(dayz => 10)")
    with pytest.raises(ValueError, match="positional argument after"):
        t("SELECT make_interval(years => 1, 2)")


def test_generate_series_translations():
    from youcruit_tap_rawpostgresql_spark.plans.dialect import (
        translate_pg_sql as t,
    )

    # set-returning: select-list position explodes (the old straight
    # sequence() rename returned ONE ARRAY row — silent shape change)
    assert t("SELECT generate_series(1, 5)") == (
        "SELECT explode(sequence(1, 5))"
    )
    # already-exploded composition keeps exactly one explode
    assert t("SELECT unnest(generate_series(1, 3))") == (
        "SELECT explode(sequence(1, 3))"
    )
    # FROM position: Spark's table-function form; PG's bare alias names
    # the column too, and the default name is generate_series
    assert t("SELECT g FROM generate_series(1, 5) AS g") == (
        "SELECT g FROM explode(sequence(1, 5)) AS g(g)"
    )
    assert t("SELECT n FROM generate_series(1, 5) t(n)") == (
        "SELECT n FROM explode(sequence(1, 5)) AS t(n)"
    )
    assert t(
        "SELECT * FROM generate_series(1, 3) WHERE generate_series > 1"
    ) == (
        "SELECT * FROM explode(sequence(1, 3)) "
        "AS generate_series(generate_series) WHERE generate_series > 1"
    )


def test_date_part_spelling_translations():
    from youcruit_tap_rawpostgresql_spark.plans.dialect import (
        translate_pg_sql as t,
    )

    assert t("SELECT date_part('dow', ts) FROM events") == (
        "SELECT (dayofweek(ts) - 1) FROM events"
    )
    assert t("SELECT date_part('isodow', ts) FROM events") == (
        "SELECT (weekday(ts) + 1) FROM events"
    )
    assert "unix_micros" in t("SELECT date_part('epoch', ts) FROM events")
    # untranslated fields Spark shares pass through
    assert t("SELECT date_part('hour', ts) FROM events") == (
        "SELECT date_part('hour', ts) FROM events"
    )
