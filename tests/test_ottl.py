"""OTTL transform statements → Column compiler: parser + semantics."""

import pyspark.sql.functions as F
import pytest

from opentelemetry_collector_spark.functions.ottl import apply_ottl, parse_statement


@pytest.fixture()
def frame(spark):
    rows = [
        (1, "src0", "user=bob pw=hunter2", {"env": "dev", "debug": "1", "sev": "5"}),
        (2, "src1", "user=eve pw=secret", {"env": "prod", "region": "eu", "sev": "9"}),
        (3, "src0", "no creds here", {}),
    ]
    return spark.createDataFrame(
        rows, "id long, source string, body string, attributes map<string,string>"
    )


def _collect(df):
    return {r.id: r for r in df.collect()}


def test_set_top_level_with_where(frame):
    out = _collect(apply_ottl(frame, ['set(tier, "hot") where source == "src0"']))
    assert out[1].tier == "hot" and out[3].tier == "hot"
    assert out[2].tier is None  # where-gated rows keep the (absent) old value


def test_set_map_entry_upsert(frame):
    out = _collect(apply_ottl(frame, ['set(attributes["env"], "staging")']))
    assert out[1].attributes["env"] == "staging"  # update
    assert out[3].attributes["env"] == "staging"  # insert into empty map
    assert out[2].attributes["region"] == "eu"    # untouched keys survive


def test_delete_and_keep_keys(frame):
    out = _collect(apply_ottl(frame, ['delete_key(attributes, "debug")']))
    assert "debug" not in out[1].attributes and "env" in out[1].attributes
    out = _collect(apply_ottl(frame, ['keep_keys(attributes, ["env"])']))
    assert set(out[2].attributes) == {"env"}


def test_replace_pattern_scrubs_body(frame):
    out = _collect(apply_ottl(frame, ['replace_pattern(body, "pw=[^ ]+", "pw=***")']))
    assert out[1].body == "user=bob pw=***"
    assert out[3].body == "no creds here"


def test_truncate_all_values(frame):
    out = _collect(apply_ottl(frame, ["truncate_all(attributes, 2)"]))
    assert out[2].attributes["region"] == "eu"
    assert out[1].attributes["debug"] == "1"


def test_converters_and_conditions(frame):
    out = _collect(
        apply_ottl(
            frame,
            [
                'set(sev_int, Int(attributes["sev"]))',
                'set(flag, "high") where Int(attributes["sev"]) >= 9',
                'set(flag, "none") where attributes["sev"] == nil',
            ],
        )
    )
    assert out[1].sev_int == 5 and out[2].sev_int == 9 and out[3].sev_int is None
    assert out[2].flag == "high" and out[3].flag == "none" and out[1].flag is None


def test_boolean_operators_and_ismatch(frame):
    out = _collect(
        apply_ottl(
            frame,
            [
                'set(m, "y") where IsMatch(body, "pw=") and not (source == "src1")',
            ],
        )
    )
    assert out[1].m == "y" and out[2].m is None and out[3].m is None


def test_sha256_converter(frame):
    import hashlib

    out = _collect(apply_ottl(frame, ["set(h, SHA256(source))"]))
    assert out[1].h == hashlib.sha256(b"src0").hexdigest()


def test_statements_apply_in_order(frame):
    out = _collect(
        apply_ottl(
            frame,
            [
                'set(attributes["env"], "X")',
                'set(seen, attributes["env"])',  # must observe the prior set
            ],
        )
    )
    assert out[2].seen == "X"


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_statement('set(x, "unterminated')
    with pytest.raises(ValueError):
        parse_statement('set(x, 1) trailing junk')
    # unknown editors parse fine (they're validated at apply time —
    # see test_unknown_editor_rejected)
    parse_statement("frobnicate(x, 1)")


def test_unknown_editor_rejected(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unknown editor"):
        apply_ottl(df, ["frobnicate(id, 1)"])


def test_whole_chain_is_single_projection(frame):
    """20 statements must fuse into one codegen projection — no UDFs, no
    extra exchanges (the vectorized-vs-interpreter win the module claims)."""
    stmts = [f'set(c{i}, "v{i}") where source == "src0"' for i in range(20)]
    import contextlib
    import io

    df = apply_ottl(frame, stmts)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_validate_statement_catches_bad_configs():
    """Wrong arity / unknown names must fail at config load (ValueError),
    never surface as an IndexError mid-pipeline (review finding r3)."""
    from opentelemetry_collector_spark.functions.ottl import validate_statement

    for bad in [
        "set(tier)",                      # missing value arg
        "delete_key(attributes)",         # missing key arg
        'replace_pattern(body, "x")',     # missing replacement arg
        "Frobnicate(x, 1)",               # unknown editor
        'set(x, Frobnicate(y))',          # unknown converter in expression
        'set(x, Int(y, z))',              # converter arity
        'set(x, 1) where IsMatch(body)',  # IsMatch arity in condition
        'keep_keys(attributes, "k")',     # list arg required
    ]:
        with pytest.raises(ValueError):
            validate_statement(bad)
    # well-formed statements still pass
    validate_statement('set(attributes["env"], "prod") where source == "src0"')
    validate_statement('replace_pattern(body, "pw=[^ ]+", "pw=***")')


def test_set_map_entry_on_null_map(spark):
    """set(attributes["k"], v) materializes the entry even when the map
    column is NULL — upstream transformprocessor semantics (review finding)."""
    df = spark.createDataFrame(
        [(1, None), (2, {"a": "b"})], "id long, attributes map<string,string>"
    )
    out = _collect(apply_ottl(df, ['set(attributes["k"], "v")']))
    assert out[1].attributes == {"k": "v"}
    assert out[2].attributes == {"a": "b", "k": "v"}


def test_indexed_path_on_missing_column_reads_nil(spark):
    """attributes["env"] on a frame without an attributes column evaluates
    to nil, same as a bare missing path (review finding)."""
    df = spark.createDataFrame([(1,)], "id long")
    out = _collect(
        apply_ottl(df, ['set(flag, "hit") where attributes["env"] == nil'])
    )
    assert out[1].flag == "hit"


def test_filter_ottl_drop_null_keeps_row(spark):
    """filterprocessor error_mode:ignore — a NULL condition keeps the row."""
    from opentelemetry_collector_spark.operators.filters import filter_ottl_drop

    df = spark.createDataFrame(
        [(1, "view", 2.0), (2, "view", 9.0), (3, None, 1.0)],
        "id long, et string, v double",
    )
    out = filter_ottl_drop(df, ['et == "view" and v < 5.0'])
    assert sorted(r.id for r in out.collect()) == [2, 3]
    # empty condition list is identity
    assert filter_ottl_drop(df, []).count() == 3


def test_route_tag_ottl_first_match_and_default(spark):
    from opentelemetry_collector_spark.operators.router import route_tag_ottl

    df = spark.createDataFrame(
        [(1, "error", 99.0), (2, "click", 99.0), (3, "click", 1.0), (4, "other", 1.0)],
        "id long, et string, v double",
    )
    out = {r.id: r.sink for r in route_tag_ottl(
        df,
        [("s_err", 'et == "error"'), ("s_high", "v >= 90.0"),
         ("s_ui", 'IsMatch(et, "click|view")')],
        default_sink="s_def",
    ).collect()}
    # rule order wins: error beats high even though both match id=1
    assert out == {1: "s_err", 2: "s_high", 3: "s_ui", 4: "s_def"}


def test_condition_validation_rejects_bad_configs():
    from opentelemetry_collector_spark.functions.ottl import validate_condition
    import pytest as _pt

    with _pt.raises(ValueError):
        validate_condition('Frobnicate(x) == 1')
    with _pt.raises(ValueError):
        validate_condition('x == 1 extra')
    validate_condition('a == nil or (b > 2 and IsMatch(c, "x.*"))')


def test_new_converters(spark):
    df = spark.createDataFrame([(1, "  hello world  ", "a,b,c")], "id long, s string, csv string")
    out = apply_ottl(
        df,
        [
            "set(n, Len(s))",
            "set(t, Trim(s))",
            "set(sub, Substring(csv, 2, 3))",     # 0-based like upstream
            'set(parts, Split(csv, ","))',
            'set(joined, Concat([s, csv], "|"))',
        ],
    ).collect()[0]
    assert out.n == 15
    assert out.t == "hello world"
    assert out.sub == "b,c"
    assert out.parts == ["a", "b", "c"]
    assert out.joined == "  hello world  |a,b,c"


def test_split_delimiter_is_literal_not_regex(spark):
    df = spark.createDataFrame([(1, "a.b.c")], "id long, s string")
    out = apply_ottl(df, ['set(parts, Split(s, "."))']).collect()[0]
    assert out.parts == ["a", "b", "c"]   # '.' must not act as regex any-char


def test_converter_arity_validation():
    from opentelemetry_collector_spark.functions.ottl import validate_statement
    for bad in [
        "set(x, Substring(y, 1))",        # arity 3
        'set(x, Split(y))',               # arity 2
        'set(x, Split(y, z))',            # delimiter must be literal
        'set(x, Concat(y, "-"))',         # first arg must be a list
        "set(x, Len(y, z))",              # arity 1
    ]:
        with pytest.raises(ValueError):
            validate_statement(bad)
    validate_statement('set(x, Concat([a, "lit", Upper(b)], "-"))')


def test_map_editors_noop_on_missing_column(spark):
    """Editor targets that don't exist are a no-op (the nil-path convention
    _compile uses for reads), not an AnalysisException mid-pipeline."""
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    stmts = [
        'delete_key(attributes, "k")',
        'keep_keys(attributes, ["k"])',
        "truncate_all(attributes, 4)",
        'replace_pattern(attributes["k"], "a", "b")',
        'set(attributes["k"], "v")',
    ]
    for stmt in stmts:
        out = apply_ottl(df, [stmt])
        assert out.columns == df.columns
        assert out.collect() == df.collect()
    # bare set still CREATES the column
    assert apply_ottl(df, ['set(tier, "hot")']).collect()[0].tier == "hot"


def test_split_delimiter_with_embedded_quote_end(spark):
    # a delimiter containing \E must not terminate the \Q regex quote
    df = spark.createDataFrame([(1, r"a\Eb\Ec")], "id long, s string")
    out = apply_ottl(df, [r'set(parts, Split(s, "\\E"))']).collect()[0]
    assert out.parts == ["a", "b", "c"]


def test_split_empty_delimiter_rejected():
    from opentelemetry_collector_spark.functions.ottl import validate_statement

    with pytest.raises(ValueError, match="non-empty"):
        validate_statement('set(x, Split(y, ""))')


def test_parse_json_and_matching_key_editors(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 7, "host": "web1", "hint": "x"}'), (2, "not json")],
        "id long, props string",
    )
    out = _collect(
        apply_ottl(
            df,
            [
                "set(kv, ParseJSON(props))",
                'delete_matching_keys(kv, "^h")',
            ],
        )
    )
    assert out[1].kv == {"k": "7"}
    assert out[2].kv is None  # malformed JSON reads as nil, like upstream
    kept = _collect(
        apply_ottl(df, ["set(kv, ParseJSON(props))", 'keep_matching_keys(kv, "^h")'])
    )
    assert kept[1].kv == {"host": "web1", "hint": "x"}


def test_replace_all_patterns_value_and_key_modes(spark):
    df = spark.createDataFrame(
        [(1, {"env": "prod-7", "region": "eu-1"})], "id long, m map<string,string>"
    )
    v = apply_ottl(df, ['replace_all_patterns(m, "value", "[0-9]+", "#")']).collect()[0]
    assert v.m == {"env": "prod-#", "region": "eu-#"}
    k = apply_ottl(df, ['replace_all_patterns(m, "key", "^env$", "environment")']).collect()[0]
    assert k.m == {"environment": "prod-7", "region": "eu-1"}
    with pytest.raises(ValueError, match="key.*value|mode"):
        from opentelemetry_collector_spark.functions.ottl import validate_statement
        validate_statement('replace_all_patterns(m, "both", "a", "b")')


def test_time_converters(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 5, 14, 30, 45, 123456))], "id long, ts timestamp"
    )
    out = apply_ottl(
        df,
        [
            "set(s, UnixSeconds(ts))",
            "set(ms, UnixMilli(ts))",
            "set(us, UnixMicro(ts))",
            "set(ns, UnixNano(ts))",
            "set(hh, Hour(ts))",
            "set(mm, Minute(ts))",
            "set(sec, Second(ts))",
        ],
    ).collect()[0]
    base = int(dt.datetime(2024, 3, 5, 14, 30, 45, tzinfo=dt.timezone.utc).timestamp())
    assert out.s == base
    assert out.ms == base * 1000 + 123
    assert out.us == base * 1_000_000 + 123456
    assert out.ns == (base * 1_000_000 + 123456) * 1000
    assert (out.hh, out.mm, out.sec) == (14, 30, 45)


def test_type_predicates_static_types_and_nil(spark):
    df = spark.createDataFrame(
        [(1, "s", 2, 2.5, True), (2, None, None, None, None)],
        "id long, s string, i long, d double, b boolean",
    )
    out = _collect(
        apply_ottl(
            df,
            [
                "set(t_s, IsString(s))",
                "set(t_i, IsInt(i))",
                "set(t_d, IsDouble(d))",
                "set(t_b, IsBool(b))",
                "set(x_s, IsString(i))",   # wrong type → false
                'set(m_v, IsString(missing["k"]))',  # nil path → false
            ],
        )
    )
    assert (out[1].t_s, out[1].t_i, out[1].t_d, out[1].t_b) == (True, True, True, True)
    assert out[1].x_s is False and out[1].m_v is False
    # nil values report false even when the column type matches
    assert (out[2].t_s, out[2].t_i, out[2].t_d, out[2].t_b) == (False, False, False, False)


def test_tranche3_converters(spark):
    """ConvertCase (4 modes), SHA1/MD5, Day/Month/Year, TruncateTime,
    ToKeyValueString — mirrored against python hashlib / datetime."""
    import datetime as dt
    import hashlib

    df = spark.createDataFrame(
        [(1, "parseHTTPResponse", "some_var name",
          dt.datetime(2024, 3, 5, 14, 30, 45, 123456), {"b": "2", "a": "1"})],
        "id long, ident string, s string, ts timestamp, m map<string,string>",
    )
    out = apply_ottl(
        df,
        [
            'set(up, ConvertCase(ident, "upper"))',
            'set(lo, ConvertCase(ident, "lower"))',
            'set(sn, ConvertCase(ident, "snake"))',
            'set(ca, ConvertCase(s, "camel"))',
            "set(h1, SHA1(ident))",
            "set(h2, MD5(ident))",
            "set(dd, Day(ts))",
            "set(mo, Month(ts))",
            "set(yy, Year(ts))",
            'set(th, TruncateTime(ts, "1h"))',
            'set(td, TruncateTime(ts, "1d"))',
            'set(kv, ToKeyValueString(m, "=", " ", true))',
        ],
    ).collect()[0]
    assert out.up == "PARSEHTTPRESPONSE" and out.lo == "parsehttpresponse"
    assert out.sn == "parse_http_response"
    assert out.ca == "SomeVarName"
    assert out.h1 == hashlib.sha1(b"parseHTTPResponse").hexdigest()
    assert out.h2 == hashlib.md5(b"parseHTTPResponse").hexdigest()
    assert (out.dd, out.mo, out.yy) == (5, 3, 2024)
    assert out.th == dt.datetime(2024, 3, 5, 14, 0, 0)
    assert out.td == dt.datetime(2024, 3, 5, 0, 0, 0)
    assert out.kv == "a=1 b=2"  # sorted output


def test_tranche3_validation_rejects_bad_literals():
    from opentelemetry_collector_spark.functions.ottl import validate_statement

    for bad in [
        'set(x, ConvertCase(y, "title"))',      # unknown mode
        "set(x, ConvertCase(y, z))",            # non-literal mode
        'set(x, TruncateTime(ts, "7m"))',       # unsupported duration
        'set(x, ToKeyValueString(m, "=", " ", flag))',  # non-literal sort
        'set(x, ToKeyValueString(m, "="))',     # arity 4
    ]:
        with pytest.raises(ValueError):
            validate_statement(bad)
