"""OTTL-style transform statements → Catalyst columns (SURVEY.md §2.4 ext).

Reference analog: the contrib transform processor's OpenTelemetry
Transformation Language (processor/transformprocessor + pkg/ottl ~approx,
public docs): config-driven statements like

    set(attributes["env"], "prod") where source == "src0"
    replace_pattern(body, "pw=[^ ]+", "pw=***")
    delete_key(attributes, "debug")
    keep_keys(attributes, ["env", "region"])
    truncate_all(attributes, 32)
    set(severity, Int(attributes["sev"]))

The reference interprets these per record against pdata; here each statement
COMPILES to built-in Column expressions once at plan time, so the whole
statement list fuses into one Catalyst projection (codegen, no per-row
interpreter, no UDF).  Grammar subset (the editors/converters the upstream
processor ships that map 1:1 onto Spark builtins):

- paths: bare identifiers are top-level columns; ``attributes["k"]`` indexes
  a ``map<string,string>`` column (any map column name works).
- editors: set, delete_key, keep_keys, replace_pattern, truncate_all,
  delete_matching_keys, keep_matching_keys, replace_all_patterns
  (key/value modes).
- converters (inside expressions): Int, Double, String, SHA256, Lower,
  Upper, Len, Trim, Substring (0-based, upstream-style), Split (literal
  delimiter), Concat (list + delimiter), IsMatch (predicate), ParseJSON,
  UnixSeconds/UnixMilli/UnixMicro/UnixNano, Hour/Minute/Second, and the
  type predicates IsString/IsInt/IsDouble/IsBool (plan-time constants of
  the column dtype in this statically-typed engine; nil → false).
- ``where <condition>`` gates any editor per row: ==, !=, <, <=, >, >=,
  and/or/not, parentheses, nil.

Statements execute in order with each editor seeing the previous editors'
output (upstream executes sequentially per record — same observable
semantics, but vectorized).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# --------------------------------------------------------------------------
# tokenizer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<string>"(?:[^"\\]|\\.)*")
      | (?P<number>-?\d+(?:\.\d+)?)
      | (?P<op>==|!=|<=|>=|<|>)
      | (?P<sym>[()\[\],])
      | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.X,
)


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"OTTL: cannot tokenize at {s[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    return out


# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------


@dataclass
class Lit:
    value: object


@dataclass
class Path:
    name: str          # column name (top-level or the map column)
    key: str | None    # map key when the path is  name["key"]


@dataclass
class ListLit:
    items: list


@dataclass
class Call:
    fn: str
    args: list


@dataclass
class BinOp:
    op: str
    left: object
    right: object


@dataclass
class Not:
    expr: object


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self, kind: str | None = None, value: str | None = None) -> tuple[str, str]:
        t = self.peek()
        if t is None or (kind and t[0] != kind) or (value and t[1] != value):
            raise ValueError(f"OTTL: expected {value or kind}, got {t}")
        self.i += 1
        return t

    # statement := call [ 'where' condition ]
    def statement(self) -> tuple[Call, object | None]:
        call = self.primary()
        if not isinstance(call, Call):
            raise ValueError("OTTL: statement must start with an editor call")
        cond = None
        t = self.peek()
        if t and t[0] == "ident" and t[1] == "where":
            self.take()
            cond = self.condition()
        if self.peek() is not None:
            raise ValueError(f"OTTL: trailing tokens at {self.peek()}")
        return call, cond

    # condition := disjunction of conjunctions of comparisons
    def condition(self):
        left = self.conjunction()
        while (t := self.peek()) and t == ("ident", "or"):
            self.take()
            left = BinOp("or", left, self.conjunction())
        return left

    def conjunction(self):
        left = self.comparison()
        while (t := self.peek()) and t == ("ident", "and"):
            self.take()
            left = BinOp("and", left, self.comparison())
        return left

    def comparison(self):
        t = self.peek()
        if t == ("ident", "not"):
            self.take()
            return Not(self.comparison())
        if t == ("sym", "("):
            # lookahead: a parenthesized CONDITION (primary handles call args)
            save = self.i
            self.take()
            inner = self.condition()
            self.take("sym", ")")
            if (nxt := self.peek()) and nxt[0] == "op":
                self.i = save  # it was a grouped value expr — re-parse below
            else:
                return inner
        left = self.primary()
        if (t := self.peek()) and t[0] == "op":
            op = self.take()[1]
            return BinOp(op, left, self.primary())
        return left  # bare boolean expr (e.g. IsMatch(...))

    # primary := literal | list | path | Call(args)
    def primary(self):
        kind, val = self.take()
        if kind == "string":
            return Lit(val[1:-1].replace('\\"', '"').replace("\\\\", "\\"))
        if kind == "number":
            return Lit(float(val) if "." in val else int(val))
        if kind == "sym" and val == "[":
            items = []
            while self.peek() != ("sym", "]"):
                items.append(self.primary())
                if self.peek() == ("sym", ","):
                    self.take()
            self.take("sym", "]")
            return ListLit(items)
        if kind == "sym" and val == "(":
            inner = self.primary()
            self.take("sym", ")")
            return inner
        if kind == "ident":
            if val == "nil":
                return Lit(None)
            if val in ("true", "false"):
                return Lit(val == "true")
            if self.peek() == ("sym", "("):  # function call
                self.take()
                args = []
                while self.peek() != ("sym", ")"):
                    args.append(self.primary())
                    if self.peek() == ("sym", ","):
                        self.take()
                self.take("sym", ")")
                return Call(val, args)
            if self.peek() == ("sym", "["):  # map index  name["key"]
                self.take()
                key = self.take("string")[1]
                self.take("sym", "]")
                return Path(val, key[1:-1])
            return Path(val, None)
        raise ValueError(f"OTTL: unexpected token {kind} {val!r}")


# --------------------------------------------------------------------------
# compiler
# --------------------------------------------------------------------------

_CONVERTERS = {
    "Int": lambda a: a[0].cast("long"),
    "Double": lambda a: a[0].cast("double"),
    "String": lambda a: a[0].cast("string"),
    "SHA256": lambda a: F.sha2(a[0].cast("string"), 256),
    "Lower": lambda a: F.lower(a[0]),
    "Upper": lambda a: F.upper(a[0]),
    "Len": lambda a: F.length(a[0].cast("string")).cast("long"),
    "Trim": lambda a: F.trim(a[0].cast("string")),
    # ParseJSON: upstream returns a pcommon.Map; the Spark analog is a
    # map<string,string> from_json (nil on malformed input, like upstream's
    # error value).  Nested objects flatten to their JSON text.
    "ParseJSON": lambda a: F.from_json(a[0].cast("string"), "map<string,string>"),
    # time converters (upstream ottlfuncs; int64 epoch / component extracts)
    "UnixSeconds": lambda a: F.unix_seconds(a[0].cast("timestamp")),
    "UnixMilli": lambda a: F.unix_millis(a[0].cast("timestamp")),
    "UnixMicro": lambda a: F.unix_micros(a[0].cast("timestamp")),
    "UnixNano": lambda a: F.unix_micros(a[0].cast("timestamp")) * F.lit(1000),
    "Hour": lambda a: F.hour(a[0]).cast("long"),
    "Minute": lambda a: F.minute(a[0]).cast("long"),
    "Second": lambda a: F.second(a[0]).cast("long"),
    "Day": lambda a: F.dayofmonth(a[0]).cast("long"),
    "Month": lambda a: F.month(a[0]).cast("long"),
    "Year": lambda a: F.year(a[0]).cast("long"),
    "SHA1": lambda a: F.sha1(a[0].cast("string")),
    "MD5": lambda a: F.md5(a[0].cast("string")),
    "IsMatch": None,    # handled in _compile (needs the literal pattern)
    "Substring": None,  # handled in _compile (0-based → 1-based shift)
    "Split": None,      # handled in _compile (literal, non-regex delimiter)
    "Concat": None,     # handled in _compile (list arg + literal delimiter)
    "IsString": None,   # handled in _compile (static type of the arg)
    "IsInt": None,
    "IsDouble": None,
    "IsBool": None,
    "ConvertCase": None,       # handled in _compile (literal case mode)
    "TruncateTime": None,      # handled in _compile (literal duration)
    "ToKeyValueString": None,  # handled in _compile (literal delimiters)
}

# converter name -> arity (validated at config load; 1 unless listed)
_CONVERTER_ARITY = {
    "IsMatch": 2, "Substring": 3, "Split": 2, "Concat": 2,
    "ConvertCase": 2, "TruncateTime": 2, "ToKeyValueString": 4,
}

_CONVERT_CASES = ("upper", "lower", "snake", "camel")

# TruncateTime literal durations -> date_trunc units (the upstream converter
# takes any Go duration; the grid an aggregation pipeline actually uses maps
# onto engine-native date_trunc — anything else is rejected at config load)
_TRUNC_UNITS = {"1s": "second", "1m": "minute", "1h": "hour", "1d": "day"}

# type-predicate converters: upstream inspects the pcommon value's dynamic
# type; in a statically-typed engine the answer is a plan-time constant of
# the column's dtype — except nil, which upstream reports as false
_TYPE_PREDICATES = {
    "IsString": ("string",),
    "IsInt": ("tinyint", "smallint", "int", "bigint"),
    "IsDouble": ("float", "double"),
    "IsBool": ("boolean",),
}


def _compile(node, df: DataFrame) -> Column:
    if isinstance(node, Lit):
        return F.lit(node.value)
    if isinstance(node, Path):
        if node.name not in df.columns:
            return F.lit(None)  # missing column reads as nil (bare or indexed)
        if node.key is not None:
            return F.col(node.name).getItem(node.key)
        return F.col(node.name)
    if isinstance(node, Call):
        if node.fn == "IsMatch":
            pat = node.args[1]
            if not isinstance(pat, Lit):
                raise ValueError("OTTL: IsMatch pattern must be a literal")
            return _compile(node.args[0], df).cast("string").rlike(str(pat.value))
        if node.fn == "Substring":
            # upstream Substring(target, start, length) is 0-based; Column
            # .substr is 1-based, hence the +1 shift
            target = _compile(node.args[0], df).cast("string")
            start = _compile(node.args[1], df).cast("int") + F.lit(1)
            return target.substr(start, _compile(node.args[2], df).cast("int"))
        if node.fn == "Split":
            delim = node.args[1]
            if not isinstance(delim, Lit) or not str(delim.value):
                raise ValueError("OTTL: Split delimiter must be a non-empty literal")
            # upstream splits on the LITERAL delimiter (Go strings.Split);
            # Spark split takes a regex, so \Q-quote it — breaking any
            # embedded \E (which would terminate the quote and leak raw
            # regex), same rewrite as java.util.regex.Pattern.quote
            quoted = str(delim.value).replace("\\E", "\\E\\\\E\\Q")
            return F.split(
                _compile(node.args[0], df).cast("string"), "\\Q" + quoted + "\\E"
            )
        if node.fn == "Concat":
            vals, delim = node.args[0], node.args[1]
            if not (isinstance(vals, ListLit) and isinstance(delim, Lit)):
                raise ValueError('OTTL: Concat([vals, ...], "delim")')
            return F.concat_ws(
                str(delim.value), *[_compile(v, df).cast("string") for v in vals.items]
            )
        if node.fn == "ConvertCase":
            mode = node.args[1]
            if not isinstance(mode, Lit) or mode.value not in _CONVERT_CASES:
                raise ValueError(f"OTTL: ConvertCase mode must be one of {_CONVERT_CASES}")
            s = _compile(node.args[0], df).cast("string")
            if mode.value == "upper":
                return F.upper(s)
            if mode.value == "lower":
                return F.lower(s)
            if mode.value == "snake":
                # common-identifier parity with Go strcase.ToSnake: break
                # ACRONYMWord and lowerUpper boundaries, then lowercase
                # (exotic unicode/acronym edge cases may differ)
                broken = F.regexp_replace(s, r"([A-Z]+)([A-Z][a-z])", r"$1_$2")
                broken = F.regexp_replace(broken, r"([a-z0-9])([A-Z])", r"$1_$2")
                return F.lower(broken)
            # camel: strcase.ToCamel — split on _/space, capitalize parts
            return F.regexp_replace(
                F.initcap(F.regexp_replace(s, r"[_\s]+", " ")), r" ", ""
            )
        if node.fn == "TruncateTime":
            dur = node.args[1]
            if not isinstance(dur, Lit) or str(dur.value) not in _TRUNC_UNITS:
                raise ValueError(
                    f"OTTL: TruncateTime duration must be one of {sorted(_TRUNC_UNITS)}"
                )
            return F.date_trunc(
                _TRUNC_UNITS[str(dur.value)], _compile(node.args[0], df).cast("timestamp")
            )
        if node.fn == "ToKeyValueString":
            delim, pair_delim, sort_out = node.args[1], node.args[2], node.args[3]
            if not all(isinstance(a, Lit) for a in (delim, pair_delim, sort_out)):
                raise ValueError(
                    'OTTL: ToKeyValueString(map, "delim", "pair_delim", sort) '
                    "takes literal delimiters and a literal sort flag"
                )
            m = _compile(node.args[0], df)
            ents = F.map_entries(m)
            if sort_out.value is True:
                ents = F.array_sort(ents)  # struct sort: by key, then value
            parts = F.transform(
                ents,
                lambda e: F.concat(
                    e["key"].cast("string"), F.lit(str(delim.value)), e["value"].cast("string")
                ),
            )
            return F.array_join(parts, str(pair_delim.value))
        if node.fn in _TYPE_PREDICATES:
            arg = _compile(node.args[0], df)
            dtype = df.select(arg.alias("_t")).schema[0].dataType.simpleString()
            matches = dtype in _TYPE_PREDICATES[node.fn]
            return F.when(arg.isNull(), F.lit(False)).otherwise(F.lit(matches))
        conv = _CONVERTERS.get(node.fn)
        if conv is None:
            raise ValueError(f"OTTL: unknown converter {node.fn!r}")
        return conv([_compile(a, df) for a in node.args])
    if isinstance(node, BinOp):
        left, right = _compile(node.left, df), _compile(node.right, df)
        return {
            "==": left.eqNullSafe(right) if _is_nil(node.right) or _is_nil(node.left) else left == right,
            "!=": ~left.eqNullSafe(right) if _is_nil(node.right) or _is_nil(node.left) else left != right,
            "<": left < right,
            "<=": left <= right,
            ">": left > right,
            ">=": left >= right,
            "and": left & right,
            "or": left | right,
        }[node.op]
    if isinstance(node, Not):
        return ~_compile(node.expr, df)
    raise ValueError(f"OTTL: cannot compile {node!r}")


def _is_nil(node) -> bool:
    return isinstance(node, Lit) and node.value is None


def _map_upsert(m: Column, key: str, value: Column) -> Column:
    # a NULL map still receives the key (upstream materializes the entry;
    # map_concat/map_filter are NULL-propagating so guard explicitly)
    entry = F.create_map(F.lit(key), value.cast("string"))
    merged = F.map_concat(F.map_filter(m, lambda k, _: k != key), entry)
    return F.when(m.isNull(), entry).otherwise(merged)


def _apply_one(df: DataFrame, call: Call, cond) -> DataFrame:
    gate = _compile(cond, df) if cond is not None else None

    def gated(name: str, new: Column) -> Column:
        old = F.col(name) if name in df.columns else F.lit(None).cast("string")
        return F.when(gate, new).otherwise(old) if gate is not None else new

    target = call.args[0] if call.args else None
    # missing-column convention, matching _compile's nil paths: an editor
    # whose TARGET column doesn't exist is a no-op (upstream: statements on
    # absent maps do nothing) — except bare `set(col, v)`, which creates the
    # column.  Without this, F.col(target) raises AnalysisException
    # mid-pipeline even though validate_statement passed at config load.
    if (
        isinstance(target, Path)
        and target.name not in df.columns
        and not (call.fn == "set" and target.key is None)
    ):
        return df
    if call.fn == "set":
        if not isinstance(target, Path):
            raise ValueError("OTTL: set target must be a path")
        value = _compile(call.args[1], df)
        if target.key is not None:  # map entry upsert
            new = _map_upsert(F.col(target.name), target.key, value)
            return df.withColumn(target.name, gated(target.name, new))
        return df.withColumn(target.name, gated(target.name, value))
    if call.fn == "delete_key":
        key = call.args[1]
        if not (isinstance(target, Path) and isinstance(key, Lit)):
            raise ValueError("OTTL: delete_key(map_column, \"key\")")
        new = F.map_filter(F.col(target.name), lambda k, _: k != str(key.value))
        return df.withColumn(target.name, gated(target.name, new))
    if call.fn == "keep_keys":
        keys = call.args[1]
        if not (isinstance(target, Path) and isinstance(keys, ListLit)):
            raise ValueError("OTTL: keep_keys(map_column, [\"k\", ...])")
        keep = [str(k.value) for k in keys.items]
        new = F.map_filter(F.col(target.name), lambda k, _: k.isin(keep))
        return df.withColumn(target.name, gated(target.name, new))
    if call.fn == "replace_pattern":
        pat, repl = call.args[1], call.args[2]
        if not (isinstance(target, Path) and isinstance(pat, Lit) and isinstance(repl, Lit)):
            raise ValueError("OTTL: replace_pattern(path, \"re\", \"repl\")")
        src = _compile(target, df)
        new = F.regexp_replace(src.cast("string"), str(pat.value), str(repl.value))
        if target.key is not None:
            new = _map_upsert(F.col(target.name), target.key, new)
        return df.withColumn(target.name, gated(target.name, new))
    if call.fn == "truncate_all":
        n = call.args[1]
        if not (isinstance(target, Path) and isinstance(n, Lit)):
            raise ValueError("OTTL: truncate_all(map_column, n)")
        new = F.transform_values(
            F.col(target.name), lambda _, v: F.substring(v, 1, int(n.value))
        )
        return df.withColumn(target.name, gated(target.name, new))
    if call.fn in ("delete_matching_keys", "keep_matching_keys"):
        pat = call.args[1]
        if not (isinstance(target, Path) and isinstance(pat, Lit)):
            raise ValueError(f'OTTL: {call.fn}(map_column, "regex")')
        keep = call.fn == "keep_matching_keys"
        new = F.map_filter(
            F.col(target.name),
            lambda k, _: k.rlike(str(pat.value)) if keep else ~k.rlike(str(pat.value)),
        )
        return df.withColumn(target.name, gated(target.name, new))
    if call.fn == "replace_all_patterns":
        mode, pat, repl = call.args[1], call.args[2], call.args[3]
        if not (
            isinstance(target, Path)
            and isinstance(mode, Lit)
            and isinstance(pat, Lit)
            and isinstance(repl, Lit)
        ):
            raise ValueError('OTTL: replace_all_patterns(map, "key"|"value", "re", "repl")')
        if str(mode.value) == "value":
            new = F.transform_values(
                F.col(target.name),
                lambda _, v: F.regexp_replace(v, str(pat.value), str(repl.value)),
            )
        else:  # "key": rebuild entries with rewritten keys.  NB: two keys
            # rewriting to the same string follow the session's
            # spark.sql.mapKeyDedupPolicy (default EXCEPTION — loud, not
            # silent last-wins; upstream pdata maps would silently merge)
            new = F.map_from_entries(
                F.transform(
                    F.map_entries(F.col(target.name)),
                    lambda e: F.struct(
                        F.regexp_replace(
                            e["key"], str(pat.value), str(repl.value)
                        ).alias("key"),
                        e["value"].alias("value"),
                    ),
                )
            )
        return df.withColumn(target.name, gated(target.name, new))
    raise ValueError(f"OTTL: unknown editor {call.fn!r}")


def parse_statement(text: str) -> tuple[Call, object | None]:
    """Parse one OTTL statement into (editor call, optional where-AST)."""
    return _Parser(_tokenize(text)).statement()


# editor name -> (arity, per-arg AST type requirement; None = any expression)
_EDITOR_SIG = {
    "set": (2, (Path, None)),
    "delete_key": (2, (Path, Lit)),
    "keep_keys": (2, (Path, ListLit)),
    "replace_pattern": (3, (Path, Lit, Lit)),
    "truncate_all": (2, (Path, Lit)),
    "delete_matching_keys": (2, (Path, Lit)),
    "keep_matching_keys": (2, (Path, Lit)),
    "replace_all_patterns": (4, (Path, Lit, Lit, Lit)),
}


def _validate_expr(node) -> None:
    if isinstance(node, Call):
        if node.fn not in _CONVERTERS:
            raise ValueError(f"OTTL: unknown converter {node.fn!r}")
        arity = _CONVERTER_ARITY.get(node.fn, 1)
        if len(node.args) != arity:
            raise ValueError(f"OTTL: {node.fn} takes {arity} args, got {len(node.args)}")
        if node.fn == "IsMatch" and not isinstance(node.args[1], Lit):
            raise ValueError("OTTL: IsMatch pattern must be a literal")
        if node.fn == "Split" and not (
            isinstance(node.args[1], Lit) and str(node.args[1].value)
        ):
            raise ValueError("OTTL: Split delimiter must be a non-empty literal")
        if node.fn == "Concat" and not (
            isinstance(node.args[0], ListLit) and isinstance(node.args[1], Lit)
        ):
            raise ValueError('OTTL: Concat([vals, ...], "delim")')
        if node.fn == "ConvertCase" and not (
            isinstance(node.args[1], Lit) and node.args[1].value in _CONVERT_CASES
        ):
            raise ValueError(f"OTTL: ConvertCase mode must be one of {_CONVERT_CASES}")
        if node.fn == "TruncateTime" and not (
            isinstance(node.args[1], Lit) and str(node.args[1].value) in _TRUNC_UNITS
        ):
            raise ValueError(
                f"OTTL: TruncateTime duration must be one of {sorted(_TRUNC_UNITS)}"
            )
        if node.fn == "ToKeyValueString" and not all(
            isinstance(a, Lit) for a in node.args[1:]
        ):
            raise ValueError(
                "OTTL: ToKeyValueString delimiters and sort flag must be literals"
            )
        for a in node.args:
            _validate_expr(a)
    elif isinstance(node, ListLit):
        for item in node.items:
            _validate_expr(item)
    elif isinstance(node, BinOp):
        _validate_expr(node.left)
        _validate_expr(node.right)
    elif isinstance(node, Not):
        _validate_expr(node.expr)


def validate_statement(text: str) -> tuple[Call, object | None]:
    """Parse AND semantically check one statement (editor name, arity, arg
    shapes, converter names) so a bad config fails at load time with
    ``ValueError`` instead of an ``IndexError`` mid-pipeline.  Mirrors the
    checks ``_apply_one``/``_compile`` perform lazily."""
    call, cond = parse_statement(text)
    sig = _EDITOR_SIG.get(call.fn)
    if sig is None:
        raise ValueError(f"OTTL: unknown editor {call.fn!r}")
    arity, shapes = sig
    if len(call.args) != arity:
        raise ValueError(f"OTTL: {call.fn} takes {arity} args, got {len(call.args)}")
    if call.fn == "replace_all_patterns" and (
        not isinstance(call.args[1], Lit) or call.args[1].value not in ("key", "value")
    ):
        raise ValueError('OTTL: replace_all_patterns mode must be "key" or "value"')
    for arg, want in zip(call.args, shapes):
        if want is not None and not isinstance(arg, want):
            raise ValueError(
                f"OTTL: {call.fn} arg must be {want.__name__}, got {type(arg).__name__}"
            )
        if want is None:
            _validate_expr(arg)
    if cond is not None:
        _validate_expr(cond)
    return call, cond


def parse_condition(text: str):
    """Parse a bare OTTL condition (no editor call) into its AST — the form
    the filter processor and routing connector configure with."""
    p = _Parser(_tokenize(text))
    cond = p.condition()
    if p.peek() is not None:
        raise ValueError(f"OTTL: trailing tokens at {p.peek()}")
    return cond


def validate_condition(text: str):
    """Parse AND semantically check a bare condition (converter names,
    arities) so a bad config fails at load time."""
    cond = parse_condition(text)
    _validate_expr(cond)
    return cond


def compile_condition(df: DataFrame, text: str) -> Column:
    """Compile a bare OTTL condition to one boolean Column (codegen)."""
    return _compile(validate_condition(text), df)


def apply_ottl(df: DataFrame, statements: list[str]) -> DataFrame:
    """Compile and apply OTTL statements in order.  Each statement becomes a
    single ``withColumn`` projection; Catalyst collapses the chain into one
    codegen'd projection, so a 20-statement config costs the same as one
    hand-written select."""
    for text in statements:
        call, cond = parse_statement(text)
        df = _apply_one(df, call, cond)
    return df
