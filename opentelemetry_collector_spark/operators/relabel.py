"""Prometheus-style relabel chain (SURVEY §2.1 S5).

The reference's Prometheus receiver applies scrape-config relabeling before
metric build: `receiver/prometheusreceiver` delegates to Prometheus
`pkg/relabel.Process` (relabel.go:~180 upstream library), whose contract is:

- rules run **in order**, each seeing the previous rule's output;
- the rule value is `join(source_label values, separator)` with missing
  labels contributing the empty string;
- `regex` is **fully anchored** (Prometheus compiles `^(?:re)$`);
- `keep`/`drop` filter whole targets on value match;
- `replace` writes the regex-expanded `replacement` into `target_label`
  only when the regex matches — a non-match leaves the target untouched;
- `lowercase`/`uppercase` write the case-folded value;
- `labeldrop`/`labelkeep` filter label *names* by regex.

Spark realization: labels are top-level string columns (survey §1.2); every
action is a codegen expression (`rlike`/`regexp_replace`/`when`) so the
whole chain stays JVM-side, and `keep`/`drop` filters are pushable
predicates.  `labeldrop`/`labelkeep` are plan-time column ops (free).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


VALID_RELABEL_ACTIONS = (
    "replace", "keep", "drop", "lowercase", "uppercase", "hashmod", "labeldrop", "labelkeep",
)


@dataclass(frozen=True)
class RelabelRule:
    action: str = "replace"
    source_labels: tuple[str, ...] = ()
    separator: str = ";"
    regex: str = "(.*)"
    target_label: str | None = None
    replacement: str = "$1"
    modulus: int = 0  # hashmod only

    def __post_init__(self) -> None:
        """Fail-fast at construction (so config loading rejects bad rules
        before any Spark plan exists), mirroring Prometheus config.Validate."""
        if self.action not in VALID_RELABEL_ACTIONS:
            raise ValueError(f"unknown relabel action {self.action!r}")
        if self.action in ("replace", "lowercase", "uppercase", "hashmod") and not self.target_label:
            raise ValueError(f"{self.action} requires target_label")
        if self.action == "hashmod" and self.modulus <= 0:
            raise ValueError("hashmod requires modulus > 0")


def _anchored(regex: str) -> str:
    """Prometheus full-anchors every relabel regex."""
    return f"^(?:{regex})$"


def _java_pattern(regex: str) -> str:
    """RE2/Python named groups are ``(?P<x>…)``; Java wants ``(?<x>…)``."""
    return regex.replace("(?P<", "(?<")


def _java_replacement(replacement: str, pattern: str) -> str:
    """Rewrite an RE2 Expand replacement for Java's appendReplacement.

    RE2 semantics (what Prometheus runs): ``$N``/``${N}`` is a group
    reference, ``$name`` greedily takes the longest \\w+ name, and ANY
    undefined reference expands to "".  Java instead throws on undefined
    groups and rejects ``${N}``.  So: numeric refs beyond the pattern's
    group count (and name refs not defined by the pattern) are stripped to
    "" at plan time; ``${N}`` normalizes to ``$N``; defined names keep the
    Java ``${name}`` form.  If the pattern itself is not Python-parseable
    (Java-only escapes like \\p{Lu}), we can't count groups — pass the
    replacement through untouched."""
    names = set(re.findall(r"\(\?P?<([A-Za-z][A-Za-z0-9_]*)>", pattern))
    try:
        n_groups = re.compile(_anchored(pattern)).groups
    except re.error:
        return replacement

    def sub(m: re.Match) -> str:
        ref = m.group(1) or m.group(2)
        if ref.isdigit():
            return f"${ref}" if int(ref) <= n_groups else ""
        return f"${{{ref}}}" if ref in names else ""

    # RE2 Expand's literal-dollar escape: '$$' → one literal '$'.  Split on
    # it FIRST so the halves of a '$$' can't be re-parsed as a group
    # reference ('$$1' means literal '$' + text "1", NOT '$' + group 1);
    # each segment gets reference rewriting independently, then any '$'
    # still dangling (RE2 emits it literally, Java throws) is escaped, and
    # the segments rejoin with the Java-escaped literal dollar.
    def seg(s: str) -> str:
        s = re.sub(r"\$\{(\w+)\}|\$(\w+)", sub, s)
        return re.sub(r"\$(?!\d|\{\w+\})", r"\\$", s)

    return "\\$".join(seg(p) for p in replacement.split("$$"))


def _value(rule: RelabelRule) -> Column:
    """join(source label values, separator); absent/null labels join as ''."""
    return F.concat_ws(
        rule.separator,
        *[F.coalesce(F.col(label).cast("string"), F.lit("")) for label in rule.source_labels],
    )


def apply_relabel(
    df: DataFrame, rules: list[RelabelRule], protected: frozenset[str] = frozenset()
) -> DataFrame:
    """Apply a Prometheus relabel_config chain, rule by rule, in order.

    ``protected`` columns are exempt from labeldrop/labelkeep — in
    Prometheus those actions see only label names, but here the frame also
    carries engine columns (ids, payload, routing keys) that a
    Prometheus-legal name filter must not remove."""
    for r in rules:
        if r.action in ("labeldrop", "labelkeep"):
            pat = re.compile(_anchored(r.regex))
            keep = r.action == "labelkeep"
            for c in df.columns:
                if c not in protected and bool(pat.match(c)) != keep:
                    df = df.drop(c)
            continue
        val = _value(r)
        pat = _java_pattern(_anchored(r.regex))
        if r.action == "keep":
            df = df.filter(val.rlike(pat))
        elif r.action == "drop":
            df = df.filter(~val.rlike(pat))
        elif r.action == "replace":
            if r.target_label is None:
                raise ValueError("replace requires target_label")
            replacement = _java_replacement(r.replacement, r.regex)
            expanded = F.regexp_replace(val, pat, replacement)
            existing = (
                F.col(r.target_label)
                if r.target_label in df.columns
                else F.lit(None).cast("string")
            )
            df = df.withColumn(r.target_label, F.when(val.rlike(pat), expanded).otherwise(existing))
        elif r.action in ("lowercase", "uppercase"):
            if r.target_label is None:
                raise ValueError(f"{r.action} requires target_label")
            fold = F.lower(val) if r.action == "lowercase" else F.upper(val)
            df = df.withColumn(r.target_label, fold)
        elif r.action == "hashmod":
            # Prometheus sharding: target := uint64_be(md5(value)[8:16]) % modulus
            # (relabel.go Process, hashmod case).  The uint64 comes from hex
            # chars 17..32 of the md5 digest; `conv` reads them as unsigned,
            # and the arithmetic runs in decimal(20,0) to hold the full range.
            if r.target_label is None or r.modulus <= 0:
                raise ValueError("hashmod requires target_label and modulus > 0")
            num = F.conv(F.substring(F.md5(val), 17, 16), 16, 10).cast("decimal(20,0)")
            shard = F.pmod(num, F.lit(r.modulus).cast("decimal(20,0)"))
            df = df.withColumn(r.target_label, shard.cast("long").cast("string"))
        else:
            raise ValueError(f"unknown relabel action {r.action!r}")
    return df
