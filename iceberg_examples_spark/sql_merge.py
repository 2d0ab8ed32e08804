"""Connector-less ``MERGE INTO`` execution.

The reference's core operation is SQL MERGE against an Iceberg catalog
(`IcebergSQLMerge.java:29-92`, `IcebergSCD2.java:51-68`,
`IcebergSQLMergeAsDeleteInsert.java:30-50`). The Iceberg runtime jar is
unavailable offline (DESIGN.md), so rounds 1-5 verified the SEMANTICS via
DataFrame-algebra mutations and the SQL TEXT via golden tests. This
module closes the remaining gap that is closable without the jar: it
EXECUTES the reference's literal MERGE statements — parse, validate
against Spark's own parser, then run against a snapshot-committing
:class:`~iceberg_examples_spark.catalog.LocalTable`.

Grammar: the restricted MERGE subset the reference uses (and the golden
tests pin) —

    MERGE INTO <table> <t-alias>
    USING (<subquery>) <s-alias> | USING <name> <s-alias>
    ON <condition>
    [WHEN MATCHED [AND <cond>] THEN UPDATE SET * | SET a = e, ...]
    [WHEN MATCHED [AND <cond>] THEN DELETE]
    [WHEN NOT MATCHED [BY TARGET] THEN INSERT * | INSERT (cols) VALUES (exprs)]
    [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET a = e, ... | DELETE]

Every statement is additionally round-tripped through Spark's SQL parser
(``parsePlan`` must yield a MergeIntoTable node), so this executor can
never accept text the real engine would reject.

Execution semantics (Iceberg/Spark MERGE):
- a target row with MORE than one matching source row is a cardinality
  violation → raise (the engines' MERGE_CARDINALITY_VIOLATION);
- clauses apply in declaration order: the first satisfied WHEN MATCHED
  clause wins per row; unmatched target rows pass through unchanged;
- ``UPDATE SET *`` / ``INSERT *`` assign all shared columns by name;
- the result replaces the table in one snapshot commit (overwrite) —
  the same observable contract as Iceberg's copy-on-write MERGE.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import LocalTable


@dataclass
class MatchedClause:
    action: str  # "update" | "delete"
    condition: str | None = None
    assignments: dict[str, str] | None = None  # col -> expr ("*" handled)
    star: bool = False


@dataclass
class MergeSpec:
    target: str
    t_alias: str
    source_sql: str  # subquery text OR a bare relation name
    source_is_subquery: bool
    s_alias: str
    on: str
    matched: list[MatchedClause] = field(default_factory=list)
    # WHEN NOT MATCHED BY SOURCE clauses: target rows with NO source
    # match; conditions/assignments reference target columns only
    by_source: list[MatchedClause] = field(default_factory=list)
    insert_star: bool = False
    insert_cols: list[str] | None = None
    insert_values: list[str] | None = None
    has_insert: bool = False
    # WHEN NOT MATCHED AND <cond> THEN INSERT — filters the insert
    # anti-join (may reference source columns only, per Spark's analyzer)
    insert_condition: str | None = None


_HEAD_RE = re.compile(
    r"MERGE\s+INTO\s+(?P<target>[\w.]+)\s+(?P<talias>\w+)\s+USING\s+",
    re.IGNORECASE | re.DOTALL,
)
_TAIL_RE = re.compile(
    r"\s*(?P<salias>\w+)\s+ON\s+(?P<on>.*?)\s*(?=WHEN\s)",
    re.IGNORECASE | re.DOTALL,
)


def _balanced_paren_span(text: str, start: int) -> int:
    """Index just past the ')' closing the '(' at ``start`` (quotes —
    including escaped quotes — respected via the shared mask)."""
    masked = _mask_quotes(text)
    depth = 0
    for i in range(start, len(masked)):
        ch = masked[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError("unbalanced parentheses in MERGE source")
_WHEN_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED"
    r"(?:\s+BY\s+(?P<by>SOURCE|TARGET))?"
    r"(?:\s+AND\s+(?P<cond>.*?))?\s+THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+\*|UPDATE\s+SET\s+.*?|DELETE|"
    r"INSERT\s*\*|INSERT\s*\(.*?\)\s*VALUES\s*\(.*?\))\s*"
    r"(?=WHEN\s|;|\Z)",
    re.IGNORECASE | re.DOTALL,
)


def _norm_ws(s: str) -> str:
    """Collapse whitespace runs to one space OUTSIDE quoted literals
    (the keyword checks below need 'UPDATE  SET' → 'UPDATE SET', but a
    literal's internal spacing is data and must survive). Quote state
    comes from the shared mask — ONE owner of the quoting rules."""
    masked = _mask_quotes(s)
    out: list[str] = []
    prev_space = False
    for ch, mch in zip(s, masked):
        if mch == "_" and ch != "_":
            out.append(ch)  # inside a literal: verbatim
            prev_space = False
        elif ch.isspace():
            if not prev_space:
                out.append(" ")
            prev_space = True
        else:
            out.append(ch)
            prev_space = False
    return "".join(out).strip()


def _sub_outside_quotes(pattern: str, repl: str, s: str) -> str:
    """re.sub that never rewrites inside a string literal: match
    positions come from the quote-masked copy, replacement splices the
    original. A relation name appearing inside a literal (``WHERE note =
    'see default.x'``) is data, not a reference to rewrite."""
    masked = _mask_quotes(s)
    out, last = [], 0
    for m in re.finditer(pattern, masked):
        out.append(s[last : m.start()])
        out.append(repl)
        last = m.end()
    out.append(s[last:])
    return "".join(out)


def _mask_quotes(text: str) -> str:
    """Same-length copy with quoted-literal CONTENTS replaced by '_'
    (the quote characters themselves survive). Keyword-boundary regexes
    run on the mask — a literal like ``'WHEN HOT'`` can no longer
    terminate the ON clause or a WHEN condition early — while the actual
    substrings are sliced from the original text by span (the mask is
    index-identical by construction).

    This is the ONE owner of the quoting rules: _norm_ws,
    _balanced_paren_span, _split_top_level, and _sub_outside_quotes all
    derive their quote state from this mask, so an escape-rule fix lands
    in exactly one scanner. Escapes handled as Spark's lexer does:
    ``\\x`` inside a literal consumes the next character (so
    ``'can\\'t'`` stays one literal), and ``''`` doubling reads as
    close-then-reopen — which masks the doubled quote pair's interior
    either way, keeping boundaries right.

    Lexer-mode note (round-8 ADVICE, resolved by probe): the boundary
    rule is the same under EVERY Spark string-literal mode.
    ``spark.sql.parser.escapedStringLiterals=true`` (and ANSI mode)
    change only how the literal's VALUE is unescaped after tokenization
    — the ANTLR STRING rule always consumes ``\\<char>`` inside a
    literal, so token spans never move (verified on this Spark: in both
    modes ``SELECT 'a\\'b'`` is one literal and ``'c:\\'`` is
    unterminated; pinned by
    tests/test_sql_merge.py::test_mask_boundaries_match_lexer_in_both_modes).
    This module never unescapes values — literal spans are sliced from
    the original text and handed to Spark to evaluate — so no mode knob
    is needed here."""
    out = list(text)
    quote = None
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if quote:
            if ch == "\\" and i + 1 < n:
                out[i] = "_"
                out[i + 1] = "_"
                i += 2
                continue
            if ch == quote:
                quote = None
            else:
                out[i] = "_"
        elif ch in "'\"":
            quote = ch
        i += 1
    return "".join(out)


def parse_merge(sql: str) -> MergeSpec:
    """Parse a restricted-grammar MERGE statement (see module doc).

    All boundary-finding regexes run against a quote-masked copy of the
    text (see _mask_quotes): a string literal containing WHEN/THEN/ON —
    text Spark happily accepts — must not shift clause boundaries and
    execute with silently wrong results (the round-7 ADVICE bug class)."""
    text = sql.strip()
    masked = _mask_quotes(text)
    h = _HEAD_RE.search(masked)
    if not h:
        raise ValueError("not a recognizable MERGE statement")
    pos = h.end()
    if text[pos] == "(":
        end = _balanced_paren_span(text, pos)
        source_sql, is_subq = text[pos + 1 : end - 1].strip(), True
        pos = end
    else:
        rm = re.match(r"[\w.]+", text[pos:])
        source_sql, is_subq = rm.group(0), False
        pos += rm.end()
    tm = _TAIL_RE.match(masked, pos)
    if not tm:
        raise ValueError("no ON clause / WHEN clauses found")
    spec = MergeSpec(
        target=h.group("target"),
        t_alias=h.group("talias"),
        source_sql=source_sql,
        source_is_subquery=is_subq,
        s_alias=tm.group("salias"),
        on=text[tm.start("on") : tm.end("on")].strip(),
    )
    def _matched_clause(action: str, cond: str | None) -> MatchedClause:
        up = action.upper()
        if up == "DELETE":
            return MatchedClause("delete", cond)
        if up.replace(" ", "") == "UPDATESET*":
            return MatchedClause("update", cond, star=True)
        if up.startswith("UPDATE SET"):
            assigns = {}
            for part in _split_top_level(action[len("UPDATE SET"):]):
                lhs, rhs = part.split("=", 1)
                col = lhs.strip().split(".")[-1]
                assigns[col] = rhs.strip()
            return MatchedClause("update", cond, assignments=assigns)
        raise ValueError(f"unsupported MATCHED action: {action!r}")

    def _slice(m: re.Match, group: str) -> str | None:
        return (
            text[m.start(group) : m.end(group)]
            if m.group(group) is not None
            else None
        )

    for w in _WHEN_RE.finditer(masked, tm.end()):
        action = _norm_ws(_slice(w, "action"))
        by = (w.group("by") or "").upper()
        if w.group("not") and by == "SOURCE":
            cond = _slice(w, "cond")
            clause = _matched_clause(action, cond.strip() if cond else None)
            if clause.star:
                raise ValueError(
                    "NOT MATCHED BY SOURCE UPDATE requires explicit "
                    "assignments (no source row to expand * from)"
                )
            # Spark's analyzer rejects BY SOURCE clauses that reference
            # source columns (there is no source row); silently evaluating
            # them against all-NULL source values would diverge from the
            # engine being mirrored — reject source-alias-qualified tokens
            src_ref = re.compile(
                rf"(?<![\w.]){re.escape(spec.s_alias)}\.\w", re.IGNORECASE
            )
            exprs = list((clause.assignments or {}).values())
            if clause.condition:
                exprs.append(clause.condition)
            for e in exprs:
                # search the MASK: an s-alias token inside a string
                # literal is data, not a source-column reference
                if src_ref.search(_mask_quotes(e)):
                    raise ValueError(
                        "NOT MATCHED BY SOURCE clause references source "
                        f"alias {spec.s_alias!r}: {e!r} (Spark's analyzer "
                        "rejects source-column references here)"
                    )
            spec.by_source.append(clause)
            continue
        if w.group("not"):
            up = action.upper()
            if not up.startswith("INSERT"):
                raise ValueError("NOT MATCHED [BY TARGET] supports INSERT only")
            if spec.has_insert:
                # Spark evaluates multiple NOT MATCHED clauses
                # first-match-wins; this restricted grammar supports one —
                # overwriting the first clause silently would execute the
                # statement with wrong results (ADVICE r7)
                raise ValueError(
                    "multiple WHEN NOT MATCHED ... INSERT clauses are not "
                    "supported by this restricted grammar"
                )
            cond = _slice(w, "cond")
            spec.insert_condition = cond.strip() if cond else None
            if up.replace(" ", "") == "INSERT*":
                spec.insert_star = True
            else:
                # boundary-find on the masked action (quoted parens must
                # not terminate the VALUES list), slice from the original
                im = re.match(
                    r"INSERT\s*\((?P<cols>.*?)\)\s*VALUES\s*\((?P<vals>.*)\)",
                    _mask_quotes(action),
                    re.IGNORECASE | re.DOTALL,
                )
                if not im:
                    raise ValueError(f"bad INSERT clause: {action!r}")
                # insert columns are TARGET columns — strip any qualifier
                # so `INSERT (t.id, ...)` can't silently miss the match
                # against unqualified target names (→ NULL fill) below
                spec.insert_cols = [
                    c.strip().split(".")[-1]
                    for c in im.group("cols").split(",")
                ]
                spec.insert_values = _split_top_level(
                    action[im.start("vals") : im.end("vals")]
                )
            spec.has_insert = True
        else:
            cond = _slice(w, "cond")
            spec.matched.append(
                _matched_clause(action, cond.strip() if cond else None)
            )
    if not spec.matched and not spec.has_insert and not spec.by_source:
        raise ValueError("MERGE with no WHEN clauses")
    return spec


def _split_top_level(s: str) -> list[str]:
    """Split on commas outside parentheses/quotes (quote state from the
    shared mask — see _mask_quotes)."""
    masked = _mask_quotes(s)
    parts, depth, buf = [], 0, []
    for ch, mch in zip(s, masked):
        if mch == "(":
            depth += 1
        elif mch == ")":
            depth -= 1
        elif mch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
            continue
        buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        parts.append(tail)
    return parts


def spark_validates(
    spark: SparkSession, sql: str, expect: str = "MergeIntoTable"
) -> bool:
    """True iff Spark's own SQL parser accepts the text AND yields the
    expected plan node class (malformed text raises ParseException
    inside the JVM → False). Every statement class this module executes
    is gated this way, so the executor can never accept text the real
    engine would reject — nor mis-classify one statement kind as
    another."""
    try:
        plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(
            sql.strip().rstrip(";")
        )
    except Exception:
        return False
    return expect in plan.getClass().getName()


def execute_merge(
    spark: SparkSession,
    sql: str,
    tables: dict[str, LocalTable],
    name_map: dict[str, str] | None = None,
) -> None:
    """Parse + validate + execute ``sql`` against ``tables[target]``.

    ``name_map`` rewrites qualified relation names inside the SOURCE
    subquery to registered temp-view names (temp views cannot carry
    catalog qualifiers like ``default.x`` — the reference's names are
    preserved in the statement text and mapped at execution time)."""
    if not spark_validates(spark, sql):
        raise ValueError("Spark's parser rejected the MERGE text")
    spec = parse_merge(sql)
    table = tables[spec.target]

    src_sql = spec.source_sql
    for qualified, view in (name_map or {}).items():
        src_sql = _sub_outside_quotes(
            rf"(?<![\w.]){re.escape(qualified)}(?![\w.])", view, src_sql
        )
    if spec.source_is_subquery:
        src = spark.sql(src_sql)
    else:
        src = spark.table(src_sql)

    t, s = spec.t_alias, spec.s_alias
    # pin the whole merge to ONE base snapshot and commit with
    # expect_current: a concurrent commit between this read and the
    # overwrite raises CommitConflictError instead of being erased by a
    # rewrite derived from the stale base (serializable MERGE — the
    # Iceberg conflict-detection contract)
    base_v = table.current_version
    tgt = table.read(base_v).withColumn(
        "__tid", F.monotonically_increasing_id()
    )
    tcols = [c for c in tgt.columns if c != "__tid"]
    # source-side match marker: NULL-safe (a legitimately-NULL source
    # column must not read as "no match"). The source is MATERIALIZED
    # once (MEMORY_AND_DISK) because up to three actions consume it —
    # the cardinality-check job, the matched-rows overwrite, and the
    # insert anti-join; an SCD2-shaped source (subquery self-joining
    # the target) re-evaluated per action tripled the scenario's fixed
    # cost, and at scale engines' MERGE implementations likewise
    # materialize the source side before the target rewrite.
    src = src.persist()
    src_marked = src.withColumn("__smark", F.lit(1))
    joined = tgt.alias(t).join(
        src_marked.alias(s), F.expr(spec.on), "left"
    ).persist()

    try:
        # cardinality check: >1 source row per target row is a violation —
        # but only when WHEN MATCHED clauses exist (Spark/Iceberg raise
        # MERGE_CARDINALITY_VIOLATION only then; an insert-only merge with
        # duplicate matches is legal and simply inserts nothing for them)
        if spec.matched:
            dup = (
                joined.groupBy("__tid")
                .agg(F.count(F.col(f"{s}.__smark")).alias("k"))
                .filter(F.col("k") > 1)
                .limit(1)
                .count()
            )
            if dup:
                raise ValueError(
                    "MERGE cardinality violation: target row matched "
                    "more than one source row"
                )

        matched = F.col(f"{s}.__smark").isNotNull()
        unmatched = F.col(f"{s}.__smark").isNull()

        def clause_pred(c: MatchedClause, base=matched):
            # a clause condition that evaluates to NULL means "not
            # satisfied" (three-valued logic): coalesce to FALSE so NULL
            # can't poison the keep/prior accumulators below
            p = base
            if c.condition:
                p = F.coalesce(p & F.expr(c.condition), F.lit(False))
            return p

        # (clause, match-predicate-base) in evaluation order: MATCHED
        # clauses act on matched rows, NOT MATCHED BY SOURCE clauses on
        # unmatched target rows — disjoint sets, so one keep filter and
        # one when-chain per column serve both groups
        all_clauses = [(c, matched) for c in spec.matched] + [
            (c, unmatched) for c in spec.by_source
        ]

        # survive-DELETE filter: drop rows where the FIRST satisfied clause
        # (within its group) is a delete
        keep = F.lit(True)
        prior = F.lit(False)
        for c, base in all_clauses:
            pred = clause_pred(c, base) & ~prior
            if c.action == "delete":
                keep = keep & ~pred
            prior = prior | clause_pred(c, base)

        # column values: first satisfied UPDATE clause wins
        out_cols = []
        for col in tcols:
            expr_col = F.col(f"{t}.{col}")
            prior = F.lit(False)
            for c, base in all_clauses:
                if c.action != "update":
                    prior = prior | clause_pred(c, base)
                    continue
                if c.star:
                    rhs = (
                        F.col(f"{s}.{col}")
                        if col in src.columns
                        else F.col(f"{t}.{col}")
                    )
                else:
                    rhs = (
                        F.expr(c.assignments[col])
                        if col in c.assignments
                        else F.col(f"{t}.{col}")
                    )
                expr_col = F.when(
                    clause_pred(c, base) & ~prior, rhs
                ).otherwise(expr_col)
                prior = prior | clause_pred(c, base)
            out_cols.append(expr_col.alias(col))
        if spec.matched:
            updated = joined.filter(keep).select(*out_cols)
        elif spec.by_source:
            # no MATCHED clauses ran the cardinality check, so a target
            # row matched by several source rows fans out in the join —
            # with no matched clause its copies are identical (unchanged
            # target columns), so dedup by the target-row id is exact
            updated = (
                joined.dropDuplicates(["__tid"])
                .filter(keep)
                .select(*out_cols)
            )
        else:
            # insert-only merge: target rows pass through untouched — and
            # NOT via the join, whose fan-out would duplicate a target row
            # matched by several source rows (legal here, no cardinality
            # check ran)
            updated = table.read(base_v)

        result = updated
        if spec.has_insert:
            anti = src.alias(s).join(
                table.read(base_v).alias(t), F.expr(spec.on), "left_anti"
            )
            if spec.insert_condition:
                # WHEN NOT MATCHED AND <cond>: NULL-evaluating rows are
                # not satisfied (three-valued logic, same rule as the
                # matched-clause conditions above)
                anti = anti.filter(
                    F.coalesce(
                        F.expr(spec.insert_condition), F.lit(False)
                    )
                )
            if spec.insert_star:
                ins = anti.select(
                    *[
                        (
                            F.col(f"{s}.{c}")
                            if c in src.columns
                            else F.lit(None).cast(dict(table.read(base_v).dtypes)[c])
                        ).alias(c)
                        for c in tcols
                    ]
                )
            else:
                exprs = dict(zip(spec.insert_cols, spec.insert_values))
                ins = anti.select(
                    *[
                        (
                            F.expr(exprs[c]) if c in exprs else F.lit(None)
                        ).cast(dict(table.read(base_v).dtypes)[c]).alias(c)
                        for c in tcols
                    ]
                )
            result = updated.unionByName(ins)
        table.overwrite(result, expect_current=base_v)
    finally:
        joined.unpersist()
        src.unpersist()


_DELETE_RE = re.compile(
    r"^DELETE\s+FROM\s+(?P<target>[\w.]+)"
    r"(?:\s+WHERE\s+(?P<pred>.+?))?;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ADD_COL_RE = re.compile(
    r"^ALTER\s+TABLE\s+(?P<target>[\w.]+)\s+ADD\s+COLUMN\s+"
    r"(?P<col>\w+)\s+(?P<dtype>\w+);?\s*$",
    re.IGNORECASE,
)
_DROP_COL_RE = re.compile(
    r"^ALTER\s+TABLE\s+(?P<target>[\w.]+)\s+DROP\s+COLUMN\s+"
    r"(?P<col>\w+);?\s*$",
    re.IGNORECASE,
)
_INSERT_RE = re.compile(
    r"^INSERT\s+INTO\s+(?P<target>[\w.]+)\s+VALUES\s+(?P<rows>.+?);?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_SELECT_RE = re.compile(
    r"^INSERT\s+INTO\s+(?P<target>[\w.]+)\s+(?P<select>SELECT\s+.+?);?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CALL_RE = re.compile(
    r"^CALL\s+(?:[\w]+\.)?system\.(?P<proc>\w+)\s*\((?P<args>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _parse_call_args(raw: str) -> tuple[list, dict]:
    """Iceberg procedure arguments: positional and/or named
    (``name => value``); values are string/number literals."""
    pos, named = [], {}
    for part in _split_top_level(raw):
        part = part.strip()
        if not part:
            continue
        arrow = _mask_quotes(part).find("=>")  # a quoted '=>' is data
        if arrow >= 0:
            name, val = part[:arrow], part[arrow + 2 :]
            named[name.strip().lower()] = _call_literal(val.strip())
        else:
            pos.append(_call_literal(part))
    return pos, named


def _call_literal(tok: str):
    if tok[:1] in "'\"":
        return tok[1:-1]
    try:
        return int(tok)
    except ValueError:
        return tok  # e.g. TIMESTAMP '...' — passed through verbatim


_RENAME_COL_RE = re.compile(
    r"^ALTER\s+TABLE\s+(?P<target>[\w.]+)\s+RENAME\s+COLUMN\s+"
    r"(?P<col>\w+)\s+TO\s+(?P<new>\w+);?\s*$",
    re.IGNORECASE,
)
_ALTER_TYPE_RE = re.compile(
    r"^ALTER\s+TABLE\s+(?P<target>[\w.]+)\s+ALTER\s+COLUMN\s+"
    r"(?P<col>\w+)\s+TYPE\s+(?P<dtype>\w+);?\s*$",
    re.IGNORECASE,
)
_CTAS_RE = re.compile(
    r"^CREATE\s+TABLE\s+(?P<target>[\w.]+)\s+USING\s+iceberg\s+AS\s+"
    r"(?P<select>SELECT\s+.+?);?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_TRUNCATE_RE = re.compile(
    r"^TRUNCATE\s+TABLE\s+(?P<target>[\w.]+);?\s*$", re.IGNORECASE
)
_DROP_TABLE_RE = re.compile(
    r"^DROP\s+TABLE\s+(?:(?P<ifexists>IF\s+EXISTS)\s+)?"
    r"(?P<target>[\w.]+)(?:\s+PURGE)?;?\s*$",
    re.IGNORECASE,
)
_UPDATE_RE = re.compile(
    r"^UPDATE\s+(?P<target>[\w.]+)\s+SET\s+(?P<assigns>.+?)"
    r"(?:\s+WHERE\s+(?P<pred>.+?))?;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_RE = re.compile(
    r"^CREATE\s+TABLE\s+(?P<target>[\w.]+)\s*\((?P<cols>.*)\)\s*"
    r"USING\s+iceberg\s*(?:PARTITIONED\s+BY.*)?;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def execute_statement(
    spark: SparkSession,
    sql: str,
    tables: dict[str, LocalTable],
    name_map: dict[str, str] | None = None,
) -> None:
    """Execute one statement of the reference's SQL surface against
    LocalTables: CREATE TABLE (schema → empty snapshot), INSERT INTO
    ... VALUES and INSERT INTO ... SELECT — the reference's
    literal-select insert shape, IcebergSQLMerge.java:23-24,
    IcebergSCD2.java:26-44 — (append commits), CREATE TABLE ... AS
    SELECT, UPDATE ... SET ... WHERE (conditional rewrite commit; NULL
    predicates keep rows, like DELETE), TRUNCATE TABLE (empty-snapshot
    commit), DROP TABLE (PURGE), ALTER ... RENAME COLUMN / ALTER COLUMN
    TYPE (lossless promotions only), CALL system.* maintenance
    procedures (rollback_to_snapshot / rewrite_data_files /
    expire_snapshots / remove_orphan_files / fast_forward), MERGE INTO
    (see :func:`execute_merge`), DELETE FROM [WHERE] (anti-filter
    overwrite — Iceberg copy-on-write DELETE's observable contract;
    no WHERE deletes all rows), DROP TABLE [IF EXISTS] [PURGE],
    ALTER TABLE ADD/DROP COLUMN (schema evolution as a commit). The
    reference's demo classes are exactly sequences of these statements,
    so a whole class replays end-to-end
    (tests/test_sql_merge.py::test_reference_delete_class_replays)."""
    text = sql.strip()
    # every statement RE matches against the quote-masked text (keyword
    # boundaries — WHERE/VALUES/AS SELECT — must not be shifted by a
    # string literal containing them: the parse_merge bug class); groups
    # that can CONTAIN literals are sliced from the original by span
    masked = _mask_quotes(text)

    def _g(m: re.Match, group: str) -> str | None:
        return (
            text[m.start(group) : m.end(group)]
            if m.group(group) is not None
            else None
        )

    up = text.upper()
    if up.startswith("MERGE"):
        return execute_merge(spark, text, tables, name_map)
    m = _DELETE_RE.match(masked)
    if m:
        if not spark_validates(spark, text, "DeleteFromTable"):
            raise ValueError("Spark's parser rejected the DELETE text")
        t = tables[m.group("target")]
        # DELETE removes rows where the predicate is TRUE; rows where it
        # evaluates to NULL are KEPT (three-valued logic) — coalesce the
        # predicate to FALSE before negating. No WHERE deletes all rows
        # (schema-preserving empty snapshot, like TRUNCATE). Pinned to
        # one base snapshot + expect_current: see execute_merge.
        base = t.current_version
        if m.group("pred") is None:
            t.overwrite(t.read(base).limit(0), expect_current=base)
        else:
            t.overwrite(
                t.read(base).filter(
                    ~F.coalesce(F.expr(_g(m, "pred")), F.lit(False))
                ),
                expect_current=base,
            )
        return
    m = _ADD_COL_RE.match(masked)
    if m:
        if not spark_validates(spark, text, "AddColumns"):
            raise ValueError("Spark's parser rejected the ALTER text")
        t = tables[m.group("target")]
        base = t.current_version
        t.overwrite(
            t.read(base).withColumn(
                m.group("col"),
                F.lit(None).cast(m.group("dtype").lower()),
            ),
            expect_current=base,
        )
        return
    m = _DROP_COL_RE.match(masked)
    if m:
        if not spark_validates(spark, text, "DropColumns"):
            raise ValueError("Spark's parser rejected the ALTER text")
        t = tables[m.group("target")]
        base = t.current_version
        t.overwrite(t.read(base).drop(m.group("col")), expect_current=base)
        return
    m = _CALL_RE.match(masked)
    if m:
        if not spark_validates(spark, text, "Call"):
            raise ValueError("Spark's parser rejected the CALL text")
        proc = m.group("proc").lower()
        pos, named = _parse_call_args(_g(m, "args"))
        # argument dispatch tests named args against None explicitly and
        # validates positional-list length before popping: truthiness
        # dispatch broke the legitimate `snapshot_id => 0` (the create
        # snapshot IS version 0) with IndexError (ADVICE r7)
        tname = named.pop("table", None)
        if tname is None and pos:
            tname = pos.pop(0)
        if tname is None:
            raise ValueError(f"CALL {proc}: missing table argument")
        t = tables[tname]
        # dispatch to the LocalTable maintenance surface — the engine's
        # analogues of Iceberg's stored procedures (catalog.py)
        if proc == "rollback_to_snapshot":
            sid = named.pop("snapshot_id", None)
            if sid is None:
                if not pos:
                    raise ValueError(
                        "CALL rollback_to_snapshot: missing argument "
                        "'snapshot_id'"
                    )
                sid = pos.pop(0)
            t.rollback(sid)
        elif proc == "rewrite_data_files":
            t.compact()
        elif proc == "expire_snapshots":
            keep = named.pop("retain_last", None)
            if keep is None:
                keep = pos.pop(0) if pos else 2
            t.expire_snapshots(keep_last=keep)
        elif proc == "remove_orphan_files":
            # Iceberg's older_than is a timestamp; 0-second grace keeps
            # the call deterministic in tests (dirs qualify immediately)
            t.remove_orphans(older_than_s=0 if named or pos else None)
        elif proc == "fast_forward":
            # fast_forward(table, branch, to): move `branch` (only main
            # here) to the head of `to`; the short positional form
            # fast_forward(table, to) implies branch = main
            to = named.pop("to", None)
            moved = named.pop("branch", None)
            if to is None:
                if not pos:
                    raise ValueError(
                        "CALL fast_forward: missing argument 'to'"
                    )
                to = pos.pop(-1)
            if moved is None and pos:
                moved = pos.pop(0)
            if moved is not None and str(moved).lower() != "main":
                raise ValueError(
                    "fast_forward: only main can be fast-forwarded"
                )
            t.fast_forward(to)
        else:
            raise ValueError(f"unsupported procedure: {proc}")
        return
    m = _RENAME_COL_RE.match(masked)
    if m:
        if not spark_validates(spark, text, "RenameColumn"):
            raise ValueError("Spark's parser rejected the ALTER text")
        t = tables[m.group("target")]
        base = t.current_version
        t.overwrite(
            t.read(base).withColumnRenamed(m.group("col"), m.group("new")),
            expect_current=base,
        )
        return
    m = _ALTER_TYPE_RE.match(masked)
    if m:
        if not spark_validates(spark, text, "AlterColumns"):
            raise ValueError("Spark's parser rejected the ALTER text")
        t = tables[m.group("target")]
        base = t.current_version
        col, new = m.group("col"), m.group("dtype").lower()
        old = dict(t.read(base).dtypes)[col]
        # Iceberg permits only lossless type promotion (int -> bigint,
        # float -> double); anything else is rejected, as the real
        # catalog would
        widen = {("int", "bigint"), ("float", "double")}
        canon = {"integer": "int", "long": "bigint"}
        o, n = canon.get(old, old), canon.get(new, new)
        if o != n and (o, n) not in widen:
            raise ValueError(
                f"cannot evolve column {col}: {old} -> {new} is not a "
                "lossless Iceberg type promotion"
            )
        t.overwrite(
            t.read(base).withColumn(col, F.col(col).cast(new)),
            expect_current=base,
        )
        return
    m = _INSERT_RE.match(masked)
    if m:
        if not spark_validates(spark, text, "InsertIntoStatement"):
            raise ValueError("Spark's parser rejected the INSERT text")
        t = tables[m.group("target")]
        cols = t.read().columns
        df = spark.sql(
            f"SELECT * FROM (VALUES {_g(m, 'rows')})"
        ).toDF(*cols)
        casted = df.select(
            *[
                F.col(c).cast(dt)
                for c, dt in t.read().dtypes
            ]
        )
        t.append(casted)
        return
    m = _UPDATE_RE.match(masked)
    if m:
        if not spark_validates(spark, text, "UpdateTable"):
            raise ValueError("Spark's parser rejected the UPDATE text")
        t = tables[m.group("target")]
        # rows where the predicate is TRUE take the assignments; FALSE
        # and NULL rows keep their values (three-valued logic, the same
        # rule as DELETE above); no WHERE = all rows
        pred = (
            F.coalesce(F.expr(_g(m, "pred")), F.lit(False))
            if m.group("pred")
            else F.lit(True)
        )
        assigns = {}
        for part in _split_top_level(_g(m, "assigns")):
            lhs, rhs = part.split("=", 1)
            assigns[lhs.strip().split(".")[-1]] = rhs.strip()
        base = t.current_version
        dtypes = dict(t.read(base).dtypes)
        unknown = set(assigns) - set(dtypes)
        if unknown:
            raise ValueError(f"UPDATE sets unknown columns: {unknown}")
        t.overwrite(
            t.read(base).select(
                *[
                    (
                        F.when(pred, F.expr(assigns[c]).cast(dtypes[c]))
                        .otherwise(F.col(c))
                        if c in assigns
                        else F.col(c)
                    ).alias(c)
                    for c in t.read(base).columns
                ]
            ),
            expect_current=base,
        )
        return
    m = _INSERT_SELECT_RE.match(masked)
    if m:
        if not spark_validates(spark, text, "InsertIntoStatement"):
            raise ValueError("Spark's parser rejected the INSERT text")
        t = tables[m.group("target")]
        sel = _g(m, "select")
        for qualified, view in (name_map or {}).items():
            sel = _sub_outside_quotes(
                rf"(?<![\w.]){re.escape(qualified)}(?![\w.])", view, sel
            )
        df = spark.sql(sel).toDF(*t.read().columns)
        casted = df.select(
            *[F.col(c).cast(dt) for c, dt in t.read().dtypes]
        )
        t.append(casted)
        return
    m = _CREATE_RE.match(masked)
    if m:
        if not spark_validates(spark, text, "CreateTable"):
            raise ValueError("Spark's parser rejected the CREATE text")
        fields = []
        for part in _split_top_level(_g(m, "cols")):
            # strip COMMENT '...' and NOT NULL (constraints are catalog
            # metadata, not schema shape), keep the FULL type text so
            # parameterized types survive — decimal(10, 2), array<int>
            part = re.sub(
                r"\s+COMMENT\s+'(?:[^'])*'", "", part, flags=re.IGNORECASE
            )
            part = re.sub(r"\s+NOT\s+NULL\b", "", part, flags=re.IGNORECASE)
            toks = part.split(None, 1)
            fields.append(f"{toks[0]} {toks[1].strip()}")
        t = tables[m.group("target")]
        t.create(
            spark.createDataFrame([], ", ".join(fields))
        )
        return
    m = _CTAS_RE.match(masked)
    if m:
        if not spark_validates(spark, text, "CreateTableAsSelect"):
            raise ValueError("Spark's parser rejected the CTAS text")
        sel = _g(m, "select")
        for qualified, view in (name_map or {}).items():
            sel = _sub_outside_quotes(
                rf"(?<![\w.]){re.escape(qualified)}(?![\w.])", view, sel
            )
        tables[m.group("target")].create(spark.sql(sel))
        return
    m = _TRUNCATE_RE.match(masked)
    if m:
        if not spark_validates(spark, text, "TruncateTable"):
            raise ValueError("Spark's parser rejected the TRUNCATE text")
        t = tables[m.group("target")]
        base = t.current_version
        t.overwrite(t.read(base).limit(0), expect_current=base)
        return
    m = _DROP_TABLE_RE.match(masked)
    if m:
        if not spark_validates(spark, text, "DropTable"):
            raise ValueError("Spark's parser rejected the DROP text")
        if m.group("ifexists") and m.group("target") not in tables:
            return
        tables.pop(m.group("target")).drop()
        return
    raise ValueError(f"unsupported statement: {text[:60]!r}")
