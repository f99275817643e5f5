"""psql-script front end: run the reference's SQL file VERBATIM.

The reference's relational entry point is a psql script
(Student_23098644/1.CourseworkOne/SQLQueries.sql — two statements plus a
``set search_path``). The hand ports in queries/reference.py re-express
those queries natively; this module closes the loop the way pipeline.py
does for the Mongo file: a user pastes their EXISTING script and it runs
unchanged on Spark.

What "verbatim" requires beyond ``spark.sql``:

  - statement splitting: a psql script is many ';'-terminated statements;
    the splitter walks the text once, honoring single/double quotes,
    ``--`` line comments and ``/* */`` block comments, so literals and
    comments can contain ';'.
  - ``set search_path = <schema>, ...`` — psql namespace binding. The
    Spark equivalent is view registration, which the caller provides via
    ``tables``; the statement is recognized, recorded, and otherwise a
    no-op (mirrors sources/catalog namespace binding, SURVEY §2 S2).
  - everything else is executed UNMODIFIED via ``spark.sql``: the
    reference script is ANSI enough (CTEs incl. nested, CASE pivots,
    HAVING count(distinct), BETWEEN on dates, right/left joins, string
    sentinels) that Spark's parser takes it as-is — which is the point:
    no translation layer to drift. Statements that Spark genuinely
    cannot parse raise loudly (fail-loudly contract, like pipeline.py).

Scale posture: this is a FRONT END — each statement compiles to the same
Catalyst plan the native port produces (verified by equivalence tests in
tests/test_sqlfile.py), so pushdown/broadcast/AQE behavior is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def split_statements(script: str) -> list[str]:
    """Split a psql script into ';'-terminated statements, honoring
    quotes and comments. The trailing fragment (no ';') is included if
    non-blank.

    Unsupported psql literal syntaxes FAIL LOUDLY instead of mis-splitting
    (fail-loudly contract): dollar-quoted strings (``$$…$$`` / ``$tag$…``)
    and backslash-before-quote inside a single-quoted literal (psql with
    standard_conforming_strings treats ``\\`` as data; Spark's parser
    treats ``\\'`` as an escaped quote, so the same text would parse as a
    DIFFERENT string — refusing beats silently executing different SQL).
    """
    import re as _re

    out: list[str] = []
    buf: list[str] = []
    i, n = 0, len(script)
    in_sq = in_dq = in_line = in_block = False
    while i < n:
        c = script[i]
        nxt = script[i + 1] if i + 1 < n else ""
        if in_line:
            buf.append(c)
            if c == "\n":
                in_line = False
        elif in_block:
            buf.append(c)
            if c == "*" and nxt == "/":
                buf.append(nxt)
                i += 1
                in_block = False
        elif in_sq:
            if c == "\\" and nxt == "'":
                raise NotImplementedError(
                    "backslash-escaped quote inside a string literal: psql "
                    "and Spark disagree on its meaning — rewrite with a "
                    "doubled quote ('')"
                )
            buf.append(c)
            if c == "'":
                if nxt == "'":  # escaped quote
                    buf.append(nxt)
                    i += 1
                else:
                    in_sq = False
        elif in_dq:
            buf.append(c)
            if c == '"':
                in_dq = False
        elif c == "-" and nxt == "-":
            buf.append(c)
            in_line = True
        elif c == "/" and nxt == "*":
            buf.append(c)
            in_block = True
        elif c == "'":
            buf.append(c)
            in_sq = True
        elif c == '"':
            buf.append(c)
            in_dq = True
        elif c == "$" and _re.match(r"\$[A-Za-z_][A-Za-z0-9_]*\$|\$\$", script[i:]):
            raise NotImplementedError(
                "dollar-quoted string literals ($$…$$ / $tag$…$tag$) are "
                "not supported by the Spark SQL parser — rewrite with "
                "standard quotes"
            )
        elif c == ";":
            out.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    tail = "".join(buf)
    if tail.strip():
        out.append(tail)
    return out


def _strip_comments(stmt: str) -> str:
    """Remove comments so statement classification sees real tokens.
    A block comment is replaced by a single SPACE (SQL treats it as a
    token separator: ``a/*c*/b`` is two tokens, never ``ab``) — though
    classification is its only caller; the executed text is always the
    ORIGINAL statement."""
    out: list[str] = []
    i, n = 0, len(stmt)
    in_sq = in_dq = in_line = in_block = False
    while i < n:
        c = stmt[i]
        nxt = stmt[i + 1] if i + 1 < n else ""
        if in_line:
            if c == "\n":
                in_line = False
                out.append(c)
        elif in_block:
            if c == "*" and nxt == "/":
                in_block = False
                out.append(" ")  # comment = token separator, never fusion
                i += 1
        elif in_sq:
            out.append(c)
            if c == "'" and nxt != "'":
                in_sq = False
            elif c == "'":
                out.append(nxt)
                i += 1
        elif in_dq:
            out.append(c)
            if c == '"':
                in_dq = False
        elif c == "-" and nxt == "-":
            in_line = True
        elif c == "/" and nxt == "*":
            in_block = True
        else:
            out.append(c)
            if c == "'":
                in_sq = True
            elif c == '"':
                in_dq = True
        i += 1
    return "".join(out)


def run_sql_script(
    spark: SparkSession,
    script: str,
    tables: dict[str, DataFrame] | None = None,
) -> list[DataFrame]:
    """Execute a psql-style script verbatim; return one DataFrame per
    query statement (``set search_path`` binds the namespace — here a
    recorded no-op, since ``tables`` registration IS the binding).
    The comment-stripped text is used ONLY to classify the statement;
    what executes is the ORIGINAL statement, comments and all (Spark's
    parser handles them) — so 'verbatim' stays literally true."""
    for name, df in (tables or {}).items():
        df.createOrReplaceTempView(name)
    results: list[DataFrame] = []
    for stmt in split_statements(script):
        body = _strip_comments(stmt).strip()
        if not body:
            continue
        head = body.split(None, 2)
        if len(head) >= 2 and head[0].lower() == "set" and head[1].lower().startswith("search_path"):
            continue  # namespace binding: satisfied by the registered views
        results.append(spark.sql(stmt))
    return results
