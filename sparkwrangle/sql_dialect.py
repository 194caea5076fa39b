"""DuckDB → Spark SQL dialect shim (translate-on-read).

The engine's SQL-text entry surface (SURVEY §3 lifecycle #2) accepts
ANSI-ish SQL verbatim; this module widens that entry for users whose
query text was written for DuckDB (the oracle dialect of this repo's
correctness gate, and a common local-analytics dialect). ``translate``
applies MECHANICAL, expression-local rewrites only — function renames,
argument reshapes, and literal-syntax conversions with exact Spark
equivalents (plus one statement-level rewrite: top-level ``QUALIFY``
becomes a filtered subquery). It is deliberately NOT a SQL parser:
constructs whose semantics have no local Spark twin (aggregate-internal
``ORDER BY``, lateral ``range()`` table functions, generators nested
inside scalar expressions, ``UNION`` inside recursive CTEs) are passed
through untouched and will fail in Spark — the caller finds out at
parse/run time, exactly as with any unsupported SQL.

Rules (each one line of the table below is one rewrite):

    DuckDB                              Spark
    ------                              -----
    unnest(x)                           explode(x)
    list_filter / list_transform        filter / transform
    list_min(x)                         array_min(x)
    list_sum(x)                         aggregate(x, 0.0d, +)
    list_slice(x, a, b)   [1-based incl] slice(x, a, b-a+1)
    list_dot_product(a, b)              aggregate(zip_with(a,b,*), 0.0d, +)
    array_to_string(x, s)               array_join(x, s)
    len(x)                              size(x)
    range(a, b[, s])      [excl end]    sequence(a, b-1[, s])
    epoch(ts)                           unix_timestamp(ts)
    quantile_cont(x, q)                 percentile(x, q)
    json_extract_string(j, p)           get_json_object(j, p)
    isfinite(x)                         NOT isnan AND |x| <> inf
    struct_pack(k := v, ...)            named_struct('k', v, ...)
    {'k': v, ...}                       named_struct('k', v, ...)
    x[i]                  [1-based]     element_at(x, i)
    [a, b, ...]           [literal]     array(a, b, ...)
    a // b                              a DIV b
    f(x IGNORE NULLS) OVER              f(x) IGNORE NULLS OVER
    date_diff('day', a, b)              date_diff(day, a, b)
    regexp_extract_all(s, re)           regexp_extract_all(s, re, 0)
                                        (DuckDB's default group is the
                                        whole match; Spark's is group 1)
    xor(a, b)                           (a ^ b)
    ord(c)                              ascii(c)
    arg_max / arg_min                   max_by / min_by
    generate_series(a, b)  [incl]       sequence(a, b)
    list(x)                             collect_list(x)
    to_days(n)                          make_dt_interval(n)
    CAST(concat('0x', h) AS BIGINT)     CAST(conv(h, 16, 10) AS BIGINT)
                                        (Spark casts hex strings to NULL)
    <query> QUALIFY c                   SELECT * FROM (<query>) WHERE c
    "ident"                             `ident`   (DuckDB double quotes
                                        are ALWAYS identifiers; strings
                                        are single-quoted)
    CAST(x AS VARCHAR)                  CAST(x AS STRING)
    CAST(x AS DOUBLE[])                 CAST(x AS ARRAY<DOUBLE>)
    AS MATERIALIZED (                   AS (

All scanning skips single-quoted string literals, so rewrites never fire
inside data values. Every rewrite preserves 1-based list semantics via
``element_at``/``slice`` rather than Spark's 0-based ``[]`` operator.
"""

from __future__ import annotations

import re


def _skip_string(sql: str, i: int) -> int:
    """``sql[i]`` is the opening quote; return index just past the close
    (doubled quotes escape)."""
    q = sql[i]
    j = i + 1
    while j < len(sql):
        if sql[j] == q:
            if j + 1 < len(sql) and sql[j + 1] == q:
                j += 2
                continue
            return j + 1
        j += 1
    return len(sql)


def _segments(sql: str):
    """Yield (is_string_literal, segment) pairs covering the whole text."""
    j = 0
    start = 0
    while j < len(sql):
        if sql[j] == "'":
            if start < j:
                yield False, sql[start:j]
            k = _skip_string(sql, j)
            yield True, sql[j:k]
            j = k
            start = k
        else:
            j += 1
    if start < len(sql):
        yield False, sql[start:]


def _sub_outside(pattern: str, repl, sql: str, flags: int = 0) -> str:
    """re.sub that never fires inside single-quoted string literals."""
    return "".join(
        seg if is_str else re.sub(pattern, repl, seg, flags=flags)
        for is_str, seg in _segments(sql)
    )


def _match_paren(sql: str, i: int) -> int:
    """``sql[i]`` is '(' / '[' / '{'; return the index of its matching
    closer, honoring nesting and string literals."""
    pairs = {"(": ")", "[": "]", "{": "}"}
    openers = set(pairs)
    closers = set(pairs.values())
    stack = [sql[i]]
    j = i + 1
    while j < len(sql):
        c = sql[j]
        if c == "'":
            j = _skip_string(sql, j)
            continue
        if c in openers:
            stack.append(c)
        elif c in closers:
            stack.pop()
            if not stack:
                return j
        j += 1
    raise ValueError(f"unbalanced {sql[i]!r} at {i}")


def _split_args(body: str) -> list[str]:
    """Split a call body on top-level commas (string- and nest-aware)."""
    args, cur, depth, j = [], [], 0, 0
    while j < len(body):
        c = body[j]
        if c == "'":
            k = _skip_string(body, j)
            cur.append(body[j:k])
            j = k
            continue
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        if c == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        j += 1
    tail = "".join(cur).strip()
    if tail:
        args.append(tail)
    return args


def _rewrite_calls(sql: str, name: str, make) -> str:
    """Replace every ``name(args...)`` call with ``make(args_list)``,
    innermost-last (we re-scan from the top after each rewrite, and
    ``make`` receives already-translated arg text because rules are
    applied in a fixed-point loop by ``translate``)."""
    pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
    out = sql
    pos = 0
    while True:
        m = pat.search(out, pos)
        if not m:
            return out
        # don't fire inside a string literal: count quotes before match
        prefix = out[: m.start()]
        if prefix.count("'") % 2 == 1:
            pos = m.end()
            continue
        lp = m.end() - 1
        rp = _match_paren(out, lp)
        args = _split_args(out[lp + 1 : rp])
        try:
            repl = make(args)
        except ValueError:
            pos = m.end()
            continue
        out = out[: m.start()] + repl + out[rp + 1 :]
        # resume just past the match START, not past the replacement:
        # the replacement may embed NESTED same-name calls from the
        # original arg text (list_slice(list_slice(...), ...)), which a
        # full skip would leave untranslated (caught by
        # fuzz_sql_dialect_shim). +1 cannot re-match this call (the
        # name no longer starts there) and pos is strictly monotonic,
        # so identity rewrites (e.g. 3-arg regexp_extract_all) terminate.
        pos = m.start() + 1


# ---- per-rule arg reshapes -------------------------------------------------


def _range_to_sequence(args: list[str]) -> str:
    # DuckDB range(a, b) is end-EXCLUSIVE and returns [] (not NULL) when
    # b <= a; Spark sequence is end-inclusive and generates a DESCENDING
    # sequence on inverted bounds (or throws with an explicit positive
    # step), so guard with CASE. The ELSE branch materializes a typed
    # EMPTY array — slice([a], 1, 0) — because NULL is observably
    # different (len([]) = 0 vs size(NULL) = NULL; list_transform([])
    # = [] vs transform(NULL) = NULL).
    if len(args) == 1:
        a, b = "0", args[0]
        step = ""
    elif len(args) == 2:
        a, b = args
        step = ""
    elif len(args) == 3:
        a, b, s = args
        step = f", {s}"
    else:
        raise ValueError("range arity")
    return (
        f"(CASE WHEN ({b}) > ({a}) THEN sequence({a}, ({b}) - 1{step}) "
        f"ELSE slice(sequence(({a}), ({a})), 1, 0) END)"
    )


def _list_sum(args: list[str]) -> str:
    # SQL SUM semantics, exactly like DuckDB's list_sum: NULL on an
    # empty list (a 0.0 seed would return 0.0), NULL elements skipped
    # (a plain acc + v would poison the whole sum). The NULL seed +
    # coalesce inside the lambda gives both.
    if len(args) != 1:
        raise ValueError("list_sum arity")
    return (
        f"aggregate({args[0]}, CAST(NULL AS DOUBLE), (acc, v) -> "
        "CASE WHEN v IS NULL THEN acc "
        "ELSE coalesce(acc, CAST(0.0 AS DOUBLE)) + CAST(v AS DOUBLE) END)"
    )


def _list_slice(args: list[str]) -> str:
    if len(args) != 3:
        raise ValueError("list_slice arity")
    x, a, b = args
    return f"slice({x}, {a}, ({b}) - ({a}) + 1)"


def _list_dot_product(args: list[str]) -> str:
    if len(args) != 2:
        raise ValueError("list_dot_product arity")
    a, b = args
    return (
        f"aggregate(zip_with({a}, {b}, (xx, yy) -> CAST(xx AS DOUBLE) * "
        "CAST(yy AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _isfinite(args: list[str]) -> str:
    if len(args) != 1:
        raise ValueError("isfinite arity")
    x = args[0]
    return f"(NOT isnan({x}) AND abs({x}) <> double('Infinity'))"


def _xor(args: list[str]) -> str:
    if len(args) != 2:
        raise ValueError("xor arity")
    return f"({args[0]} ^ {args[1]})"


_HEX_CAST = re.compile(
    r"(?is)^concat\(\s*'0x'\s*,\s*(.+)\s*\)\s*AS\s+BIGINT$"
)


def _hex_cast(args: list[str]) -> str:
    """DuckDB parses hex-string casts (``CAST('0x..' AS BIGINT)``); Spark
    returns NULL for them. The repo's fingerprint idiom
    ``CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)`` becomes
    ``conv(hex, 16, 10)``. Only this concat-'0x' shape rewrites; every
    other CAST is left alone (ValueError → skip)."""
    if len(args) != 1:
        raise ValueError("not a cast")
    m = _HEX_CAST.match(args[0])
    if not m:
        raise ValueError("not the hex idiom")
    inner = m.group(1)
    if inner.count("(") != inner.count(")"):
        raise ValueError("unbalanced hex inner")
    return f"CAST(conv({inner}, 16, 10) AS BIGINT)"


def _date_diff(args: list[str]) -> str:
    # Spark wants the unit as a bare identifier, DuckDB as a string
    if len(args) == 3 and re.fullmatch(r"'\w+'", args[0]):
        return f"date_diff({args[0][1:-1]}, {args[1]}, {args[2]})"
    raise ValueError("not the quoted-unit form")


def _regexp_extract_all(args: list[str]) -> str:
    # DuckDB's default group index is 0 (the whole match); Spark's is 1
    if len(args) == 2:
        return f"regexp_extract_all({args[0]}, {args[1]}, 0)"
    return f"regexp_extract_all({', '.join(args)})"


def _qualify(sql: str) -> str:
    """Top-level ``<query> QUALIFY <cond> [ORDER BY ...]`` →
    ``SELECT * FROM (<query>) WHERE <cond> [ORDER BY ...]`` — DuckDB's
    QUALIFY filters on window-function aliases of the same select list,
    which the subquery form expresses directly."""
    m = None
    depth = 0
    j = 0
    while j < len(sql):
        c = sql[j]
        if c == "'":
            j = _skip_string(sql, j)
            continue
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif depth == 0 and sql[j : j + 7].upper() == "QUALIFY" and (
            j == 0 or not (sql[j - 1].isalnum() or sql[j - 1] == "_")
        ):
            m = j
            break
        j += 1
    if m is None:
        return sql
    head, tail = sql[:m].rstrip(), sql[m + 7 :]
    ob = re.search(r"\bORDER\s+BY\b", tail, re.IGNORECASE)
    cond, suffix = (tail[: ob.start()], " " + tail[ob.start() :]) if ob else (tail, "")
    return f"SELECT * FROM ({head}) WHERE {cond.strip()}{suffix}"


def _struct_pack(args: list[str]) -> str:
    parts = []
    for a in args:
        k, _, v = a.partition(":=")
        if not _:
            raise ValueError("struct_pack without :=")
        parts.append(f"'{k.strip()}', {v.strip()}")
    return f"named_struct({', '.join(parts)})"


def _brace_struct(sql: str) -> str:
    """``{'k': v, ...}`` struct literals → named_struct. A ``{`` in SQL
    text (outside strings) only occurs in this DuckDB literal form."""
    out = sql
    j = 0
    while j < len(out):
        c = out[j]
        if c == "'":
            j = _skip_string(out, j)
            continue
        if c == "{":
            rb = _match_paren(out, j)
            parts = []
            ok = True
            for a in _split_args(out[j + 1 : rb]):
                if not a.startswith("'"):
                    ok = False
                    break
                k_end = _skip_string(a, 0)
                key = a[:k_end]
                rest = a[k_end:].lstrip()
                if not rest.startswith(":"):
                    ok = False
                    break
                parts.append(f"{key}, {rest[1:].strip()}")
            if ok and parts:
                repl = f"named_struct({', '.join(parts)})"
                out = out[:j] + repl + out[rb + 1 :]
                # do NOT skip the replacement: it may embed NESTED brace
                # literals from the original value text ({'a': {'b': x}})
                # — re-scan from the same index (now 'n', so no re-match;
                # each iteration consumes one '{' → terminates)
                continue
        j += 1
    return out


_SUBSCRIPT_BASE = re.compile(r"[\w.`]+$")


def _subscripts(sql: str) -> str:
    """1-based DuckDB subscripts ``base[expr]`` → ``element_at(base,
    expr)`` (also correct for map access). Handles simple bases
    (identifiers, dotted paths) and parenthesized bases ``( ... )[i]``;
    leaves anything else alone."""
    out = sql
    j = 0
    while j < len(out):
        c = out[j]
        if c == "'":
            j = _skip_string(out, j)
            continue
        if c == "[":
            # find the base expression ending at j
            base_start = None
            k = j - 1
            while k >= 0 and out[k].isspace():
                k -= 1
            if k >= 0 and out[k] == ")":
                # parenthesized base: walk back to its opener, then
                # extend over a preceding callee name — func(...)[k]
                # must subscript the whole CALL, not splice element_at
                # between the name and its argument list (caught by
                # fuzz_sql_dialect_shim on list_filter(...)[k])
                depth = 0
                b = k
                while b >= 0:
                    if out[b] == ")":
                        depth += 1
                    elif out[b] == "(":
                        depth -= 1
                        if depth == 0:
                            break
                    b -= 1
                if depth == 0:
                    while b > 0 and (out[b - 1].isalnum() or out[b - 1] in "_.`"):
                        b -= 1
                    base_start = b
                else:
                    base_start = None
            else:
                m = _SUBSCRIPT_BASE.search(out[: k + 1])
                if m and m.group():
                    base_start = m.start()
            if base_start is not None and base_start <= k:
                base = out[base_start : k + 1]
                # CAST(... AS DOUBLE[]) — the [] is a type, not a subscript
                rb = _match_paren(out, j)
                idx = out[j + 1 : rb].strip()
                if idx:
                    repl = f"element_at({base}, {idx})"
                    out = out[:base_start] + repl + out[rb + 1 :]
                    # re-scan from the replacement start: the base/index
                    # text may embed NESTED subscripts or list literals
                    # (l[(l[2])]); every iteration consumes one '[' and
                    # none are introduced, so this terminates
                    j = base_start
                    continue
            if base_start is None:
                # no base expression → a DuckDB list LITERAL [a, b, ...]
                rb = _match_paren(out, j)
                elems = _split_args(out[j + 1 : rb])
                repl = f"array({', '.join(elems)})"
                out = out[:j] + repl + out[rb + 1 :]
                # same nested-rescan rule as above ([[1,2],[3]])
                continue
        j += 1
    return out


def _intdiv(sql: str) -> str:
    """``a // b`` → ``a DIV b`` outside strings."""
    out = []
    j = 0
    while j < len(sql):
        c = sql[j]
        if c == "'":
            k = _skip_string(sql, j)
            out.append(sql[j:k])
            j = k
            continue
        if c == "/" and j + 1 < len(sql) and sql[j + 1] == "/":
            out.append(" DIV ")
            j += 2
            continue
        out.append(c)
        j += 1
    return "".join(out)


def _dquote_idents(sql: str) -> str:
    """DuckDB double quotes are ALWAYS identifiers (strings are
    single-quoted) → backticks."""
    out = []
    j = 0
    while j < len(sql):
        c = sql[j]
        if c == "'":
            k = _skip_string(sql, j)
            out.append(sql[j:k])
            j = k
            continue
        if c == '"':
            k = _skip_string(sql, j)
            out.append("`" + sql[j + 1 : k - 1].replace('""', '"') + "`")
            j = k
            continue
        out.append(c)
        j += 1
    return "".join(out)


_WORD_RENAMES = [
    ("unnest", "explode"),
    ("list_filter", "filter"),
    ("list_transform", "transform"),
    ("list_min", "array_min"),
    ("list_max", "array_max"),
    ("array_to_string", "array_join"),
    ("len", "size"),
    ("epoch", "unix_timestamp"),
    ("quantile_cont", "percentile"),
    ("json_extract_string", "get_json_object"),
    ("arg_max", "max_by"),
    ("arg_min", "min_by"),
    # generate_series is end-INCLUSIVE in DuckDB — exactly Spark sequence
    ("generate_series", "sequence"),
    # the bare list() aggregate (list(x ORDER BY y) stays untranslatable)
    ("list", "collect_list"),
    # to_days(n) builds an n-day interval
    ("to_days", "make_dt_interval"),
    ("ord", "ascii"),
]


def translate(sql: str) -> str:
    """Apply every mechanical DuckDB→Spark rewrite (module docstring)."""
    out = sql
    # literal / operator syntax first (they may contain function calls)
    out = _dquote_idents(out)
    out = _brace_struct(out)
    out = _intdiv(out)
    # arg-reshaping call rewrites (paren-aware)
    out = _rewrite_calls(out, "range", _range_to_sequence)
    out = _rewrite_calls(out, "list_sum", _list_sum)
    out = _rewrite_calls(out, "list_slice", _list_slice)
    out = _rewrite_calls(out, "list_dot_product", _list_dot_product)
    out = _rewrite_calls(out, "isfinite", _isfinite)
    out = _rewrite_calls(out, "struct_pack", _struct_pack)
    out = _rewrite_calls(out, "regexp_extract_all", _regexp_extract_all)
    out = _rewrite_calls(out, "xor", _xor)
    out = _rewrite_calls(out, "CAST", _hex_cast)
    out = _qualify(out)
    # subscripts after call rewrites (element_at wraps translated args);
    # note CAST(x AS DOUBLE[]) is handled below, before subscripting
    out = _sub_outside(
        r"\bAS\s+(\w+)\s*\[\s*\]",
        lambda m: f"AS ARRAY<{'STRING' if m.group(1).upper() == 'VARCHAR' else m.group(1)}>",
        out,
        flags=re.IGNORECASE,
    )
    out = _subscripts(out)
    # simple renames
    for a, b in _WORD_RENAMES:
        out = _sub_outside(rf"\b{a}\s*\(", f"{b}(", out, flags=re.IGNORECASE)
    # IGNORE NULLS inside the call parens → after them
    out = _sub_outside(r"\s+IGNORE\s+NULLS\s*\)", ") IGNORE NULLS", out, flags=re.IGNORECASE)
    # quoted datetime units → bare identifiers (date_diff ONLY — Spark's
    # date_trunc takes the unit as a string, same as DuckDB)
    out = _rewrite_calls(out, "date_diff", _date_diff)
    out = _sub_outside(r"\bAS\s+VARCHAR\b", "AS STRING", out, flags=re.IGNORECASE)
    out = _sub_outside(r"\bAS\s+MATERIALIZED\s*\(", "AS (", out, flags=re.IGNORECASE)
    return out
