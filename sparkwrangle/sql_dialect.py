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
    list_sum(x)                         aggregate(x, <typed NULL seed>, +)
                                        (carrier = element type widened
                                        to at least BIGINT, so integer
                                        lists stay integer-composable
                                        with // and xor, like DuckDB)
    list_slice(x, a, b)   [1-based incl] slice(x, a, b-a+1)
    list_dot_product(a, b)              aggregate(zip_with(a,b,*), 0.0d, +)
    array_to_string(x, s)               array_join(x, s)
    len(x)                              size(x)   (list arguments assumed:
                                        DuckDB len() also takes strings,
                                        Spark size() does not — string
                                        len() fails loudly at analysis)
    range(a, b[, s])      [excl end]    CASE sign(s) → sequence(a, b∓1, s)
                                        (ascending, descending, and the
                                        empty/zero-step cases all match
                                        DuckDB: empty is a typed [])
    epoch(ts)                           unix_timestamp(ts)
    quantile_cont(x, q)                 percentile(x, q)
    json_extract_string(j, p)           get_json_object(j, p)
    isfinite(x)                         NOT isnan AND |x| <> inf
    struct_pack(k := v, ...)            named_struct('k', v, ...)
    {'k': v, ...}                       named_struct('k', v, ...)
    x[i]                  [1-based]     try_element_at(x, i)  (index 0 and
                                        out-of-range → NULL like DuckDB,
                                        under ANSI too; non-literal
                                        indexes get a nullif(i, 0) guard)
    [a, b, ...]           [literal]     array(a, b, ...)
    a // b                              a DIV b
    f(x IGNORE NULLS) OVER              f(x) IGNORE NULLS OVER
    date_diff('day', a, b)              date_diff(day, a, b)
    regexp_extract_all(s, re)           regexp_extract_all(s, re, 0)
                                        (DuckDB's default group is the
                                        whole match; Spark's is group 1)
    regexp_replace(s, re, r, 'g')       regexp_replace(s, re, r)
                                        (Spark is global-always; its 4th
                                        arg is a position, not a flag)
    xor(a, b)                           (a ^ b)
    ord(c)                              ascii(c)
    arg_max / arg_min                   max_by / min_by
    generate_series([a,] b[, s]) [incl] CASE direction → sequence(a, b[, s])
                                        (inverted bounds / wrong-sign
                                        step / step 0 → typed [] like
                                        DuckDB; Spark's bare sequence
                                        auto-descends or throws there)
    list(x)                             collect_list(x)
    to_days(n)                          make_dt_interval(n)
    INTERVAL (expr) UNIT                ((expr) * INTERVAL '1' UNIT)
    CAST(concat('0x', h) AS BIGINT)     CAST(conv(h, 16, 10) AS BIGINT)
                                        (Spark casts hex strings to NULL)
    <query> QUALIFY c                   SELECT * FROM (<query>) WHERE c
                                        (inline window functions in c are
                                        hoisted to projected __qual_wN
                                        aliases and EXCEPTed back out)
    "ident"                             `ident`   (DuckDB double quotes
                                        are ALWAYS identifiers; strings
                                        are single-quoted)
    CAST(x AS VARCHAR)                  CAST(x AS STRING)
    CAST(x AS DOUBLE[])                 CAST(x AS ARRAY<DOUBLE>)
    AS MATERIALIZED (                   AS (
    -- c / /* c */                      (stripped up front — comments are
                                        removed from the translated text
                                        so an apostrophe in a comment can
                                        never flip string-scan parity)

All scanning skips single-quoted string literals AND quoted identifiers
(double-quoted DuckDB form and the backtick form this module emits), so
rewrites never fire inside data values or identifier names — including
identifiers containing apostrophes. Every rewrite preserves 1-based list
semantics via ``try_element_at``/``slice`` rather than Spark's 0-based
``[]`` operator. Known edge: a MAP subscripted by a non-literal
STRING-typed key gets the ``nullif(key, 0)`` guard, whose string→int
comparison throws under ANSI mode (literal string keys are emitted
unguarded and are fine).
"""

from __future__ import annotations

import re


# every quote form that opens an opaque segment: single-quoted strings,
# double-quoted DuckDB identifiers (input), backtick identifiers (what
# _dquote_idents emits — apostrophes INSIDE them must not flip parity)
_QUOTES = "'\"`"


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


def _strip_comments(sql: str) -> str:
    """Remove ``--`` line comments and (nested, per DuckDB/Postgres)
    ``/* */`` block comments, string- and identifier-aware. Runs FIRST in
    ``translate`` so an apostrophe inside a comment (``-- don't``) can
    never flip quote parity for the downstream scanners — the r12 shim
    corrupted data values after such comments (ADVICE r12). Comments
    carry no semantics, so the translated text simply drops them."""
    out: list[str] = []
    j = 0
    n = len(sql)
    while j < n:
        c = sql[j]
        if c in _QUOTES:
            k = _skip_string(sql, j)
            out.append(sql[j:k])
            j = k
            continue
        if c == "-" and sql[j + 1 : j + 2] == "-":
            k = sql.find("\n", j)
            j = n if k == -1 else k  # keep the newline itself
            continue
        if c == "/" and sql[j + 1 : j + 2] == "*":
            depth = 1
            j += 2
            while j < n and depth:
                if sql[j : j + 2] == "/*":
                    depth += 1
                    j += 2
                elif sql[j : j + 2] == "*/":
                    depth -= 1
                    j += 2
                else:
                    j += 1
            out.append(" ")
            continue
        out.append(c)
        j += 1
    return "".join(out)


def _segments(sql: str):
    """Yield (is_opaque, segment) pairs covering the whole text, where
    opaque segments are string literals and quoted identifiers."""
    j = 0
    start = 0
    while j < len(sql):
        if sql[j] in _QUOTES:
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


def _in_quoted(sql: str, pos: int) -> bool:
    """True when ``pos`` falls inside a string literal or quoted
    identifier (replaces the old quote-parity count, which apostrophes
    inside backtick identifiers could fool)."""
    j = 0
    while j < pos:
        if sql[j] in _QUOTES:
            k = _skip_string(sql, j)
            if k > pos:
                return True
            j = k
        else:
            j += 1
    return False


def _sub_outside(pattern: str, repl, sql: str, flags: int = 0) -> str:
    """re.sub that never fires inside string literals or quoted idents."""
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
        if c in _QUOTES:
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
        if c in _QUOTES:
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
        # don't fire inside a string literal or quoted identifier
        if _in_quoted(out, m.start()):
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
    # DuckDB range(a, b[, s]) is end-EXCLUSIVE and returns [] (not NULL)
    # whenever the direction is degenerate — b <= a ascending, b >= a
    # descending, and even step 0 (verified against DuckDB; NOT an
    # error); Spark sequence is end-inclusive and throws when the step
    # sign contradicts the bounds, so guard with CASE. The 3-arg form
    # branches on the STEP'S RUNTIME SIGN (r13, ADVICE r12: a literal
    # negative step used to fall into the ascending branch and silently
    # return []): ascending shrinks the end by 1, descending GROWS it by
    # 1 — range(5, 0, -1) = [5..1] = sequence(5, 1, -1). Both sequence
    # branches are fold-safe (verified: Catalyst does not evaluate the
    # untaken branch of a literal CASE). The ELSE branch materializes a
    # typed EMPTY array — slice([a], 1, 0) — because NULL is observably
    # different (len([]) = 0 vs size(NULL) = NULL; list_transform([])
    # = [] vs transform(NULL) = NULL).
    if len(args) == 1:
        a, b = "0", args[0]
    elif len(args) == 2:
        a, b = args
    elif len(args) == 3:
        a, b, s = args
        return (
            f"(CASE WHEN ({s}) > 0 AND ({b}) > ({a}) "
            f"THEN sequence({a}, ({b}) - 1, {s}) "
            f"WHEN ({s}) < 0 AND ({b}) < ({a}) "
            f"THEN sequence({a}, ({b}) + 1, {s}) "
            f"ELSE slice(sequence(({a}), ({a})), 1, 0) END)"
        )
    else:
        raise ValueError("range arity")
    return (
        f"(CASE WHEN ({b}) > ({a}) THEN sequence({a}, ({b}) - 1) "
        f"ELSE slice(sequence(({a}), ({a})), 1, 0) END)"
    )


def _generate_series(args: list[str]) -> str:
    # DuckDB generate_series is end-INCLUSIVE and DIRECTION-GUARDED:
    # [] when b < a ascending, b > a descending, or step 0 (and the
    # 1-arg form counts 0..n). Spark sequence is inclusive too but
    # AUTO-DESCENDS on inverted 2-arg bounds (sequence(5, 1) = [5..1]
    # where DuckDB says []) and THROWS on a wrong-sign explicit step —
    # so the r12 plain rename silently diverged on inverted bounds
    # (r13). Same typed-empty ELSE as range().
    def empty(a: str) -> str:
        return f"slice(sequence(({a}), ({a})), 1, 0)"

    if len(args) == 1:
        (n,) = args
        return (
            f"(CASE WHEN ({n}) >= 0 THEN sequence(0, {n}) "
            f"ELSE {empty('0')} END)"
        )
    if len(args) == 2:
        a, b = args
        return (
            f"(CASE WHEN ({b}) >= ({a}) THEN sequence({a}, {b}) "
            f"ELSE {empty(a)} END)"
        )
    if len(args) == 3:
        a, b, s = args
        if re.search(r"\binterval\b", s, re.IGNORECASE) or "'" in s:
            # DATE/TIMESTAMP series with an INTERVAL step: the sign
            # guard can't compare an interval to 0, and Spark sequence
            # handles interval steps natively — plain rename, with the
            # pre-r13 caveat (wrong-direction throws in Spark where
            # DuckDB returns []; loud, not silent)
            return f"sequence({a}, {b}, {s})"
        return (
            f"(CASE WHEN ({s}) > 0 AND ({b}) >= ({a}) "
            f"THEN sequence({a}, {b}, {s}) "
            f"WHEN ({s}) < 0 AND ({b}) <= ({a}) "
            f"THEN sequence({a}, {b}, {s}) "
            f"ELSE {empty(a)} END)"
        )
    raise ValueError("generate_series arity")


def _list_sum(args: list[str]) -> str:
    # SQL SUM semantics, exactly like DuckDB's list_sum: NULL on an
    # empty list (a zero seed would return 0), NULL elements skipped
    # (a plain acc + v would poison the whole sum). The NULL seed +
    # coalesce inside the lambda gives both. The seed's TYPE is the
    # element type widened to at least BIGINT (r13, VERDICT r12 ask —
    # the old CAST(NULL AS DOUBLE) carrier made integer list_sum
    # un-composable with // and xor): ``try_element_at(slice(x, 1, 0),
    # 1)`` is a NULL of the element's own type, and ``+ CAST(0 AS
    # BIGINT)`` coerces it to max(elem, BIGINT) — BIGINT for integer
    # lists (DuckDB sums integers in HUGEINT; BIGINT matches for any
    # non-overflowing value), DOUBLE for double lists. The argument
    # text is duplicated into the seed; rewrites are expression-local
    # and deterministic, so the duplicate is semantically safe. Known
    # edge: DECIMAL-element lists fail LOUDLY at analysis (decimal
    # addition grows precision, so no fixed accumulator type exists
    # below precision 38) — cast the elements to DOUBLE first; DuckDB
    # carries DECIMAL(38) there, which Spark's lambda typing can't
    # express mechanically.
    if len(args) != 1:
        raise ValueError("list_sum arity")
    x = args[0]
    return (
        f"aggregate({x}, try_element_at(slice({x}, 1, 0), 1) "
        "+ CAST(0 AS BIGINT), (acc, v) -> "
        "CASE WHEN v IS NULL THEN acc "
        "ELSE coalesce(acc, CAST(0 AS BIGINT)) + v END)"
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


def _regexp_replace(args: list[str]) -> str:
    # DuckDB replaces the FIRST occurrence unless the 'g' flag is given;
    # Spark replaces ALL occurrences and has no flag argument (its 4th
    # parameter is a start POSITION, so a DuckDB 'g' landing there would
    # silently cast to NULL — the r13 probe caught x_negative_sampling
    # returning 0 rows through exactly that hole). Only the exact
    # global-flag form rewrites (drop the flag); every other 4-arg form
    # is left untouched.
    if len(args) == 4 and args[3].strip().lower() == "'g'":
        return f"regexp_replace({args[0]}, {args[1]}, {args[2]})"
    raise ValueError("not the global-flag form")


def _regexp_extract_all(args: list[str]) -> str:
    # DuckDB's default group index is 0 (the whole match); Spark's is 1
    if len(args) == 2:
        return f"regexp_extract_all({args[0]}, {args[1]}, 0)"
    return f"regexp_extract_all({', '.join(args)})"


def _hoist_windows(cond: str) -> tuple[str, list[str]]:
    """Extract inline ``fn(args) OVER (spec)`` window expressions from a
    QUALIFY condition, replacing each with a ``__qual_wN`` alias.
    Returns (rewritten condition, [window expr, ...]); bails to
    (cond, []) on the named-window ``OVER w`` form or anything it can't
    mechanically delimit (those stay on the plain-subquery path and fail
    loudly in Spark, as before)."""
    out = cond
    exprs: list[str] = []
    j = 0
    while j < len(out):
        c = out[j]
        if c in _QUOTES:
            j = _skip_string(out, j)
            continue
        if (
            out[j : j + 4].upper() == "OVER"
            and (j == 0 or not (out[j - 1].isalnum() or out[j - 1] == "_"))
            and not (out[j + 4 : j + 5].isalnum() or out[j + 4 : j + 5] == "_")
        ):
            k = j + 4
            while k < len(out) and out[k].isspace():
                k += 1
            if k >= len(out) or out[k] != "(":
                return cond, []  # named-window OVER w — not mechanical
            rp = _match_paren(out, k)
            # walk back over the window-function call preceding OVER
            b = j - 1
            while b >= 0 and out[b].isspace():
                b -= 1
            if b < 0 or out[b] != ")":
                return cond, []
            depth = 0
            while b >= 0:
                if out[b] == ")":
                    depth += 1
                elif out[b] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                b -= 1
            if depth != 0:
                return cond, []
            while b > 0 and (out[b - 1].isalnum() or out[b - 1] in "_.`"):
                b -= 1
            alias = f"__qual_w{len(exprs) + 1}"
            exprs.append(out[b : rp + 1])
            out = out[:b] + alias + out[rp + 1 :]
            j = b + len(alias)
            continue
        j += 1
    return out, exprs


def _qualify(sql: str) -> str:
    """Top-level ``<query> QUALIFY <cond> [ORDER BY ...]`` →
    ``SELECT * FROM (<query>) WHERE <cond> [ORDER BY ...]`` — DuckDB's
    QUALIFY filters on window-function aliases of the same select list,
    which the subquery form expresses directly. Inline window functions
    in the condition (``QUALIFY row_number() OVER (...) = 1`` — the most
    common DuckDB form, which Spark rejects in WHERE; ADVICE r12) are
    hoisted into projected ``__qual_wN`` aliases on an inner subquery and
    removed from the result schema with ``SELECT * EXCEPT``; their
    partition/order columns must appear in the query's select list, like
    the alias form."""
    m = None
    depth = 0
    j = 0
    while j < len(sql):
        c = sql[j]
        if c in _QUOTES:
            j = _skip_string(sql, j)
            continue
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif (
            depth == 0
            and sql[j : j + 7].upper() == "QUALIFY"
            and (j == 0 or not (sql[j - 1].isalnum() or sql[j - 1] == "_"))
            # right word boundary too (r13): an identifier like
            # `qualify_t` must not trigger the rewrite
            and not (sql[j + 7 : j + 8].isalnum() or sql[j + 7 : j + 8] == "_")
        ):
            m = j
            break
        j += 1
    if m is None:
        return sql
    head, tail = sql[:m].rstrip(), sql[m + 7 :]
    # split the trailing ORDER BY off the condition — DEPTH-AWARE (r13):
    # an inline window's OVER (... ORDER BY ...) must not be mistaken
    # for the statement-level sort
    ob_at = None
    depth = 0
    j = 0
    while j < len(tail):
        c = tail[j]
        if c in _QUOTES:
            j = _skip_string(tail, j)
            continue
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif (
            depth == 0
            and tail[j : j + 5].upper() == "ORDER"
            and (j == 0 or not (tail[j - 1].isalnum() or tail[j - 1] == "_"))
            and re.match(r"ORDER\s+BY\b", tail[j:], re.IGNORECASE)
        ):
            ob_at = j
            break
        j += 1
    cond, suffix = (
        (tail[:ob_at], " " + tail[ob_at:]) if ob_at is not None else (tail, "")
    )
    cond = cond.strip()
    new_cond, wins = _hoist_windows(cond)
    if wins:
        proj = ", ".join(
            f"{e} AS __qual_w{i + 1}" for i, e in enumerate(wins)
        )
        aliases = ", ".join(f"__qual_w{i + 1}" for i in range(len(wins)))
        return (
            f"SELECT * EXCEPT ({aliases}) FROM "
            f"(SELECT *, {proj} FROM ({head})) "
            f"WHERE {new_cond.strip()}{suffix}"
        )
    return f"SELECT * FROM ({head}) WHERE {cond}{suffix}"


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
        if c in _QUOTES:
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
    """1-based DuckDB subscripts ``base[expr]`` → ``try_element_at(base,
    expr)`` (also correct for map access; index 0 and out-of-range give
    NULL exactly like DuckDB, even under ANSI — r12's ``element_at``
    threw on 0). Non-literal indexes get ``nullif(idx, 0)`` so index 0
    can never reach Spark's zero check; integer and string literals are
    emitted unguarded. Handles simple bases (identifiers, dotted paths,
    backtick-quoted identifiers) and parenthesized bases ``( ... )[i]``;
    leaves anything else alone."""
    out = sql
    j = 0
    while j < len(out):
        c = out[j]
        if c in _QUOTES:
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
            elif k >= 0 and out[k] == "`":
                # backtick-quoted identifier base: `my col`[i] — walk
                # back to its opening backtick (apostrophes/spaces
                # inside would defeat the word regex below)
                b = out.rfind("`", 0, k)
                base_start = b if b >= 0 else None
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
                    if re.fullmatch(r"-?\d+", idx):
                        # integer literal: 0 is statically NULL in
                        # DuckDB; others need no guard
                        guarded = "CAST(NULL AS INT)" if int(idx) == 0 else idx
                    elif idx.upper() == "NULL":
                        # bare NULL literal: nullif(NULL, 0) is VOID,
                        # which element_at's signature rejects
                        guarded = "CAST(NULL AS INT)"
                    elif re.fullmatch(r"'(?:[^']|'')*'", idx):
                        guarded = idx  # string-literal map key
                    else:
                        guarded = f"nullif({idx}, 0)"
                    repl = f"try_element_at({base}, {guarded})"
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
        if c in _QUOTES:
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


_INTERVAL_UNITS = {
    "year": "YEAR", "years": "YEAR", "month": "MONTH", "months": "MONTH",
    "week": "WEEK", "weeks": "WEEK", "day": "DAY", "days": "DAY",
    "hour": "HOUR", "hours": "HOUR", "minute": "MINUTE",
    "minutes": "MINUTE", "second": "SECOND", "seconds": "SECOND",
}


def _interval_expr(sql: str) -> str:
    """DuckDB computed intervals ``INTERVAL (expr) UNIT`` →
    ``((expr) * INTERVAL '1' UNIT)`` — Spark's INTERVAL literal syntax
    only takes literals, but interval-by-integer multiplication is
    native (r13; the c_block_range_join oracle's
    ``INTERVAL (7 * b) DAY`` parse error). Literal intervals
    (``INTERVAL '7' DAY``, ``INTERVAL 1 DAY``) have no following ``(``
    and pass through untouched."""
    out = sql
    j = 0
    pat = re.compile(r"\bINTERVAL\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(out, j)
        if not m:
            return out
        if _in_quoted(out, m.start()):
            j = m.end()
            continue
        lp = m.end() - 1
        rp = _match_paren(out, lp)
        rest = out[rp + 1 :]
        um = re.match(r"\s*([A-Za-z]+)", rest)
        unit = _INTERVAL_UNITS.get(um.group(1).lower()) if um else None
        if unit is None:
            j = m.end()
            continue
        expr = out[lp : rp + 1]
        repl = f"({expr} * INTERVAL '1' {unit})"
        end = rp + 1 + um.end()
        out = out[: m.start()] + repl + out[end:]
        j = m.start() + len(repl)


def _dquote_idents(sql: str) -> str:
    """DuckDB double quotes are ALWAYS identifiers (strings are
    single-quoted) → backticks."""
    out = []
    j = 0
    while j < len(sql):
        c = sql[j]
        if c == "'" or c == "`":
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
    # the bare list() aggregate (list(x ORDER BY y) stays untranslatable)
    ("list", "collect_list"),
    # to_days(n) builds an n-day interval
    ("to_days", "make_dt_interval"),
    ("ord", "ascii"),
]


def translate(sql: str) -> str:
    """Apply every mechanical DuckDB→Spark rewrite (module docstring)."""
    out = sql
    # comments first — they may contain quote characters that would
    # otherwise flip scan parity for every later pass (ADVICE r12)
    out = _strip_comments(out)
    # literal / operator syntax next (they may contain function calls)
    out = _dquote_idents(out)
    out = _brace_struct(out)
    out = _intdiv(out)
    out = _interval_expr(out)
    # arg-reshaping call rewrites (paren-aware)
    out = _rewrite_calls(out, "range", _range_to_sequence)
    out = _rewrite_calls(out, "generate_series", _generate_series)
    out = _rewrite_calls(out, "list_sum", _list_sum)
    out = _rewrite_calls(out, "list_slice", _list_slice)
    out = _rewrite_calls(out, "list_dot_product", _list_dot_product)
    out = _rewrite_calls(out, "isfinite", _isfinite)
    out = _rewrite_calls(out, "struct_pack", _struct_pack)
    out = _rewrite_calls(out, "regexp_extract_all", _regexp_extract_all)
    out = _rewrite_calls(out, "regexp_replace", _regexp_replace)
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
