"""Mongo-style aggregation-pipeline front end: compile a stage list (the
reference's NoSQL dialect, NoSQLQueries.js) into a DataFrame plan.

The reference's document-side users write aggregation PIPELINES — stage
dicts, not SQL. ``compile_pipeline(df, stages)`` lets those users run
their pipelines as data on this engine: each stage becomes ordinary
DataFrame operations, so the whole pipeline still flows through Catalyst
(pushdown, pruning, join/agg planning) — a thin front end, not a second
execution engine. tests/test_pipeline.py runs BOTH reference pipelines
verbatim and pins their results against the hand-ported queries.

Supported surface (the dialect the reference exercises, plus the obvious
neighbors):

  stages     $match, $group, $project (inclusion, exclusion, computed),
             $addFields/$set, $unset, $replaceRoot, $sort, $limit, $skip,
             $unwind (incl. dotted paths + preserveNullAndEmptyArrays),
             $count, $lookup, $bucket, $setWindowFields, $unionWith,
             $facet, $sortByCount, $graphLookup, $densify (numeric and
             time grids, full/partition/explicit-[lo,hi) bounds),
             $fill (value / locf; linear raises), $sample (DETERMINISTIC
             hash-rank bottom-k — see inline note on the Mongo-randomness
             divergence), terminal $merge
             (plan-level MERGE into a named collection: replace/
             keepExisting/field-merge × insert/discard) and $out
             (result IS the new collection; persistence is the
             caller's choice)
  match ops  equality, $gt $gte $lt $lte $ne $eq, $in $nin (null-aware,
             the "NA"/null screen of NoSQLQueries.js:30-33), $and $or
  accums     $sum (1 or expr), $avg, $min, $max, $push, $addToSet,
             $count ({}), $stdDevPop, $stdDevSamp,
             $first/$last (REQUIRE a preceding $sort — Mongo's $first is
             pipeline-order-defined; here it compiles to min_by/max_by
             over the sort key, so it is deterministic under ANY
             partitioning, which raw Mongo does not guarantee)
  exprs      '$path' refs (dotted), '$$var' refs (inside $filter),
             '$$ROOT' (whole-document struct — in $group accumulators,
             $addFields/$set, $replaceRoot/$replaceWith),
             literals, $and $or $not, comparison ops, $add $subtract
             $multiply $divide, $concat, $cond, $ifNull, $arrayElemAt,
             $filter, $min/$max (scalar pass-through / array fold),
             $switch, $literal, $in (array membership), $let,
             arrays: $concatArrays $slice (2- and 3-arg) $range
             (exclusive end) $indexOfArray $setUnion $setIntersection
             $setDifference, expression-dialect $first/$last (array
             element — distinct from the $group accumulators),
             strings: $toLower $toUpper $trim $split $strLenCP $substrCP,
             dates: $year $month $dayOfMonth $hour $minute $second
             $dayOfWeek $dayOfYear, $dateToString (%-format translated,
             unknown specifiers raise), $dateTrunc (binSize 1),
             $dateAdd (make_interval), $dateDiff (Mongo boundary-
             crossing counts; week requires startOfWeek:'monday'),
             math: $abs $mod $pow $sqrt $exp $ln $log10 $ceil $floor,
             $round (half-to-EVEN = Mongo, via bround), $trunc (toward 0),
             casts: $toString $toInt $toLong $toDouble $toDate $toBool
             (ANSI cast errors on malformed input, matching Mongo $toX);
             $setWindowFields range frames accept unit: second…week
             (sort key ordered as epoch seconds, bounds scaled)

Unsupported stages/operators raise NotImplementedError naming the token —
fail loudly rather than mis-execute.

Scale notes: $group with $push materializes per-group arrays (exactly
Mongo's cost); the screening pattern also exists shuffle-free as windows
(queries/reference.nosql2_security_screening) — the interpreter favors
fidelity, the native ports favor scale. $first/$last via min_by keeps
the group one hash aggregate instead of a sort.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CMP = {
    "$gt": lambda a, b: a > b,
    "$gte": lambda a, b: a >= b,
    "$lt": lambda a, b: a < b,
    "$lte": lambda a, b: a <= b,
    "$eq": lambda a, b: a.eqNullSafe(b) if isinstance(b, Column) else a == b,
    # Mongo's $ne keeps null/missing (null is just another value to compare);
    # Spark's a != b is NULL on null and would silently drop those rows.
    "$ne": lambda a, b: ~a.eqNullSafe(b if isinstance(b, Column) else F.lit(b)),
}

_ARITH = {
    "$add": lambda cols: reduce(lambda a, b: a + b, cols),
    "$subtract": lambda cols: cols[0] - cols[1],
    "$multiply": lambda cols: reduce(lambda a, b: a * b, cols),
    "$divide": lambda cols: cols[0] / cols[1],
}


def _is_op(d: object) -> bool:
    return isinstance(d, Mapping) and len(d) >= 1 and next(iter(d)).startswith("$")


def compile_expr(e: object, scope: Mapping[str, Column] | None = None) -> Column:
    """Compile a Mongo aggregation EXPRESSION to a Column. ``scope`` maps
    $filter/$map variable names to Columns."""
    scope = scope or {}
    if isinstance(e, str) and e.startswith("$$"):
        path = e[2:].split(".")
        if path[0] not in scope:
            raise NotImplementedError(f"unbound pipeline variable $${path[0]}")
        col = scope[path[0]]
        for p in path[1:]:
            col = col[p]
        return col
    if isinstance(e, str) and e.startswith("$"):
        return F.col(e[1:])
    if not isinstance(e, Mapping):
        return F.lit(e)
    # document literal (no operator keys) → struct
    if not _is_op(e):
        return F.struct(
            *[compile_expr(v, scope).alias(k) for k, v in e.items()]
        )
    op, arg = next(iter(e.items()))
    if op in _CMP:
        a, b = (compile_expr(x, scope) for x in arg)
        return _CMP[op](a, b)
    if op in _ARITH:
        return _ARITH[op]([compile_expr(x, scope) for x in arg])
    if op == "$and":
        return reduce(lambda a, b: a & b, (compile_expr(x, scope) for x in arg))
    if op == "$or":
        return reduce(lambda a, b: a | b, (compile_expr(x, scope) for x in arg))
    if op == "$not":
        inner = arg[0] if isinstance(arg, Sequence) and not isinstance(arg, str) else arg
        return ~compile_expr(inner, scope)
    if op == "$concat":
        return F.concat(*[compile_expr(x, scope) for x in arg])
    if op == "$cond":
        if isinstance(arg, Mapping):
            c, t, f_ = arg["if"], arg["then"], arg["else"]
        else:
            c, t, f_ = arg
        return F.when(compile_expr(c, scope), compile_expr(t, scope)).otherwise(
            compile_expr(f_, scope)
        )
    if op == "$ifNull":
        return F.coalesce(*[compile_expr(x, scope) for x in arg])
    if op == "$arrayElemAt":
        arr, idx = arg
        i = int(idx)
        # Mongo is 0-based; Spark element_at is 1-based (negatives align)
        return F.try_element_at(compile_expr(arr, scope), F.lit(i + 1 if i >= 0 else i))
    if op == "$filter":
        inp = compile_expr(arg["input"], scope)
        var = arg.get("as", "this")
        cond = arg["cond"]
        return F.filter(inp, lambda x: compile_expr(cond, {**scope, var: x}))
    if op == "$sortArray":
        inp = compile_expr(arg["input"], scope)
        return F.sort_array(inp, asc=arg.get("sortBy", 1) >= 0)
    if op == "$size":
        return F.size(compile_expr(arg, scope))
    if op == "$map":
        inp = compile_expr(arg["input"], scope)
        var = arg.get("as", "this")
        body = arg["in"]
        return F.transform(inp, lambda x: compile_expr(body, {**scope, var: x}))
    if op == "$reduce":
        inp = compile_expr(arg["input"], scope)
        raw_init = arg["initialValue"]
        init = compile_expr(raw_init, scope)
        if isinstance(raw_init, (int, float)) and not isinstance(raw_init, bool):
            # Mongo is dynamically typed; Spark's aggregate() demands the
            # accumulator type up front. For numeric folds, coerce the
            # literal init to the ARRAY's element type (element*0 carries
            # the type; coalesce covers the empty-array case).
            zero = F.try_element_at(inp, F.lit(1)) * F.lit(0)
            init = F.coalesce(zero + init, init)
        body = arg["in"]
        return F.aggregate(
            inp,
            init,
            lambda acc, x: compile_expr(body, {**scope, "value": acc, "this": x}),
        )
    if op in ("$min", "$max"):
        if isinstance(arg, Sequence) and not isinstance(arg, str):
            cols = [compile_expr(x, scope) for x in arg]
            return F.least(*cols) if op == "$min" else F.greatest(*cols)
        return compile_expr(arg, scope)  # single scalar: identity (Mongo)
    if op == "$let":
        bound = dict(scope)
        for name, e2 in arg["vars"].items():
            # Mongo evaluates vars against the OUTER scope (no
            # self-reference between siblings) — compile against `scope`
            bound[name] = compile_expr(e2, scope)
        return compile_expr(arg["in"], bound)
    if op == "$concatArrays":
        return F.concat(*[compile_expr(x, scope) for x in arg])
    if op == "$slice":
        if len(arg) == 2:
            arr, n = compile_expr(arg[0], scope), int(arg[1])
            # Mongo 2-arg form: first n, or LAST n when negative
            return F.slice(arr, F.lit(1), F.lit(n)) if n >= 0 else F.slice(
                arr, F.lit(n), F.lit(-n)
            )
        arr, pos, n = (compile_expr(arg[0], scope), int(arg[1]), int(arg[2]))
        # 3-arg form: 0-based position (Spark slice is 1-based)
        return F.slice(arr, F.lit(pos + 1 if pos >= 0 else pos), F.lit(n))
    if op == "$range":
        start, end = (compile_expr(x, scope) for x in arg[:2])
        step = compile_expr(arg[2], scope) if len(arg) > 2 else F.lit(1)
        # Mongo's end is EXCLUSIVE; sequence() is inclusive and only
        # lands on `end` when the step divides exactly — filter it out
        seq = F.sequence(start, end, step)
        return F.filter(seq, lambda x: x != end)
    if op == "$indexOfArray":
        arr, val = (compile_expr(x, scope) for x in arg[:2])
        # array_position is 1-based and 0 on miss → -1 on miss, Mongo's code
        return (F.array_position(arr, val) - 1).cast("int")
    if op == "$setUnion":
        return reduce(F.array_union, (compile_expr(x, scope) for x in arg))
    if op == "$setIntersection":
        return reduce(F.array_intersect, (compile_expr(x, scope) for x in arg))
    if op == "$setDifference":
        a, b = (compile_expr(x, scope) for x in arg)
        return F.array_except(a, b)
    if op in ("$first", "$last"):
        # expression dialect (Mongo 4.4+): first/last ARRAY element;
        # distinct from the $group accumulator of the same name
        return F.try_element_at(compile_expr(arg, scope), F.lit(1 if op == "$first" else -1))
    if op == "$literal":
        return F.lit(arg)
    if op == "$in":
        # expression-dialect $in: [needle, haystack-array]
        needle, hay = (compile_expr(x, scope) for x in arg)
        return F.array_contains(hay, needle)
    if op == "$switch":
        branches = arg["branches"]
        out = None
        for br in branches:
            c, t = compile_expr(br["case"], scope), compile_expr(br["then"], scope)
            out = F.when(c, t) if out is None else out.when(c, t)
        if "default" in arg:
            return out.otherwise(compile_expr(arg["default"], scope))
        # Mongo errors when no branch matches and no default — surface that
        return out.otherwise(
            F.raise_error(F.lit("$switch: no branch matched and no default"))
        )
    if op in _STRING_FNS:
        return _STRING_FNS[op](arg, scope)
    if op in _DATE_FNS:
        return _DATE_FNS[op](compile_expr(arg, scope))
    if op == "$dateToString":
        return F.date_format(
            compile_expr(arg["date"], scope), _mongo_date_format(arg["format"])
        )
    if op == "$dateFromString":
        if "format" not in arg:
            raise NotImplementedError(
                "$dateFromString requires an explicit format (Mongo's "
                "inference over mixed ISO layouts is not reproducible)"
            )
        # try_to_timestamp ≈ Mongo's onError:null when the extra key is
        # given; the default (no onError) fails loudly like Mongo.
        fn = F.try_to_timestamp if "onError" in arg else F.to_timestamp
        if arg.get("onError") is not None and "onError" in arg:
            raise NotImplementedError("$dateFromString onError supports only null")
        return fn(
            compile_expr(arg["dateString"], scope),
            F.lit(_mongo_date_format(arg["format"])),
        )
    if op == "$regexMatch":
        pat = arg["regex"]
        opts = arg.get("options", "")
        if any(o not in "i" for o in opts):
            raise NotImplementedError(f"$regexMatch options {opts!r} (only 'i')")
        if "i" in opts:
            pat = "(?i)" + pat
        # Mongo regexMatch is a FIND; null input → false (not null)
        return F.coalesce(compile_expr(arg["input"], scope).rlike(pat), F.lit(False))
    if op == "$dateTrunc":
        unit = arg["unit"]
        if unit not in _TRUNC_UNITS:
            raise NotImplementedError(f"$dateTrunc unit {unit!r}")
        if arg.get("binSize", 1) != 1:
            raise NotImplementedError("$dateTrunc binSize != 1")
        return F.date_trunc(unit, compile_expr(arg["date"], scope))
    if op == "$dateAdd":
        unit = arg["unit"]
        amount = compile_expr(arg["amount"], scope).cast("int")
        start = compile_expr(arg["startDate"], scope)
        zero = F.lit(0)
        slots = {
            "year": 0, "month": 1, "week": 2, "day": 3,
            "hour": 4, "minute": 5, "second": 6,
        }
        if unit not in slots:
            raise NotImplementedError(f"$dateAdd unit {unit!r}")
        args = [zero] * 7
        args[slots[unit]] = amount
        return start + F.make_interval(*args)
    if op == "$dateDiff":
        # Mongo counts UNIT BOUNDARIES CROSSED (calendar semantics), not
        # whole elapsed intervals — e.g. 23:59 → 00:01 is day diff 1.
        unit = arg["unit"]
        if unit == "week" and arg.get("startOfWeek", "sunday").lower() != "monday":
            # Mongo's default week start is SUNDAY; Spark's week
            # truncation is ISO (Monday). Only an explicit
            # startOfWeek:'monday' has identical boundary semantics —
            # anything else would silently count different weeks.
            raise NotImplementedError(
                "$dateDiff week requires explicit startOfWeek:'monday' "
                "(Spark weeks are ISO; Mongo's default Sunday start is unsupported)"
            )
        s = compile_expr(arg["startDate"], scope)
        e_ = compile_expr(arg["endDate"], scope)
        if unit in ("second", "minute", "hour", "day", "week"):
            secs = _TIME_UNIT_SECONDS[unit]
            ts = F.unix_timestamp(F.date_trunc(unit, s))
            te = F.unix_timestamp(F.date_trunc(unit, e_))
            return ((te - ts) / F.lit(secs)).cast("long")
        if unit == "month":
            return (
                (F.year(e_) - F.year(s)) * 12 + (F.month(e_) - F.month(s))
            ).cast("long")
        if unit == "quarter":
            return (
                (F.year(e_) - F.year(s)) * 4 + (F.quarter(e_) - F.quarter(s))
            ).cast("long")
        if unit == "year":
            return (F.year(e_) - F.year(s)).cast("long")
        raise NotImplementedError(f"$dateDiff unit {unit!r}")
    if op in _MATH_FNS:
        return _MATH_FNS[op](compile_expr(arg, scope))
    if op in ("$mod", "$pow"):
        a, b = (compile_expr(x, scope) for x in arg)
        return a % b if op == "$mod" else F.pow(a, b)
    if op in ("$round", "$trunc"):
        if isinstance(arg, Sequence) and not isinstance(arg, str):
            x = compile_expr(arg[0], scope)
            place = int(arg[1]) if len(arg) > 1 else 0
        else:
            x, place = compile_expr(arg, scope), 0
        if op == "$round":
            # Mongo rounds half-to-EVEN; Spark's bround is exactly that
            # (F.round is half-up and would silently diverge on .5 ties)
            return F.bround(x, place)
        # numeric truncation toward zero at `place` decimal digits:
        # scale, cast-to-long (truncates toward zero), unscale
        p = F.lit(float(10**place))
        return (x * p).cast("long") / p
    if op in _CONVERT:
        return compile_expr(arg, scope).cast(_CONVERT[op])
    raise NotImplementedError(f"expression operator {op!r}")


def _mongo_date_format(fmt: str) -> str:
    """Translate a Mongo $dateToString %-format to a Spark datetime
    pattern; unknown % specifiers raise (fail loudly, never mis-format)."""
    table = {
        "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
        "%S": "ss", "%j": "DDD", "%L": "SSS", "%%": "%",
    }
    out: list[str] = []
    i = 0
    literal: list[str] = []

    def flush() -> None:
        if literal:
            out.append("'" + "".join(literal).replace("'", "''") + "'")
            literal.clear()

    while i < len(fmt):
        ch = fmt[i]
        if ch == "%":
            tok = fmt[i : i + 2]
            if tok not in table:
                raise NotImplementedError(f"$dateToString specifier {tok!r}")
            flush()
            out.append(table[tok])
            i += 2
        else:
            literal.append(ch)
            i += 1
    flush()
    return "".join(out)


def _substr_cp(arg, scope) -> Column:
    s, start, length = (compile_expr(x, scope) for x in arg)
    # Mongo is 0-based; Spark substring is 1-based (both codepoint-based)
    return F.substring(s, start + F.lit(1), length)


def _trim(arg, scope) -> Column:
    inp = compile_expr(arg["input"], scope)
    if "chars" in arg:
        return F.btrim(inp, compile_expr(arg["chars"], scope))
    return F.trim(inp)


_STRING_FNS = {
    "$toLower": lambda a, s: F.lower(compile_expr(a, s)),
    "$toUpper": lambda a, s: F.upper(compile_expr(a, s)),
    "$strLenCP": lambda a, s: F.length(compile_expr(a, s)),
    "$split": lambda a, s: F.split(
        compile_expr(a[0], s), _literal_regex_escape(a[1]), -1
    ),
    "$substrCP": _substr_cp,
    "$trim": _trim,
}


def _literal_regex_escape(delim: object) -> str:
    # Mongo $split takes a LITERAL delimiter; Spark split takes a regex.
    import re

    if not isinstance(delim, str):
        raise NotImplementedError("$split delimiter must be a string literal")
    return re.escape(delim)


# Mongo $dayOfWeek is 1 (Sunday) … 7 (Saturday) — Spark dayofweek matches.
_DATE_FNS = {
    "$year": F.year,
    "$month": F.month,
    "$dayOfMonth": F.dayofmonth,
    "$hour": F.hour,
    "$minute": F.minute,
    "$second": F.second,
    "$dayOfWeek": F.dayofweek,
    "$dayOfYear": F.dayofyear,
}

_MATH_FNS = {
    "$abs": F.abs,
    "$ceil": F.ceil,
    "$floor": F.floor,
    "$sqrt": F.sqrt,
    "$exp": F.exp,
    "$ln": F.log,
    "$log10": F.log10,
}

# Mongo $toX conversions error on malformed input — so does ANSI cast.
_CONVERT = {
    "$toString": "string",
    "$toInt": "int",
    "$toLong": "long",
    "$toDouble": "double",
    "$toDate": "timestamp",
    "$toBool": "boolean",
}


def _match_predicate(query: Mapping) -> Column:
    """Compile a $match QUERY document (predicate dialect, distinct from
    the expression dialect) to a boolean Column."""
    conjuncts: list[Column] = []
    for field, spec in query.items():
        if field == "$and":
            conjuncts.append(reduce(lambda a, b: a & b, (_match_predicate(q) for q in spec)))
            continue
        if field == "$or":
            conjuncts.append(reduce(lambda a, b: a | b, (_match_predicate(q) for q in spec)))
            continue
        if field == "$expr":
            # expression-dialect escape hatch inside $match
            conjuncts.append(compile_expr(spec))
            continue
        col = F.col(field)
        if not isinstance(spec, Mapping):
            # bare equality routes through $eq so it shares the null-safety
            # and type-bracketing logic ({f: null} matches null/missing)
            spec = {"$eq": spec}
        for op, val in spec.items():
            if op == "$options":
                continue  # consumed together with the sibling $regex below
            if op == "$regex":
                pat = str(val)
                opts = spec.get("$options", "")
                if any(o not in "i" for o in opts):
                    raise NotImplementedError(f"$options {opts!r} (only 'i' supported)")
                if "i" in opts:
                    pat = "(?i)" + pat
                # Mongo $regex is a FIND (substring) match, as is rlike;
                # null/missing fields don't match (rlike NULL → row dropped)
                conjuncts.append(col.rlike(pat))
            elif op == "$exists":
                # relational mapping: missing ≡ null
                conjuncts.append(col.isNotNull() if val else col.isNull())
            elif op == "$mod":
                d, r = val
                # type-bracketed like the numeric comparisons: non-numeric
                # strings try_cast to NULL and never match
                conjuncts.append(col.try_cast("bigint") % F.lit(int(d)) == F.lit(int(r)))
            elif op == "$not":
                inner = _match_predicate({field: val})
                # Mongo $not matches when the inner predicate does NOT,
                # INCLUDING null/missing fields (where the inner predicate
                # evaluates to NULL, not false)
                conjuncts.append(~F.coalesce(inner, F.lit(False)))
            elif op in _CMP:
                lhs = col
                if isinstance(val, (int, float)) and not isinstance(val, bool):
                    # Mongo comparisons TYPE-BRACKET: a numeric $gt never
                    # matches strings/null. try_cast reproduces that (NULL
                    # never compares true) where ANSI cast would throw on
                    # the reference's "NA" sentinels (NoSQLQueries.js:30).
                    # $ne composes correctly because _CMP compiles it
                    # null-SAFELY: a doc holding "NA" try_casts to NULL,
                    # eqNullSafe(NULL, 5) is false, so ~ keeps the doc —
                    # exactly Mongo, which keeps differently-typed values.
                    lhs = col.try_cast("double")
                conjuncts.append(_CMP[op](lhs, F.lit(val)))
            elif op == "$in":
                vals = [v for v in val if v is not None]
                c = col.isin(vals)
                if any(v is None for v in val):
                    c = c | col.isNull()
                conjuncts.append(c)
            elif op == "$nin":
                # excludes listed values AND (with null listed) missing/null
                vals = [v for v in val if v is not None]
                c = ~col.isin(vals) if vals else F.lit(True)
                if any(v is None for v in val):
                    c = c & col.isNotNull()
                else:
                    # Mongo keeps docs where the field is null/missing iff
                    # null is not in the list; Spark's ~isin is NULL on null
                    c = c | col.isNull()
                conjuncts.append(c)
            else:
                raise NotImplementedError(f"$match operator {op!r}")
    return reduce(lambda a, b: a & b, conjuncts) if conjuncts else F.lit(True)


_PLAIN_ACCUM = {"$sum", "$avg", "$min", "$max", "$push", "$addToSet"}


def _sort_key_is_numeric(df: DataFrame, path: str) -> bool:
    from pyspark.sql.types import NumericType

    try:
        dtype = df.select(F.col(path).alias("__k")).schema[0].dataType
    except Exception:  # unresolvable path: let the real plan raise later
        return False
    return isinstance(dtype, NumericType)


def _compile_group(df: DataFrame, spec: Mapping, sort_keys: list[tuple[str, int]] | None) -> DataFrame:
    """$group. The group key is computed into a reserved __gid column and
    accumulators are compiled against the UNMODIFIED frame, then __gid is
    renamed to _id after the agg — so ``{$group: {_id: '$x', ids: {$push:
    '$_id'}}}`` pushes the document's original _id, not the new key.

    $first/$last compile to min_by/max_by over the preceding $sort's keys
    (one hash aggregate, no sort). A DESCENDING key is handled by negation
    only when it is numeric; for any other dtype (string/date/...) the
    compiler falls back to a row_number() window in sort order and takes
    min_by/max_by over the row number — direction-correct for every dtype
    instead of silently ordering by NULL."""
    gid = spec["_id"]
    # $$ROOT = the document as it entered this stage (before the __gid /
    # __rn helper columns exist) — the ubiquitous {$push: '$$ROOT'} idiom
    root_scope = {"ROOT": F.struct(*[F.col(c) for c in df.columns])}
    out = df
    if gid is None:
        out = out.withColumn("__gid", F.lit(None).cast("string"))
    else:
        out = out.withColumn("__gid", compile_expr(gid, root_scope))

    first_last = [
        (name, next(iter(accum.items())))
        for name, accum in spec.items()
        if name != "_id" and next(iter(accum)) in ("$first", "$last")
    ]
    use_window = False
    if first_last:
        if not sort_keys:
            raise NotImplementedError(
                "$first/$last requires a preceding $sort (pipeline order is undefined otherwise)"
            )
        any_first = any(op == "$first" for _, (op, _a) in first_last)
        any_last = any(op == "$last" for _, (op, _a) in first_last)
        for path, direction in sort_keys:
            needs_reversal = (direction < 0 and any_first) or (direction > 0 and any_last)
            if needs_reversal and not _sort_key_is_numeric(out, path):
                use_window = True
                break
    if use_window:
        from pyspark.sql import Window

        w = Window.partitionBy("__gid").orderBy(
            *[F.col(p).desc() if d < 0 else F.col(p).asc() for p, d in sort_keys]
        )
        out = out.withColumn("__rn", F.row_number().over(w))

    aggs = []
    for name, accum in spec.items():
        if name == "_id":
            continue
        op, arg = next(iter(accum.items()))
        if op == "$sum":
            aggs.append(
                (F.count(F.lit(1)) if arg == 1 else F.sum(compile_expr(arg, root_scope))).alias(name)
            )
        elif op == "$avg":
            aggs.append(F.avg(compile_expr(arg, root_scope)).alias(name))
        elif op == "$min":
            aggs.append(F.min(compile_expr(arg, root_scope)).alias(name))
        elif op == "$max":
            aggs.append(F.max(compile_expr(arg, root_scope)).alias(name))
        elif op == "$push":
            aggs.append(F.collect_list(compile_expr(arg, root_scope)).alias(name))
        elif op == "$addToSet":
            aggs.append(F.collect_set(compile_expr(arg, root_scope)).alias(name))
        elif op == "$count":
            # Mongo 5's {$count: {}} accumulator — counts documents
            aggs.append(F.count(F.lit(1)).alias(name))
        elif op == "$stdDevPop":
            aggs.append(F.stddev_pop(compile_expr(arg, root_scope)).alias(name))
        elif op == "$stdDevSamp":
            aggs.append(F.stddev_samp(compile_expr(arg, root_scope)).alias(name))
        elif op in ("$first", "$last"):
            if use_window:
                picker = F.min_by if op == "$first" else F.max_by
                aggs.append(picker(compile_expr(arg, root_scope), F.col("__rn")).alias(name))
                continue
            ords = []
            for path, direction in sort_keys:
                c = F.col(path)
                want_desc = (direction < 0) if op == "$first" else (direction > 0)
                if want_desc:
                    # min_by has no per-key direction; negate (numeric-only —
                    # the window fallback above covers every other dtype)
                    c = -c
                ords.append(c)
            aggs.append(F.min_by(compile_expr(arg, root_scope), F.struct(*ords)).alias(name))
        else:
            raise NotImplementedError(f"accumulator {op!r}")
    if not aggs:
        # {$group: {_id: ...}} with no accumulators is Mongo's DISTINCT
        return out.select(F.col("__gid").alias("_id")).distinct()
    return out.groupBy("__gid").agg(*aggs).withColumnRenamed("__gid", "_id")


def _compile_project(df: DataFrame, spec: Mapping) -> DataFrame:
    non_id = {k: v for k, v in spec.items() if k != "_id"}
    if non_id and all(v == 0 for v in non_id.values()):
        # EXCLUSION projection ({secret: 0, ...}): keep everything except
        # the listed fields — Mongo's other projection mode. Nested paths
        # drop struct fields in place (Column.dropFields).
        out = df
        for name in non_id:
            if "." in name:
                top, rest = name.split(".", 1)
                out = out.withColumn(top, F.col(top).dropFields(rest))
            else:
                out = out.drop(name)
        if spec.get("_id", 1) == 0:
            out = out.drop("_id")
        return out
    bad = [k for k, v in non_id.items() if v == 0]
    if bad:
        # Mongo rejects mixing inclusion and exclusion (except _id: 0)
        raise ValueError(f"$project cannot mix inclusion with exclusion of {bad}")
    if not non_id and spec.get("_id", 1) == 0:
        return df.drop("_id")
    cols: list[Column] = []
    nested: dict[str, object] = {}  # path tree: str → Column leaf | sub-dict
    explicit_id = "_id" in spec
    for name, v in spec.items():
        if v == 0:
            continue  # exclusion of _id within an inclusion projection
        expr = F.col(name) if v == 1 else compile_expr(v)
        if "." in name:
            *parents, leaf = name.split(".")
            node = nested
            for p in parents:
                node = node.setdefault(p, {})
                if not isinstance(node, dict):
                    raise ValueError(f"$project path conflict at {p!r} in {name!r}")
            node[leaf] = expr
            continue
        cols.append(expr.alias(name) if v != 1 else expr)

    def _build(node: dict) -> list[Column]:
        return [
            (F.struct(*_build(v)) if isinstance(v, dict) else v).alias(k)
            for k, v in node.items()
        ]

    cols.extend(_build(nested))
    if not explicit_id and "_id" in df.columns:
        cols.insert(0, F.col("_id"))  # Mongo includes _id unless excluded
    return df.select(*cols)


def _compile_lookup(out: DataFrame, spec: Mapping, collections: Mapping[str, DataFrame]) -> DataFrame:
    """$lookup — Mongo's left-outer join: attach, to every document, an
    ARRAY of the matching foreign documents. Compiled as: pre-aggregate
    the foreign side per join key (collect_list of its struct — map-side
    combinable), then ONE equi join; unmatched rows get []. The foreign
    side aggregates BEFORE the join, so a hot key costs one big array,
    never a row explosion; the usual Mongo idiom $lookup+$unwind then
    restores plain join rows and Catalyst sees an ordinary join plan."""
    from_name = spec["from"]
    if from_name not in collections:
        raise NotImplementedError(
            f"$lookup from unknown collection {from_name!r}; pass it via collections="
        )
    foreign = collections[from_name]
    local, foreign_field, as_name = spec["localField"], spec["foreignField"], spec["as"]
    fstruct = F.struct(*[F.col(c) for c in foreign.columns])
    grouped = foreign.groupBy(F.col(foreign_field).alias("__lk")).agg(
        F.collect_list(fstruct).alias(as_name)
    )
    joined = out.join(grouped, F.col(local) == F.col("__lk"), "left").drop("__lk")
    empty = F.array().cast(joined.schema[as_name].dataType.simpleString())
    return joined.withColumn(as_name, F.coalesce(F.col(as_name), empty))


def _compile_bucket(out: DataFrame, spec: Mapping, sort_keys) -> DataFrame:
    """$bucket — histogram stage: assign each document to the half-open
    interval [b_i, b_{i+1}) of explicit ``boundaries``, then run the
    ``output`` accumulators per bucket (default: count). Out-of-range
    documents go to ``default`` if given, else ERROR (Mongo semantics).
    Compiles to one searched CASE + the ordinary $group path — a single
    hash aggregate, the same plan as the native histogram operator
    (f10). Mongo's heterogeneous bucket ids (numeric boundaries + an
    arbitrary default) don't fit one typed column: with a ``default``
    the _id column is STRING (stringified boundaries), without one it
    stays the boundaries' numeric type."""
    group_by = compile_expr(spec["groupBy"])
    bounds = spec["boundaries"]
    as_str = "default" in spec
    bucket = None
    for lo, hi in zip(bounds, bounds[1:]):
        cond = (group_by >= F.lit(lo)) & (group_by < F.lit(hi))
        tag = F.lit(str(lo) if as_str else lo)
        bucket = F.when(cond, tag) if bucket is None else bucket.when(cond, tag)
    if as_str:
        bucket = bucket.otherwise(F.lit(str(spec["default"])))
    else:
        bucket = bucket.otherwise(
            F.raise_error(F.lit("$bucket: document outside boundaries and no default"))
        )
    out = out.withColumn("__bucket", bucket)
    group_spec = {"_id": "$__bucket", **spec.get("output", {"count": {"$sum": 1}})}
    return _compile_group(out, group_spec, sort_keys)


_TIME_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}

_TRUNC_UNITS = {"second", "minute", "hour", "day", "week", "month", "quarter", "year"}


def _compile_bucket_auto(out: DataFrame, spec: Mapping, sort_keys) -> DataFrame:
    """$bucketAuto — equal-FREQUENCY bucketing: distribute documents into
    ``buckets`` groups of ~equal population and report each bucket's
    [min, max] boundary struct as _id, plus the ``output`` accumulators.
    Compiled as ntile() over the groupBy expression, then one hash
    aggregate. The ntile window is a GLOBAL sort — the same full-order
    pass Mongo performs for this stage; for a scale-safe approximation
    use f16_quantile_binning (broadcast exact-percentile boundaries)
    instead. ``granularity`` (rounded boundary series) is unsupported
    and raises."""
    if "granularity" in spec:
        raise NotImplementedError("$bucketAuto granularity")
    from pyspark.sql import Window

    gb = compile_expr(spec["groupBy"])
    n = int(spec["buckets"])
    out = out.withColumn("__bav", gb).withColumn(
        "__bkt", F.ntile(n).over(Window.orderBy(F.col("__bav")))
    )
    group_spec = {"_id": "$__bkt", **spec.get("output", {"count": {"$sum": 1}})}
    agged = _compile_group(
        out,
        {**group_spec, "__min": {"$min": "$__bav"}, "__max": {"$max": "$__bav"}},
        sort_keys,
    )
    # Mongo chains the boundaries: each bucket's max IS the next bucket's
    # min; only the last bucket closes at its own max. The post-agg frame
    # is n buckets — the fix-up window is trivial.
    wb = Window.orderBy(F.col("_id"))
    return (
        agged.withColumn("__hi", F.coalesce(F.lead("__min").over(wb), F.col("__max")))
        .withColumn("_id", F.struct(F.col("__min").alias("min"), F.col("__hi").alias("max")))
        .drop("__min", "__max", "__hi")
    )


def _window_bound(b: object, upper: bool = False) -> int:
    from pyspark.sql import Window

    if b == "unbounded":
        return Window.unboundedFollowing if upper else Window.unboundedPreceding
    if b == "current":
        return Window.currentRow
    return int(b)  # type: ignore[arg-type]


def _compile_set_window_fields(out: DataFrame, spec: Mapping) -> DataFrame:
    """$setWindowFields — Mongo's window-function stage, compiled straight
    onto Spark's Window API (one exchange on partitionBy + an in-partition
    sort, exactly the native window plan). Supported output operators:
    $rank, $denseRank, $documentNumber, $shift (lead/lag), and
    $sum/$avg/$min/$max/$count with an optional ``window.documents``
    frame ([lo, hi] of "unbounded"/"current"/int). Mongo's default frame
    when ``window`` is omitted is the WHOLE partition — note this differs
    from SQL's default-to-current-row when an ORDER BY is present."""
    from pyspark.sql import Window

    w = Window.partitionBy(
        *([compile_expr(spec["partitionBy"])] if "partitionBy" in spec else [])
    )
    sort_by = spec.get("sortBy")
    if sort_by:
        w_sorted = w.orderBy(
            *[F.col(k).desc() if d < 0 else F.col(k).asc() for k, d in sort_by.items()]
        )
    for name, odef in spec["output"].items():
        op = next(k for k in odef if k.startswith("$"))
        arg = odef[op]
        if op in ("$rank", "$denseRank", "$documentNumber"):
            if not sort_by:
                raise NotImplementedError(f"{op} requires sortBy")
            fn = {"$rank": F.rank, "$denseRank": F.dense_rank, "$documentNumber": F.row_number}[op]
            out = out.withColumn(name, fn().over(w_sorted))
        elif op == "$shift":
            if not sort_by:
                raise NotImplementedError("$shift requires sortBy")
            by = int(arg.get("by", 1))
            default = F.lit(arg.get("default", None))
            val = compile_expr(arg["output"])
            shifted = F.lead(val, by, None) if by >= 0 else F.lag(val, -by, None)
            out = out.withColumn(name, F.coalesce(shifted.over(w_sorted), default))
        elif op in ("$sum", "$avg", "$min", "$max", "$count", "$first", "$last"):
            if op in ("$first", "$last") and not sort_by:
                raise NotImplementedError(f"windowed {op} requires sortBy")
            agg = {
                "$sum": F.sum, "$avg": F.avg, "$min": F.min, "$max": F.max,
                "$count": lambda c: F.count(F.lit(1)),
                # frame-positional first/last in sortBy order (Mongo:
                # first/last document of the window)
                "$first": lambda c: F.first(c, ignorenulls=False),
                "$last": lambda c: F.last(c, ignorenulls=False),
            }[op](compile_expr(arg) if op != "$count" else F.lit(1))
            frame = odef.get("window", {})
            if "range" in frame:
                if not sort_by or len(sort_by) != 1:
                    raise NotImplementedError(
                        "range window requires exactly one sortBy key"
                    )
                lo, hi = frame["range"]
                if "unit" in frame:
                    # time-unit range ([-7, 0] unit:'day'): order by the
                    # sort key as epoch SECONDS and scale the bounds —
                    # rangeBetween then spans exactly the unit interval.
                    unit_s = _TIME_UNIT_SECONDS.get(frame["unit"])
                    if unit_s is None:
                        raise NotImplementedError(
                            f"$setWindowFields range unit {frame['unit']!r}"
                        )
                    (key, direction), = sort_by.items()
                    if direction < 0:
                        raise NotImplementedError(
                            "time-range window with descending sortBy"
                        )
                    w_time = w.orderBy(F.unix_timestamp(F.col(key)).cast("long"))
                    scale = lambda b, up: (  # noqa: E731
                        _window_bound(b, up)
                        if b in ("unbounded", "current")
                        else int(b) * unit_s
                    )
                    out = out.withColumn(
                        name,
                        agg.over(w_time.rangeBetween(scale(lo, False), scale(hi, True))),
                    )
                    continue
                out = out.withColumn(
                    name,
                    agg.over(
                        w_sorted.rangeBetween(_window_bound(lo), _window_bound(hi, upper=True))
                    ),
                )
            elif "documents" in frame:
                if not sort_by:
                    raise NotImplementedError("documents window requires sortBy")
                lo, hi = frame["documents"]
                out = out.withColumn(
                    name,
                    agg.over(w_sorted.rowsBetween(_window_bound(lo), _window_bound(hi, upper=True))),
                )
            elif op in ("$first", "$last"):
                # no explicit frame: whole partition, but the value is
                # positional so the frame MUST carry the sortBy order —
                # first/last over the unsorted window would be arbitrary
                out = out.withColumn(
                    name,
                    agg.over(
                        w_sorted.rowsBetween(
                            Window.unboundedPreceding, Window.unboundedFollowing
                        )
                    ),
                )
            else:
                # Mongo: no window → the ENTIRE partition, sorted or not
                out = out.withColumn(name, agg.over(w))
        else:
            raise NotImplementedError(f"$setWindowFields operator {op!r}")
    return out


def _compile_graph_lookup(out: DataFrame, spec: Mapping, collections: Mapping[str, DataFrame]) -> DataFrame:
    """$graphLookup — Mongo's recursive traversal: per document, BFS over
    the ``from`` collection (startWith value probes connectToField; each
    matched doc's connectFromField feeds the next frontier) until
    fixpoint or ``maxDepth``; matches land in ``as`` (optionally tagged
    with ``depthField`` = first-match depth).

    Compiled level-synchronously over ALL documents at once — the same
    iterative-join discipline as operators/graph.bfs_levels: traversal
    state is (root, probe-value) pairs, one keyed shuffle per round,
    localCheckpoint truncating lineage between rounds, already-probed
    values anti-joined out so cycles terminate. The closure is computed
    once per DISTINCT start value and joined back, so a million documents
    sharing 100 start values pay for 100 traversals. Scalar
    connectFrom/To fields only (array-valued connectors raise)."""
    from_name = spec["from"]
    if from_name not in collections:
        raise NotImplementedError(
            f"$graphLookup from unknown collection {from_name!r}; pass it via collections="
        )
    from pyspark.sql import Window

    foreign = collections[from_name]
    start = compile_expr(spec["startWith"])
    cf, ct, as_name = spec["connectFromField"], spec["connectToField"], spec["as"]
    for fld in (cf, ct):
        if foreign.schema[fld].dataType.typeName() == "array":
            raise NotImplementedError("$graphLookup array-valued connect fields")
    depth_field = spec.get("depthField")
    max_depth = spec.get("maxDepth")
    rounds = int(max_depth) + 1 if max_depth is not None else 100  # loud cap below

    fstruct = F.struct(*[F.col(c) for c in foreign.columns])
    roots = (
        out.select(start.alias("__gl_root"))
        .where(F.col("__gl_root").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    frontier = roots.select("__gl_root", F.col("__gl_root").alias("__gl_val"))
    seen = frontier.localCheckpoint(eager=False)
    matched: DataFrame | None = None
    for depth in range(rounds):
        hits = (
            foreign.join(frontier, foreign[ct] == frontier["__gl_val"])
            .select(
                "__gl_root",
                fstruct.alias("__gl_doc"),
                foreign[cf].alias("__gl_next"),
                F.lit(depth).alias("__gl_depth"),
            )
            .dropDuplicates(["__gl_root", "__gl_doc"])
            .localCheckpoint()  # eager: truncate before the next round
        )
        if hits.isEmpty():
            break
        matched = hits if matched is None else matched.unionByName(hits)
        # a doc matched in an earlier round keeps its first-match depth
        matched = (
            matched.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("__gl_root", "__gl_doc").orderBy("__gl_depth")
                ),
            )
            .where(F.col("__rn") == 1)
            .drop("__rn")
            .localCheckpoint(eager=False)
        )
        nxt = hits.select("__gl_root", F.col("__gl_next").alias("__gl_val")).distinct()
        frontier = nxt.join(seen, ["__gl_root", "__gl_val"], "left_anti").localCheckpoint()
        if frontier.isEmpty():
            break
        seen = seen.unionByName(frontier).localCheckpoint(eager=False)
    else:
        if max_depth is None:
            raise ValueError("$graphLookup did not converge within 100 rounds; set maxDepth")

    if matched is None:
        return out.withColumn(
            as_name, F.array().cast(f"array<{foreign.schema.simpleString()}>")
        )
    doc = F.col("__gl_doc")
    if depth_field:
        doc = doc.withField(depth_field, F.col("__gl_depth").cast("long"))
    per_root = matched.groupBy("__gl_root").agg(F.collect_list(doc).alias(as_name))
    joined = out.join(per_root, start == F.col("__gl_root"), "left").drop("__gl_root")
    empty = F.array().cast(joined.schema[as_name].dataType.simpleString())
    return joined.withColumn(as_name, F.coalesce(F.col(as_name), empty))


def _compile_densify(out: DataFrame, spec: Mapping) -> DataFrame:
    """$densify — add documents at every ``step`` of ``field`` that the
    data skips, per partition. New documents carry ONLY the field and the
    partition fields (everything else NULL), exactly Mongo: existing
    off-step documents stay untouched; on-step values already present are
    not duplicated (anti-join). Numeric steps use sequence(lo, hi, step);
    time steps use an INTERVAL step over the same bounds. bounds:
    "full" (corpus min..max), "partition" (per-partition min..max), or
    [lo, hi) — Mongo's explicit bounds are EXCLUSIVE of the upper end.

    Scale shape: the grid is one sequence-explode over the (small)
    per-partition bounds frame; the anti-join and union are keyed by
    (partition, field). The dense grid size is bounds/step per partition
    — the same cost Mongo pays, chosen by the caller."""
    field = spec["field"]
    rng = spec["range"]
    parts = list(spec.get("partitionByFields", []))
    step, unit, bounds = rng["step"], rng.get("unit"), rng.get("bounds", "full")
    if unit is not None:
        if unit not in _TIME_UNIT_SECONDS and unit not in ("month", "quarter", "year"):
            raise NotImplementedError(f"$densify unit {unit!r}")
        step_expr = F.expr(f"INTERVAL {int(step)} {unit}")
    else:
        step_expr = F.lit(step)
    explicit = not isinstance(bounds, str)
    if explicit:
        lo, hi = (compile_expr({"$literal": b}) for b in bounds)
        keys = out.select(*parts).distinct() if parts else out.limit(1).select(F.lit(1).alias("__k")).drop("__k")
        base = keys.withColumn("__lo", lo).withColumn("__hi", hi)
    elif bounds == "full":
        mm = out.agg(F.min(field).alias("__lo"), F.max(field).alias("__hi"))
        base = out.select(*parts).distinct().crossJoin(F.broadcast(mm)) if parts else mm
    elif bounds == "partition":
        if not parts:
            raise ValueError("$densify bounds:'partition' requires partitionByFields")
        base = out.groupBy(*parts).agg(F.min(field).alias("__lo"), F.max(field).alias("__hi"))
    else:
        raise NotImplementedError(f"$densify bounds {bounds!r}")
    grid = base.select(
        *parts,
        F.col("__hi"),
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step_expr)).alias(field),
    )
    # Mongo's explicit [lo, hi) bounds exclude the upper end; sequence()
    # is inclusive, so trim. Range-derived bounds keep the inclusive max.
    grid = (grid.where(F.col(field) < F.col("__hi")) if explicit else grid).drop("__hi")
    new_rows = grid.join(out.select(*parts, field).distinct(), [*parts, field], "left_anti")
    return out.unionByName(new_rows, allowMissingColumns=True)


def _compile_fill(out: DataFrame, spec: Mapping) -> DataFrame:
    """$fill — fill null/missing values: ``{value: expr}`` substitutes a
    constant/expression; ``{method: 'locf'}`` carries the last observed
    value forward in ``sortBy`` order within the partition (one window,
    last(ignorenulls), running frame — a single exchange serves every
    locf output). ``method:'linear'`` raises (use the native
    ev_resample_interp operator for interpolation)."""
    from pyspark.sql import Window

    parts = spec.get("partitionBy")
    part_cols = (
        [compile_expr(parts)] if isinstance(parts, str)
        else [F.col(c) for c in spec.get("partitionByFields", [])]
    )
    needs_locf = any(o.get("method") == "locf" for o in spec["output"].values())
    w = None
    if needs_locf:
        sort_by = spec.get("sortBy")
        if not sort_by:
            raise NotImplementedError("$fill method:'locf' requires sortBy")
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(*[F.col(k).desc() if d < 0 else F.col(k).asc() for k, d in sort_by.items()])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    for fld, how in spec["output"].items():
        if "value" in how:
            out = out.withColumn(fld, F.coalesce(F.col(fld), compile_expr(how["value"])))
        elif how.get("method") == "locf":
            out = out.withColumn(fld, F.last(fld, ignorenulls=True).over(w))
        else:
            raise NotImplementedError(f"$fill method {how!r}")
    return out


def _compile_facet(out: DataFrame, spec: Mapping, collections: Mapping[str, DataFrame]) -> DataFrame:
    """$facet — run each sub-pipeline on the same input; the result is ONE
    document whose fields hold each facet's full output as an array of
    structs. Each facet collapses to a single row (collect_list), then the
    1-row frames cross-join — trivially cheap joins, but each array is a
    whole facet result materialized on one row, exactly Mongo's semantics
    (and its 16 MB document limit is the same warning sign: use $facet for
    summaries, not bulk data)."""
    facets: list[DataFrame] = []
    for name, sub in spec.items():
        sub_df = compile_pipeline(out, sub, collections)
        fstruct = F.struct(*[F.col(c) for c in sub_df.columns])
        facets.append(sub_df.agg(F.collect_list(fstruct).alias(name)))
    return reduce(lambda a, b: a.crossJoin(b), facets)


def compile_pipeline(
    df: DataFrame,
    stages: Sequence[Mapping],
    collections: Mapping[str, DataFrame] | None = None,
) -> DataFrame:
    """Compile a Mongo aggregation pipeline (list of stage dicts) against
    ``df`` (one row per document). ``collections`` names the frames
    $lookup may join against. Returns the resulting DataFrame plan —
    nothing executes until an action, exactly like any other query here."""
    out = df
    collections = collections or {}
    last_sort: list[tuple[str, int]] | None = None
    for stage in stages:
        if len(stage) != 1:
            raise ValueError(f"each stage must have exactly one operator: {list(stage)}")
        op, spec = next(iter(stage.items()))
        if op == "$match":
            out = out.where(_match_predicate(spec))
        elif op == "$group":
            out = _compile_group(out, spec, last_sort)
        elif op == "$project":
            out = _compile_project(out, spec)
        elif op in ("$addFields", "$set"):
            for name, e in spec.items():
                scope = {"ROOT": F.struct(*[F.col(c) for c in out.columns])}
                out = out.withColumn(name, compile_expr(e, scope))
        elif op == "$unset":
            fields = [spec] if isinstance(spec, str) else list(spec)
            out = out.drop(*fields)
        elif op in ("$replaceRoot", "$replaceWith"):
            new_root = spec["newRoot"] if op == "$replaceRoot" else spec
            scope = {"ROOT": F.struct(*[F.col(c) for c in out.columns])}
            root = compile_expr(new_root, scope)
            out = out.select(root.alias("__root")).select("__root.*")
        elif op == "$lookup":
            out = _compile_lookup(out, spec, collections)
        elif op == "$bucket":
            out = _compile_bucket(out, spec, last_sort)
        elif op == "$bucketAuto":
            out = _compile_bucket_auto(out, spec, last_sort)
        elif op == "$setWindowFields":
            out = _compile_set_window_fields(out, spec)
        elif op == "$graphLookup":
            out = _compile_graph_lookup(out, spec, collections)
        elif op == "$densify":
            out = _compile_densify(out, spec)
        elif op == "$fill":
            out = _compile_fill(out, spec)
        elif op == "$unionWith":
            cname = spec if isinstance(spec, str) else spec["coll"]
            if cname not in collections:
                raise NotImplementedError(
                    f"$unionWith unknown collection {cname!r}; pass it via collections="
                )
            other = collections[cname]
            if isinstance(spec, Mapping) and spec.get("pipeline"):
                other = compile_pipeline(other, spec["pipeline"], collections)
            out = out.unionByName(other, allowMissingColumns=True)
        elif op == "$facet":
            out = _compile_facet(out, spec, collections)
        elif op == "$sortByCount":
            out = _compile_group(out, {"_id": spec, "count": {"$sum": 1}}, last_sort)
            out = out.orderBy(F.desc("count"), F.asc("_id"))
        elif op == "$sort":
            last_sort = [(k, v) for k, v in spec.items()]
            out = out.orderBy(
                *[F.col(k).desc() if v < 0 else F.col(k).asc() for k, v in spec.items()]
            )
        elif op == "$limit":
            out = out.limit(int(spec))
        elif op == "$skip":
            out = out.offset(int(spec))
        elif op == "$unwind":
            path = spec[1:] if isinstance(spec, str) else spec["path"][1:]
            preserve = isinstance(spec, Mapping) and spec.get("preserveNullAndEmptyArrays", False)
            exploder = F.explode_outer if preserve else F.explode
            if "." in path:
                # withColumn("a.b", ...) would create a LITERAL top-level
                # column named "a.b"; rebuild the parent struct instead so
                # later "$a.b" refs resolve to the exploded element.
                top, rest = path.split(".", 1)
                out = out.withColumn("__uw", exploder(F.col(path)))
                out = out.withColumn(top, F.col(top).withField(rest, F.col("__uw"))).drop("__uw")
            else:
                out = out.withColumn(path, exploder(F.col(path)))
        elif op == "$count":
            out = out.agg(F.count(F.lit(1)).alias(spec if isinstance(spec, str) else "count"))
        elif op == "$sample":
            # DELIBERATE divergence, documented: Mongo's $sample is random
            # per execution; a distributed engine re-executes stages on
            # retry/speculation, so a nondeterministic sample can break
            # exactly-once semantics downstream. Compiled instead as the
            # deterministic rendezvous bottom-k (hash-rank over the whole
            # row) — uniform like Mongo's, but a pure function of the
            # data: re-runs, retries, and repartitioning all agree.
            # TakeOrderedAndProject, no global sort.
            size = int(spec["size"])
            rank = F.xxhash64(F.struct(*[F.col(c) for c in out.columns]))
            out = (
                out.withColumn("__rank", rank)
                .orderBy("__rank")
                .limit(size)
                .drop("__rank")
            )
        elif op in ("$merge", "$out"):
            if stage is not stages[-1]:
                raise ValueError(f"{op} must be the final pipeline stage")
            if op == "$out":
                # $out REPLACES the target collection with the result —
                # at the plan level the result simply IS the new
                # collection; persistence is the caller's choice
                # (Engine.materialize / sources.sinks).
                continue
            out = _compile_merge(out, spec, collections)
        else:
            raise NotImplementedError(f"pipeline stage {op!r}")
    return out


def _compile_merge(out: DataFrame, spec: Mapping, collections: Mapping[str, DataFrame]) -> DataFrame:
    """$merge — Mongo's terminal upsert: fold the pipeline result into an
    existing collection on a key. Compiled onto the warehouse MERGE
    operator (one full-outer join — operators/warehouse.merge_upsert):
    whenMatched 'replace' takes the incoming document, 'keepExisting'
    keeps the target's; whenNotMatched 'insert' adds new documents,
    'discard' drops them. The merged FRAME is returned (Mongo writes it;
    here persistence is the caller's choice). Unsupported modes —
    pipeline-valued whenMatched, 'fail' — raise."""
    into = spec["into"] if isinstance(spec, Mapping) else spec
    if not isinstance(into, str):
        raise NotImplementedError("$merge into a namespaced {db, coll} target")
    if into not in collections:
        raise NotImplementedError(
            f"$merge into unknown collection {into!r}; pass it via collections="
        )
    target = collections[into]
    on = spec.get("on", "_id") if isinstance(spec, Mapping) else "_id"
    keys = [on] if isinstance(on, str) else list(on)
    when_matched = spec.get("whenMatched", "merge") if isinstance(spec, Mapping) else "merge"
    when_not = spec.get("whenNotMatched", "insert") if isinstance(spec, Mapping) else "insert"
    if when_matched not in ("replace", "keepExisting", "merge"):
        raise NotImplementedError(f"$merge whenMatched {when_matched!r}")
    if when_not not in ("insert", "discard"):
        raise NotImplementedError(f"$merge whenNotMatched {when_not!r}")
    t = target.withColumn("__t_here", F.lit(1)).alias("t")
    s = out.withColumn("__s_here", F.lit(1)).alias("s")
    joined = t.join(s, keys, "full_outer" if when_not == "insert" else "left_outer")
    src_here = F.col("s.__s_here").isNotNull()
    tgt_here = F.col("t.__t_here").isNotNull()
    cols: list[Column] = [F.col(c) for c in keys]
    value_cols = sorted((set(out.columns) | set(target.columns)) - set(keys))
    for c in value_cols:
        in_s, in_t = c in out.columns, c in target.columns
        if in_s and in_t:
            if when_matched == "replace":
                pick = F.when(src_here, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
            elif when_matched == "keepExisting":
                pick = F.when(tgt_here, F.col(f"t.{c}")).otherwise(F.col(f"s.{c}"))
            else:  # field-wise merge: incoming non-null fields overwrite
                pick = F.when(
                    src_here & F.col(f"s.{c}").isNotNull(), F.col(f"s.{c}")
                ).otherwise(F.col(f"t.{c}"))
            cols.append(pick.alias(c))
        elif in_s:
            cols.append(F.col(f"s.{c}").alias(c))
        else:
            cols.append(F.col(f"t.{c}").alias(c))
    return joined.select(*cols)
