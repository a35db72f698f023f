"""Predicate -> probe-bounds extraction for manifest-pruned facade scans.

``Stream.read_manifest`` prunes its candidate file list automatically
when a ``.filter(Column)`` lands on it (round-13 verdict ask 4).  The
pruning bound must be IMPLIED by the predicate — a candidate list built
from a wider range keeps extra files (wasted IO, never wrong), one built
from a narrower range drops rows — so extraction is strictly
conservative: only conjuncts whose shape it fully understands contribute
bounds; everything else contributes nothing (that conjunct prunes no
files but still filters rows, exactness preserved).

Spark 4's Column wraps a ``ColumnNode`` tree
(``org.apache.spark.sql.internal``): ``UnresolvedFunction(name, args)``
for every operator, ``UnresolvedAttribute`` for columns, ``Literal`` for
constants — walked here over py4j.  Supported shapes:

- ``a & b`` ("and"): both sides contribute; per column, los take max and
  his take min (range intersection).
- ``col >= lit`` / ``> / <= / < / =`` (either operand order): one-sided
  bounds; strict inequalities widen to inclusive (the residual predicate
  restores strictness).
- ``col.between(lo, hi)``: arrives as the "and" of two comparisons.
- ``col.isin(...)`` ("in"): lo=min(values), hi=max(values).
- literals: Python ints / floats / strings arrive as primitives;
  ``java.sql.Timestamp`` converts to absolute epoch seconds (the 'ts'
  stats unit — both the literal and the stored bound are absolute, so
  session timezone cannot skew the pair); ``java.sql.Date`` to epoch
  days.
- anything else — "or", "not", casts, function calls, non-literal
  operands — contributes nothing (fall back to the full candidate list
  for that conjunct).

TIMESTAMP_NTZ columns prune through exactly ONE literal shape (round-14
verdict ask 4): ``lit('YYYY-MM-DD[ HH:MM:SS[.ffffff]]')
.cast('timestamp_ntz')`` — a ``Cast(Literal(str) -> TimestampNTZType)``
node.  A STRING-sourced NTZ cast is pure calendar parsing, identical in
every session timezone (the engine's own NTZ-literal rule,
functions/timeutil.py), so the wall-clock bound it implies is
session-independent and converts to the ``ts_ntz`` stats unit
(wall-clock epoch seconds) by plain arithmetic.  A session-zoned
timestamp literal (``F.lit(naive_datetime)`` -> java.sql.Timestamp)
compared against an NTZ column, or a datetime-sourced NTZ cast (its
wall clock round-trips through driver-OS and session zones), stays
non-extractable — no session-independent bound exists.  The caller
enforces kind pairing by checking the extracted bound's expected kind
against the stats row's recorded kind.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column

#: extracted-bound type -> the stats kinds it may prune against
#: (a mismatch skips pruning for that column, never raises: the filter
#: still applies row-grain, exactness is untouched)
KIND_COMPAT = {
    "num": {"int", "frac", "dec"},
    "str": {"str"},
    "ts": {"ts"},
    "date": {"date"},
    "ts_ntz": {"ts_ntz"},
}


def _ntz_cast_literal(node):
    """(naive datetime, 'ts_ntz') for a
    ``Cast(Literal(str) -> TimestampNTZType)`` node — the one NTZ
    literal shape with a session-independent wall clock.  Strings the
    strict ISO parser rejects (or that carry a zone offset — Spark
    would shift them) contribute nothing."""
    import datetime as _dt

    try:
        if str(node.dataType()) != "TimestampNTZType":
            return None
        child = node.child()
        if child.getClass().getSimpleName() != "Literal":
            return None
        v = child.value()
    except Exception:
        return None
    if not isinstance(v, str):
        return None
    try:
        d = _dt.datetime.fromisoformat(v.strip())
    except ValueError:
        return None
    if d.tzinfo is not None:
        return None
    return (d, "ts_ntz")


def _literal_value(node):
    """(value, bound_type) for a Literal node, or None when the literal
    type is outside the supported pruning domain."""
    try:
        if node.getClass().getSimpleName() == "Cast":
            return _ntz_cast_literal(node)
    except Exception:
        return None
    try:
        v = node.value()
    except Exception:
        return None
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return (v, "num")
    if isinstance(v, str):
        return (v, "str")
    # java.time / java.sql objects arrive as py4j JavaObjects
    try:
        cls = v.getClass().getName()
    except Exception:
        return None
    if cls == "java.sql.Timestamp":
        # absolute epoch seconds — the 'ts' stats unit; getTime() is
        # millis since epoch, zone-free, so the pruning bound and the
        # residual literal agree under any session timezone
        return (v.getTime() / 1000.0, "ts")
    if cls == "java.sql.Date":
        import datetime as _dt

        d = _dt.date.fromisoformat(v.toString())
        return ((d - _dt.date(1970, 1, 1)).days, "date")
    return None


def _attr_name(node) -> Optional[str]:
    if node.getClass().getSimpleName() != "UnresolvedAttribute":
        return None
    try:
        return node.sql()
    except Exception:
        return None


def _merge_vals(vals: dict, col: str, vs: frozenset, btype: str) -> None:
    """Equality/IN value sets, intersected across conjuncts (a row must
    satisfy every AND'd conjunct, so the implied value set shrinks)."""
    old_vs, old_t = vals.get(col, (None, btype))
    if old_t != btype:
        vals[col] = (None, "conflict")
        return
    vals[col] = (vs if old_vs is None else (old_vs & vs), btype)


def _merge(bounds: dict, col: str, lo, hi, btype: str) -> None:
    old_lo, old_hi, old_t = bounds.get(col, (None, None, btype))
    if old_t != btype:
        # mixed bound types on one column: drop pruning for it
        bounds[col] = (None, None, "conflict")
        return
    if lo is not None:
        old_lo = lo if old_lo is None else max(old_lo, lo)
    if hi is not None:
        old_hi = hi if old_hi is None else min(old_hi, hi)
    bounds[col] = (old_lo, old_hi, btype)


def _walk(node, bounds: dict, vals: dict, nulls: dict) -> None:
    if node.getClass().getSimpleName() != "UnresolvedFunction":
        return
    fn = node.functionName()
    args = list_args(node)
    if fn == "and":
        for a in args:
            _walk(a, bounds, vals, nulls)
        return
    if fn in ("isNull", "isNotNull", "isnull", "isnotnull"):
        if len(args) != 1:
            return
        name = _attr_name(args[0])
        if not name:
            return
        want = "null" if fn.lower() == "isnull" else "notnull"
        old = nulls.get(name)
        nulls[name] = want if old in (None, want) else "conflict"
        return
    if fn in (">=", ">", "<=", "<", "="):
        if len(args) != 2:
            return
        left, right = args
        name = _attr_name(left)
        lit = _literal_value(right) if name else None
        flipped = False
        if lit is None:
            name = _attr_name(right)
            lit = _literal_value(left) if name else None
            flipped = True
        if not name or lit is None:
            return
        v, btype = lit
        op = fn
        if flipped:  # lit OP col  ==  col FLIP(OP) lit
            op = {">=": "<=", ">": "<", "<=": ">=", "<": ">", "=": "="}[fn]
        if op in (">=", ">"):
            _merge(bounds, name, v, None, btype)
        elif op in ("<=", "<"):
            _merge(bounds, name, None, v, btype)
        else:
            _merge(bounds, name, v, v, btype)
            _merge_vals(vals, name, frozenset([v]), btype)
        return
    if fn == "in":
        if len(args) < 2:
            return
        name = _attr_name(args[0])
        if not name:
            return
        lits = [_literal_value(a) for a in args[1:]]
        if any(entry is None for entry in lits):
            return
        types = {t for _, t in lits}
        if len(types) != 1:
            return
        vs = [v for v, _ in lits]
        btype = types.pop()
        _merge(bounds, name, min(vs), max(vs), btype)
        _merge_vals(vals, name, frozenset(vs), btype)
        return
    # or / not / cast / calls / ...: no contribution (conservative)


def list_args(node) -> list:
    out = []
    it = node.arguments().iterator()
    while it.hasNext():
        out.append(it.next())
    return out


def extract_prune_ranges(pred: Column) -> dict:
    """col -> (lo, hi, bound_type) implied by ``pred``, conservative.
    Empty dict = nothing extractable (prune nothing; filter normally).
    Columns whose extracted bounds conflicted are dropped here."""
    return extract_prune_spec(pred)[0]


def extract_prune_spec(pred: Column) -> tuple:
    """(ranges, values, nulls): ``ranges`` as ``extract_prune_ranges``;
    ``values`` maps col -> (frozenset of values, bound_type) implied by
    equality / IN conjuncts (intersected across conjuncts) — the probe
    shape a block-Bloom member index answers; ``nulls`` maps col ->
    'null' | 'notnull' for isNull / isNotNull conjuncts — the shape the
    exact per-file null COUNTS answer (a conflicting pair is dropped:
    the residual predicate yields empty anyway)."""
    bounds: dict = {}
    vals: dict = {}
    nulls: dict = {}
    try:
        _walk(pred._jc.node(), bounds, vals, nulls)
    except Exception:
        return {}, {}, {}
    ranges = {
        c: (lo, hi, t)
        for c, (lo, hi, t) in bounds.items()
        if t != "conflict" and not (lo is None and hi is None)
    }
    values = {
        c: (vs, t)
        for c, (vs, t) in vals.items()
        if t != "conflict" and vs is not None
    }
    null_probes = {c: w for c, w in nulls.items() if w != "conflict"}
    return ranges, values, null_probes
