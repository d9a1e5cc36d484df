"""Two-dialect SQL rendering: each operator's query text is generated ONCE
by a Python function taking a :class:`Dialect`, and rendered for Spark SQL
and DuckDB.  The DuckDB rendering is the correctness oracle; generating both
from the same source makes semantic drift between the engine and its oracle
structurally impossible.

Only genuinely divergent primitives live here (array/lambda function names,
epoch extraction, hex digests); everything the two engines share (CASE, ||,
%, instr, substr, joins, windows, ROLLUP, LIMIT) is written directly in the
query source.

A note on determinism across engines:
- NEVER mix bare decimal literals into arithmetic with integer columns:
  Spark types ``100.0`` as DECIMAL and runs exact decimal arithmetic
  (``int_col / 100.0`` divides in decimal), which rounds differently from
  DuckDB's all-double pipeline — write ``1.0e2`` (E-notation is DOUBLE in
  both engines) or CAST the literal.  Comparisons against decimal
  literals are safe; arithmetic chains are not (round-5 classifier bug);
- all floating aggregates are ``round(x, n)``-ed in the query itself;
- list folds use explicit left-to-right semantics in both engines (Spark
  ``aggregate``, DuckDB ``list_reduce`` over a 0-prepended list), so double
  summation order is identical;
- event timestamps vary by driver round (nanosecond parquet read as LONG
  under ``nanosAsLong``; microsecond parquet read as TIMESTAMP_NTZ);
  ``views.register_base_tables`` normalizes ``events.ts`` to a canonical
  UTC-session TIMESTAMP, DuckDB reads the raw parquet natively, and
  *seconds* (integer floor — ``epoch_s_events`` below) is the exchange
  unit: no query outputs a raw timestamp.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Dialect:
    name: str

    # ---- arrays / lambdas -------------------------------------------------
    def split(self, s: str, delim: str = " ") -> str:
        fn = "split" if self.name == "spark" else "string_split"
        return f"{fn}({s}, '{delim}')"

    def size(self, arr: str) -> str:
        fn = "size" if self.name == "spark" else "len"
        return f"{fn}({arr})"

    def adistinct(self, arr: str) -> str:
        fn = "array_distinct" if self.name == "spark" else "list_distinct"
        return f"{fn}({arr})"

    def aintersect(self, a: str, b: str) -> str:
        fn = "array_intersect" if self.name == "spark" else "list_intersect"
        return f"{fn}({a}, {b})"

    def transform(self, arr: str, var: str, expr: str) -> str:
        fn = "transform" if self.name == "spark" else "list_transform"
        return f"{fn}({arr}, {var} -> {expr})"

    def afilter(self, arr: str, var: str, pred: str) -> str:
        fn = "filter" if self.name == "spark" else "list_filter"
        return f"{fn}({arr}, {var} -> {pred})"

    def amin(self, arr: str) -> str:
        fn = "array_min" if self.name == "spark" else "list_min"
        return f"{fn}({arr})"

    def amax(self, arr: str) -> str:
        fn = "array_max" if self.name == "spark" else "list_max"
        return f"{fn}({arr})"

    def seq(self, lo: str, hi: str) -> str:
        """Inclusive integer sequence; callers must guarantee lo <= hi
        (Spark's sequence() counts DOWN when lo > hi; DuckDB returns [])."""
        fn = "sequence" if self.name == "spark" else "generate_series"
        return f"{fn}({lo}, {hi})"

    def elem(self, arr: str, idx: str) -> str:
        """1-based element access (Spark's [] is 0-based, DuckDB's 1-based —
        never use brackets in shared source)."""
        if self.name == "spark":
            return f"element_at({arr}, {idx})"
        return f"list_extract({arr}, {idx})"

    def reduce_bigint(self, arr: str, step: str) -> str:
        """Left fold with BIGINT accumulator starting at 0; ``step`` uses
        variables ``acc`` and ``x``.  Identical fold order in both engines."""
        if self.name == "spark":
            return f"aggregate({arr}, CAST(0 AS BIGINT), (acc, x) -> {step})"
        return f"list_reduce(list_prepend(CAST(0 AS BIGINT), {arr}), (acc, x) -> {step})"

    def fold_double(self, arr: str) -> str:
        """Sum a double array left-to-right (deterministic order)."""
        if self.name == "spark":
            return f"aggregate({arr}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        return f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {arr}), (acc, x) -> acc + x)"

    def zip_mul(self, a: str, b: str) -> str:
        """Elementwise product of two double arrays."""
        if self.name == "spark":
            return f"zip_with({a}, {b}, (u, v) -> u * v)"
        # DuckDB has no zip_with; index-based transform
        return f"list_transform(generate_series(1, len({a})), i -> list_extract({a}, i) * list_extract({b}, i))"

    def dot(self, a: str, b: str) -> str:
        return self.fold_double(self.zip_mul(a, b))

    def zip_sub_sq(self, a: str, b: str) -> str:
        """Elementwise squared difference of two double arrays — the
        summand of a squared L2 distance.  Same left-to-right fold contract
        as :meth:`zip_mul`, so ``fold_double(zip_sub_sq(a, b))`` yields
        bit-identical distances in both engines."""
        if self.name == "spark":
            return f"zip_with({a}, {b}, (u, v) -> (u - v) * (u - v))"
        return (
            f"list_transform(generate_series(1, len({a})), "
            f"i -> (list_extract({a}, i) - list_extract({b}, i)) "
            f"* (list_extract({a}, i) - list_extract({b}, i)))"
        )

    def dist2(self, a: str, b: str) -> str:
        """Squared Euclidean distance with a deterministic fold order."""
        return self.fold_double(self.zip_sub_sq(a, b))

    def agg_arr_by(self, key: str, val: str) -> str:
        """Aggregate ``val`` into an array ordered by ``key`` (both columns
        from the grouped input).  Spark's collect_list order is
        partition-nondeterministic, so sort (key, val) structs after the
        fact; DuckDB's list() accepts an ORDER BY directly.  Use this —
        never bare collect_list — whenever an aggregated array's element
        ORDER reaches the output or a downstream fold."""
        if self.name == "spark":
            return (
                f"transform(sort_array(collect_list(struct({key} AS k, {val} AS v))), "
                f"s -> s.v)"
            )
        return f"list({val} ORDER BY {key})"

    def cast_double_arr(self, arr: str) -> str:
        if self.name == "spark":
            return f"transform({arr}, v -> CAST(v AS DOUBLE))"
        return f"CAST({arr} AS DOUBLE[])"

    def arr1(self, x: str) -> str:
        """Single-element array literal."""
        return f"array({x})" if self.name == "spark" else f"[{x}]"

    def aconcat(self, a: str, b: str) -> str:
        """Array concatenation."""
        fn = "concat" if self.name == "spark" else "list_concat"
        return f"{fn}({a}, {b})"

    def asort(self, arr: str) -> str:
        """Ascending sort of an array (NULL-free by caller contract; both
        engines sort values identically — used for exact in-array order
        statistics like a median without a per-group window)."""
        fn = "array_sort" if self.name == "spark" else "list_sort"
        return f"{fn}({arr})"

    def arr_bigint(self, values) -> str:
        """Constant BIGINT array literal from Python ints (basis tables,
        lookup lattices) — elements are plain literals in both engines."""
        body = ", ".join(str(int(v)) for v in values)
        return f"array({body})" if self.name == "spark" else f"[{body}]"

    # ---- scalars ----------------------------------------------------------
    def encode_utf8(self, text: str) -> str:
        """String → BLOB/BINARY of its UTF-8 bytes."""
        if self.name == "spark":
            return f"encode({text}, 'utf-8')"
        return f"encode({text})"

    def md5_utf8(self, text: str) -> str:
        """Hex MD5 of a string's UTF-8 bytes (identical hex both engines)."""
        if self.name == "spark":
            return f"md5(encode({text}, 'utf-8'))"
        return f"md5({text})"

    def json_str(self, col: str, path: str) -> str:
        if self.name == "spark":
            return f"get_json_object({col}, '{path}')"
        return f"json_extract_string({col}, '{path}')"

    def ascii_safe(self, s: str) -> str:
        """ascii() of first char, 0 for empty strings (engines disagree on
        ascii(''))."""
        return f"(CASE WHEN length({s}) = 0 THEN 0 ELSE ascii(substr({s}, 1, 1)) END)"

    def byte_len(self, s: str) -> str:
        """UTF-8 byte length of a string (length()/len() count CHARACTERS
        in both engines — wrong for width-in-bytes statistics on non-ASCII
        text; r11 ADVICE).  Spark octet_length(VARCHAR) and DuckDB
        strlen(VARCHAR) both count encoded bytes."""
        if self.name == "spark":
            return f"octet_length({s})"
        return f"strlen({s})"

    def trunc6(self, x: str) -> str:
        """Truncate to 6 decimals via floor — engine-independent, unlike
        round(): rational ratios (k/2^m) land EXACTLY on decimal ties where
        Spark rounds HALF_UP and DuckDB half-to-even.

        The floor must stay in DOUBLE end-to-end: Spark's floor(double)
        returns BIGINT, which silently CLAMPS at 2^63 — for |x| ≳ 9.2e12
        (x·1e6 past the BIGINT range; real at capacity-forecast scale,
        r12) the old CAST(floor(...) AS DOUBLE) form returned 2^63/1e6
        while DuckDB's DOUBLE floor kept the true value.  Spark side now
        branches at 2^52: above it every double is already integral, so
        floor is the identity (no BIGINT round-trip, no clamp — same
        value DuckDB's DOUBLE floor returns up to and past 2^63); below
        it the BIGINT floor is exact and the cast back is exact (|n| <
        2^52), so values are bit-identical to the old form everywhere the
        old form didn't clamp.  (A pmod-based y − frac(y) identity was
        rejected: the +1 re-centering for negative fractions rounds,
        which can miss the true floor by one ULP — this branch form is
        exact for every finite double.)"""
        y = f"(({x}) * 1000000)"
        if self.name == "spark":
            return (
                f"((CASE WHEN abs({y}) >= 4503599627370496.0e0 THEN {y} "
                f"ELSE CAST(floor({y}) AS DOUBLE) END) / 1000000)"
            )
        return f"(CAST(floor({y}) AS DOUBLE) / 1000000)"

    # ---- time -------------------------------------------------------------
    def epoch_s_events(self, col: str) -> str:
        """events.ts → epoch seconds (BIGINT).  Spark reads the canonical
        TIMESTAMP view (views.normalize_events_ts, UTC session), DuckDB the
        raw parquet timestamp; integer floor matches for positive epochs
        (unix_seconds truncates, epoch() floors)."""
        if self.name == "spark":
            return f"unix_seconds({col})"
        return f"CAST(floor(epoch({col})) AS BIGINT)"

    def epoch_s_date(self, col: str) -> str:
        """Date-valued column → epoch seconds of its DATE (BIGINT),
        timezone-free in both engines: Spark's unix_seconds rejects the
        TIMESTAMP_NTZ parquet reads as (and an NTZ→TZ cast would drag the
        session timezone in), so go through DATE — day count × 86400.
        For date-valued columns (TPC-H ship dates) this IS the epoch."""
        if self.name == "spark":
            return f"(unix_date(CAST({col} AS DATE)) * CAST(86400 AS BIGINT))"
        return f"CAST(floor(epoch(CAST({col} AS DATE))) AS BIGINT)"

    def token_hash64(self, s: str) -> str:
        """64-bit token hash for SET-CARDINALITY operators only (exact
        Jaccard: only |A ∩ B| / |A ∪ B| reaches the output, so each engine
        merely needs an injective-modulo-negligible-collisions hash of its
        own — the hash VALUES never cross engines).  Spark uses native
        xxhash64 (whole-stage-codegen, ~10× cheaper than an md5 hex digest
        per token — at 100 TB the token-hash map is a dominant prep cost);
        DuckDB keeps the md5-prefix form.  Operators whose OUTPUT depends
        on hash values (minhash signatures/LSH bands) must instead use
        :meth:`hex12_to_bigint` over md5 so both engines see identical
        values."""
        if self.name == "spark":
            return f"xxhash64({s})"
        return self.hex12_to_bigint(f"substr({self.md5_utf8(s)}, 1, 12)")

    def md5_key48(self, expr: str, seed: str = "") -> str:
        """48-bit md5-derived BIGINT key of (seed ‖ expr) — the frozen
        uniform the sampling/shard/bucket operators rank and bucket on.
        One audited construction (md5 → first 12 hex chars → radix cast):
        overflow-safe (48 < 63 bits), identical in both engines, and a
        pure function of (seed, expr), so every consumer is rerun- and
        engine-stable by construction."""
        inner = f"concat('{seed}', {expr})" if seed else expr
        return self.hex12_to_bigint(f"substr({self.md5_utf8(inner)}, 1, 12)")

    def hex12_to_bigint(self, hexstr: str) -> str:
        """First 12 hex chars → BIGINT (48 bits, overflow-safe for k*h+b).
        Native radix conversion in both engines (Spark conv(), DuckDB hex
        cast) — far cheaper than a per-character fold."""
        if self.name == "spark":
            return f"CAST(conv({hexstr}, 16, 10) AS BIGINT)"
        return f"CAST('0x' || {hexstr} AS BIGINT)"

    def regex_tokens(self, s: str, pattern: str) -> str:
        """All full-pattern matches as an array.  Spark's regexp_extract_all
        defaults to group 1 (must pass 0 for the whole match); DuckDB defaults
        to group 0.  Keep patterns to portable ASCII classes — Java regex and
        RE2 agree on those."""
        if self.name == "spark":
            return f"regexp_extract_all({s}, '{pattern}', 0)"
        return f"regexp_extract_all({s}, '{pattern}')"

    def aslice(self, arr: str, start_1based: str, length: str) -> str:
        """Subarray of ``length`` elements from 1-based ``start``."""
        if self.name == "spark":
            return f"slice({arr}, {start_1based}, {length})"
        # DuckDB list_slice bounds are inclusive begin..end
        return f"list_slice({arr}, {start_1based}, ({start_1based}) + ({length}) - 1)"

    def ajoin(self, arr: str, sep: str = " ") -> str:
        fn = "array_join" if self.name == "spark" else "array_to_string"
        return f"{fn}({arr}, '{sep}')"

    def lateral_seq(self, lo: str, hi: str, var: str, step: str = "1") -> str:
        """FROM-clause suffix exploding the inclusive integer sequence
        [lo, hi] (by ``step``) as column ``var`` (one output row per
        value).  Callers must guarantee lo <= hi and step >= 1."""
        if self.name == "spark":
            return f"LATERAL VIEW explode(sequence({lo}, {hi}, {step})) _lv_{var} AS {var}"
        return f", unnest(generate_series({lo}, {hi}, {step})) AS _lv_{var}({var})"

    def lateral_explode(self, arr: str, var: str) -> str:
        """FROM-clause suffix exploding an array column as ``var`` (one
        output row per element; a NULL array yields no rows in both
        engines)."""
        if self.name == "spark":
            return f"LATERAL VIEW explode({arr}) _lv_{var} AS {var}"
        return f", unnest({arr}) AS _lv_{var}({var})"

    def bxor(self, a: str, b: str) -> str:
        """Bitwise XOR of two BIGINTs.  Spark's ``^`` is XOR but DuckDB's
        ``^`` is POWER — never write the operator in shared source."""
        if self.name == "spark":
            return f"(({a}) ^ ({b}))"
        return f"xor({a}, {b})"

    def shl(self, x: str, n: str) -> str:
        """Left bit-shift of a BIGINT.  Spark spells it shiftleft();
        DuckDB uses <<.  Callers keep results under 63 bits (sign-safe)."""
        if self.name == "spark":
            return f"shiftleft({x}, CAST({n} AS INT))"
        return f"(({x}) << ({n}))"

    def shr(self, x: str, n: str) -> str:
        """Arithmetic right bit-shift of a BIGINT (operands non-negative
        by caller contract, so arithmetic == logical)."""
        if self.name == "spark":
            return f"shiftright({x}, CAST({n} AS INT))"
        return f"(({x}) >> ({n}))"

    def popcount(self, x: str) -> str:
        """Set-bit count of a BIGINT (both engines name it bit_count;
        wrapped so shared source documents the intent and pins the CAST —
        Spark returns INT, DuckDB BIGINT)."""
        return f"CAST(bit_count({x}) AS INT)"

    def re_match(self, s: str, pattern: str) -> str:
        """Boolean partial-match predicate (usable inside lambdas).  Keep
        patterns to portable ASCII classes and avoid backslash escapes
        entirely — Spark string literals treat ``\\`` as an escape, DuckDB's
        don't, so the same source text would reach the two regex engines
        differently (write ``[.]`` instead of ``\\.``)."""
        if self.name == "spark":
            return f"({s} RLIKE '{pattern}')"
        return f"regexp_matches({s}, '{pattern}')"

    def regex_replace_all(self, s: str, pattern: str, rep: str) -> str:
        """Replace ALL matches.  Spark's regexp_replace is global by
        default; DuckDB replaces only the first match without the 'g'
        flag.  Keep patterns to portable ASCII classes (Java regex ∩ RE2)."""
        if self.name == "spark":
            return f"regexp_replace({s}, '{pattern}', '{rep}')"
        return f"regexp_replace({s}, '{pattern}', '{rep}', 'g')"

    def idiv(self, a: str, b: str) -> str:
        """Integer (floor) division of non-negative integers."""
        op = "div" if self.name == "spark" else "//"
        return f"(({a}) {op} ({b}))"


def money_double(sum_expr: str, scale: int = 2) -> str:
    """Engine-identical DECIMAL-sum → DOUBLE conversion (r12, found by the
    sf1.0 correctness tier): scale the exact decimal sum to an integral
    BIGINT by its OWN 10^scale (exact — no rounding, no ties), then
    rebuild the double with one fixed division.

    Why the plain CAST(sum AS DOUBLE) is not portable at scale: once the
    sum's integer units exceed 2^53 (≈ 9.2e9 currency at scale 6 — one
    Q1 sum_charge group at sf1.0), Spark converts via Java BigDecimal
    (ONE correctly-rounded step) while DuckDB converts int128 → double and
    THEN divides by 10^scale (TWO roundings) — a 1-ULP divergence the
    value hash catches.  This form is identical by construction: the
    scaled BIGINT is exact in both engines (decimal arithmetic
    end-to-end; the value is integral so the BIGINT cast cannot hit the
    engines' DIFFERENT fraction policies — Spark truncates, DuckDB
    rounds), int64 → double is one correctly-rounded step everywhere, and
    the final division is the same IEEE op on the same operands.  Because
    nothing is re-rounded, outputs equal the old CAST form everywhere the
    old form was exact (|sum|·10^scale < 2^53) — no value churn at the
    driver SFs.

    ``scale`` must be ≥ the sum's true decimal scale (an understated
    scale leaves a fraction, where Spark truncates but DuckDB rounds;
    overstating just appends zeros and tightens the bound).  Bound:
    |sum| < 2^63/10^scale — 9.2e16 currency at scale 2, 9.2e12 at scale
    6 (a per-group bound; TPC-H per-group money sums sit orders below
    it through sf10k).  Plain shared-dialect SQL — safe inside
    one-string queries."""
    mult = 10 ** scale
    return (
        f"(CAST(CAST({sum_expr} * {mult} AS BIGINT) AS DOUBLE)"
        f" / CAST({mult} AS DOUBLE))"
    )


def avg_lattice(d: Dialect, row_expr: str, p: int) -> str:
    """ORDER-FREE engine-exact mean of a per-row DOUBLE expression at a
    per-site lattice scale — the generalization of text._avg6_exact that
    the r14 determinism audit applies to the remaining display-only
    ``trunc6(avg(double))`` sites (the fuzz seed-257 class: Spark merges
    avg's partial double sums in task-completion order, DuckDB sums in
    its own order, so a mean within ~n ulps of a 1e-6 display grid line
    can truncate differently per engine or per run).

    Shape: floor each row onto the 10^-p lattice (one multiply + floor —
    bit-identical cross-engine; Spark's floor(double) lands in BIGINT,
    DuckDB's in an integral DOUBLE, and the DECIMAL(38,0) cast is exact
    from both), accumulate as DECIMAL(38,0) (exact, order-free, 1e38
    headroom at ANY group size — the du-forecast discipline; a BIGINT
    accumulator would cap norm-scale sums near 1e10 rows), then ONE
    correctly-rounded decimal→double cast, one division, trunc6.

    Choosing ``p`` (the per-site magnitude analysis, NOT a blanket 1e-6
    grid — that would zero statistics like int8 mean_sq_err ~1e-5):
    the displayed mean shifts DOWN by < 10^-p vs the raw avg, so any
    p >= 7 is invisible at the 1e-6 display; the constraint is per-row
    headroom.  Hard determinism bound |row| < 2^63/10^p (Spark's BIGINT
    floor clamps above it while DuckDB's DOUBLE floor keeps going —
    the trunc6 clamp lesson); full lattice accuracy additionally wants
    |row| < 2^53/10^p (above that, integral doubles have gaps, which is
    still deterministic but the floor lands off-lattice).  Rule used at
    the call sites: p=12 for [0,1]-bounded statistics, p=9 for O(1)-to-
    O(1e3) magnitudes (norms, components, Flesch scores), matching the
    documented per-site bound."""
    mult = f"1.0e{p}"
    micro = f"CAST(floor(({row_expr}) * {mult}) AS DECIMAL(38,0))"
    return d.trunc6(
        f"CAST(sum({micro}) AS DOUBLE) / (CAST(count({micro}) AS DOUBLE) * {mult})"
    )


SPARK = Dialect("spark")
DUCK = Dialect("duck")
