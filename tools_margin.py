"""Boundary-margin + signed-zero exposure audit (round-12/13 verdict items).

For every oracled query whose declared output rounds a computed value, this
tool re-derives the PRE-round values at full precision in DuckDB and measures
each one's distance to the nearest rounding half-boundary. A rounded value
whose pre-round double sits within jitter range of a half-boundary is a
knife-edge: if the Spark side computes it through an ORDER-DEPENDENT float
sum, shuffle-arrival order can flip the rounded digit draw to draw (the r11
q_embed_cov failure). This audit catches the next one at build time.

Method: in each oracle's FINAL select list, every `round(expr, d)` occurrence
gets a sibling margin column appended (same expression, same grouping, same
ORDER BY/LIMIT, so the row population is exactly the declared one):
    margin_value = abs((expr*10^d - floor(expr*10^d)) - 0.5) / 10^d
The per-query minimum margin must exceed JITTER (1e-9 in value units) for
queries classified ORDER-DEPENDENT (the round argument contains a float
aggregate over double data). Queries whose rounded aggregate is exact on the
Spark side (integer/long/quantized-Long sums - summation order cannot move
them) are classified EXACT_BACKED with a per-entry justification: their
margins are reported but not gated, because determinism, not margin, is
their stability argument.

Queries the rewriter cannot handle are listed as SKIPPED with the reason -
silent non-coverage would read as "audited" when it wasn't. Round 13
shrank that set: depth-0 UNION ALL chains are audited branch-by-branch
(margins merged by min, exposure counts summed positionally, canon flags
ANDed), and FROM-less scalar-subquery selects append margin columns like
any other select list.

ROUND 14 extended coverage from final selects to the WHOLE query:
- Every round()-bearing CTE body becomes its own audit unit (the body
  promoted to a final select over its chain prefix) - CTE rounds reach the
  declared output (q_knn_join's cos, q_zscore's z) or its filters exactly
  like final ones and were structurally invisible before; the extension
  immediately found 7 real signed-zero exposures + 1 knife-edge.
- WHERE/HAVING/ORDER rounds in the final query are audited. A WHERE round
  decides output MEMBERSHIP, so its gate is a predicate-flip probe over
  the UNFILTERED relation: the whole predicate is evaluated with the
  round's argument perturbed +/-jitter, and any row whose outcome differs
  is a genuine membership knife-edge (rows a flip would inject INTO the
  output are visible, and boundary-near rows whose flip cannot change the
  predicate are NOT false-flagged). HAVING/ORDER rounds keep the declared
  population (documented residual: LIMIT-boundary injection). Tail rounds
  never hash a sign bit, so the signed-zero gate does not apply to them.
- UNION ALL branches after the first inherit the WITH prefix; branches
  whose rounds all live in CTEs contribute nothing instead of aborting.
- SQL keywords are matched with an identifier-boundary guard (an alias
  like valid_FROM silently truncated q_scd2's select list for 13 rounds).
- `--selftest` machine-checks all of the above on planted fixtures.
ROUND 15 closed the remaining structural skip classes:
- The pre-filter matches `round(` calls, not the substring 'round' — a
  column ALIASED `round` (q_kcore) no longer drags a round-free oracle
  into the audit as an unauditable skip.
- Single-arg `round(x)` audits as d=0 (the cents pattern `CAST(round(v *
  100) AS BIGINT)` and the int8 quantizer `round(x/m*127)` were invisible
  before). A round consumed by an integer CAST is sign-dead — integers
  carry no -0.0 — so the cast counts as zero canonicalization.
- A CTE body carrying its own WITH chain splices: the inner chain's CTEs
  are appended to the outer prefix (collision-checked), so the promoted
  unit audits like any other.
- WHERE-round membership probes no longer ride the FILTERED select list
  (r14 advisor: an empty declared output made min() aggregate zero rows
  and silently swallow a probe that would inject a row INTO the empty
  output). The WITH prefix is hoisted out of the wrapper and each probe
  becomes a standalone scalar subquery in the OUTER select over the
  unfiltered FROM clause — evaluated exactly once, rows or no rows.
- Nested-subquery rounds PROMOTE to their own [sub:k] units (prefix
  threaded): previously a visible skip when they were a unit's only
  rounds and — worse — silently uncounted when the unit also had
  auditable rounds. Correlated subqueries fail standalone execution and
  surface as loud 'rewritten SQL failed' skips.
Remaining skips: EXCEPT/INTERSECT/plain-UNION finals (row semantics are
whole-branch-dependent), SELECT DISTINCT, correlated nested subqueries
(restructure such oracles to hoist the round, the q_sql_script pattern),
and self-referencing (recursive) CTE bodies.

SIGNED-ZERO EXPOSURE (round-13, from the r12 driver failure): Spark's
round(double, d) goes through BigDecimal and always emits +0.0, while
DuckDB's round preserves -0.0 - so any rounded value whose full-precision
input lies in (-0.5*10^-d, 0) hash-diverges on sign alone even when the
pre-round doubles are bit-identical. The fix is to canonicalize the zero
with `round(e, d) + 0.0` (IEEE: -0.0 + 0.0 = +0.0) spelled on BOTH engine
sides. This audit treats a final-select round(e, d) as EXPOSED when its
pre-round expression takes ANY negative value on the fixture (a future
fixture/sf could then land one in the divergence interval) and the round is
NOT followed by a zero-canonicalizing `+ 0.0`. Exposure is structural:
it gates on can-be-negative, not on whether today's fixture happens to
land in the interval (that near-miss count is reported as info). Exit 1
on any non-canonicalized exposure.

Usage: python3 tools_margin.py [sfdir] [verify_dir]
Exit 1 if any ORDER-DEPENDENT query has min margin <= JITTER (whitelist:
empty) or any negative-capable round lacks zero canonicalization.
"""
import duckdb, json, re, sys

JITTER = 1e-9  # value-units distance to a half-boundary that summation-order
               # jitter could plausibly cross (r11 failing cell: 2.5e-11)

# Rounded aggregates that are EXACT on the Spark side - summation order
# cannot move the pre-round value, so the margin is informational only (the
# textual float-agg classifier cannot see Spark-side types, so these are
# reviewed corrections). Every entry carries its exactness argument; this is
# NOT a failure whitelist - an entry without a valid argument is a bug.
EXACT_BACKED = {
    'q_embed_cov': 'sums are floor-quantized 2^24-grid Longs (CovAccumAgg); pre-round double is a pure function of the data',
    'q_embed_cov_label': 'same exact quantized-Long sums as q_embed_cov, grouped by label',
    'q_rfm': 'monetary accumulates as exact cent Longs (round-12 fix); the declared avg divides an exact Long sum',
    'q_bpe_encode': 'units_per_word divides a Spark Long sum of integer unit counts by count(*) - one deterministic division',
    'q_dedup_spans': 'dup_frac divides a Spark Long sum of integer coverage counts by n_tokens - one deterministic division',
    'q_quality_score': 'avg over 0/1 indicator doubles and integer token lengths: integer-valued double sums are exact in IEEE below 2^53 in ANY order',
    'q_kde': 'round-13: each Gaussian term floor-quantized to the 2^24 grid and summed as exact Longs (the cov discipline); the former 1.7e-10 reviewed-floor entry is retired. Residual cross-engine assumption (r13 advisor): exp() is libm, not correctly rounded, so a 1-ulp JVM-vs-DuckDB difference landing within ~2^-24 of a floor boundary could still shift one Long term by 1 - a pre-round perturbation of ~1/(2^24*n*norm) ~ 4e-11 at sf0.01, four orders below the measured 4.6e-7 margin and shrinking with n; if exp inputs ever become adversarial (terms parked exactly on grid boundaries), re-derive the margin or restore a reviewed floor',
    'q_pca_project': 'the projection dot sums floor-quantized 2^24-grid Longs (the cov discipline); the eigenvector it consumes is itself exact-backed',
    'q_cov_update': 'same exact quantized-Long sums as q_embed_cov: the standing triangle and the batch triangle are both CovAccumAgg Longs, and the merge is Long addition - the pre-round double is bit-identical to the full recompute',
    'q_cov_downdate': 'the downdate subtracts exact CovAccumAgg Longs from exact Longs - bit-identical to the full recompute over the remaining corpus (same argument as q_cov_update, negated)',
    'q_stream_cov': 'the transformWithState moment store folds the same floor-quantized 2^24-grid Longs per micro-batch; Long addition is batching-independent, so the drained pre-round double is bit-identical to q_embed_cov (same fixture knife-edge cells, same exactness argument)',
    'q_graph_metrics': 'avg_degree averages integer degree counts: integer-valued double sums are exact in IEEE below 2^53 in ANY order (the q_quality_score argument); the r15 oracle hoist round((SELECT avg(deg)...), 4) made this round visible to the audit',
}

# ORDER-DEPENDENT queries whose measured margin is below JITTER but has been
# reviewed against the query's actual jitter bound: each entry records the
# floor below which the audit DOES fail (margin eroding toward the boundary
# must be caught). Review argument lives here, next to the number.
# (q_kde's 1e-12 reviewed floor was retired in round 13: its terms are now
# exact quantized-Long sums, so it moved to EXACT_BACKED.)
THIN_MARGIN_REVIEWED = {}

# Per-UNIT exactness exemptions for CTE audit units (label = 'name[cte:x]'),
# each with its own justification — the name-scoped EXACT_BACKED table
# applies to final selects only (r14).
EXACT_BACKED_UNITS = {
    'q_pca_project[cte:pc]': 'the published eigenvector: round(y8/m8, 6) where y8 is a quantized-Long mat-vec sum and m8 its infinity norm - pure function of the data (the q_pca_power argument, inherited by the shared CTE prefix)',
}

# The textual ORDER-DEP classifier reads the round's argument in the final
# select; an argument that is a bare alias of a CTE-computed float aggregate
# escapes it. These entries force the ORDER-DEP gate for such queries (the
# opposite direction of EXACT_BACKED), with the reason recorded.
FORCE_ORDER_DEP = {
    'q_zscore': 'round(zraw, 4): zraw is a window avg/stddev over doubles computed in the CTE - the alias hides the float aggregate from the classifier',
}

# an actual round() CALL - the pre-filter and CTE-body check must not fire
# on a column merely ALIASED `round` (q_kcore's `CAST(0 AS BIGINT) AS round`
# read as an unauditable skip for two rounds)
HAS_ROUND = re.compile(r'\bround\s*\(', re.I)

# float aggregate over data -> order-dependent double sum on the Spark side
FLOAT_AGG = re.compile(r'\b(sum|avg|var_pop|var_samp|stddev\w*|covar\w*|corr|regr_\w+)\s*\(', re.I)
# any aggregate at all (decides whether a margin column binds at group level)
ANY_AGG = re.compile(r'\b(count|sum|avg|min|max|stddev\w*|var_\w+|quantile\w*|median|'
                     r'covar\w*|corr|regr_\w+|string_agg|array_agg|list|first|last|'
                     r'bool_and|bool_or|arg_min|arg_max|bit_\w+|mode|product|entropy)\s*\(', re.I)
# ...unless the aggregated operand is an integer 0/1 CASE or a count ratio,
# which Spark sums as exact Longs. Conservative: only the patterns we audit.
INT_BACKED = re.compile(r'\b(sum|avg)\s*\(\s*(CASE\s+WHEN[^()]*THEN\s+1\s+ELSE\s+0\s+END|CAST\s*\([^()]*AS\s+(BIG)?INT(EGER)?\s*\))\s*\)', re.I)


def depth0_scan(sql):
    """Yield (index, char) at paren depth 0, skipping quoted strings."""
    depth, i, n = 0, 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            i += 1
            while i < n and not (sql[i] == "'" and (i + 1 >= n or sql[i+1] != "'")):
                i += 2 if sql[i] == "'" else 1
        elif c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
        elif depth == 0:
            yield i, c
        i += 1


def kw_bounded(text, i):
    """True when position i does not sit inside an identifier — SQL
    keywords matched at depth 0 must not fire on suffixes like the `from`
    in a `valid_from` alias (r14: that exact alias silently ejected q_scd2
    from the audit by truncating its select list)."""
    return i == 0 or not (text[i-1].isalnum() or text[i-1] == '_')


def find_final_select(sql):
    """Index just past the last depth-0 SELECT keyword, or None."""
    last = None
    for i, c in depth0_scan(sql):
        if c in 'sS' and kw_bounded(sql, i) and re.match(r'select\b', sql[i:i+7], re.I):
            last = i
    return last


def matching_paren(sql, open_idx):
    depth = 0
    i = open_idx
    while i < len(sql):
        if sql[i] == "'":
            i += 1
            while i < len(sql) and sql[i] != "'":
                i += 1
        elif sql[i] == '(':
            depth += 1
        elif sql[i] == ')':
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError('unbalanced parens')


def split_top_comma(s):
    parts, depth, start = [], 0, 0
    i = 0
    while i < len(s):
        c = s[i]
        if c == "'":
            i += 1
            while i < len(s) and s[i] != "'":
                i += 1
        elif c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
        elif c == ',' and depth == 0:
            parts.append(s[start:i]); start = i + 1
        i += 1
    parts.append(s[start:])
    return parts


def split_union_all(sql):
    """If sql is a depth-0 chain of UNION ALL branches (no EXCEPT/INTERSECT/
    plain UNION, whose row semantics are whole-branch-dependent), return the
    branch strings with any trailing depth-0 ORDER BY stripped; else None."""
    setops = []
    for i, c in depth0_scan(sql):
        if c in 'ueiUEI' and kw_bounded(sql, i):
            m = re.match(r'(union\s+all|union|except|intersect)\b', sql[i:], re.I)
            if m:
                setops.append((i, re.sub(r'\s+', '', m.group(0)).lower()))
    if not setops:
        return None
    if any(op != 'unionall' for _, op in setops):
        return None
    # strip one trailing depth-0 ORDER BY (it applies to the whole union)
    body = sql
    for i, c in depth0_scan(sql):
        if c in 'oO' and kw_bounded(sql, i) and re.match(r'order\s+by\b', sql[i:], re.I):
            body = sql[:i]
            break
    cuts = [i for i, _ in setops if i < len(body)]
    parts, prev = [], 0
    for i in cuts:
        parts.append(body[prev:i])
        prev = i + len(re.match(r'union\s+all', body[i:], re.I).group(0))
    parts.append(body[prev:])
    return parts


def audit_one(sql):
    """Return (rewritten_sql, n_margins, canon_flags, skip_reason)."""
    sel = find_final_select(sql)
    if sel is None:
        return None, 0, False, 'no depth-0 SELECT found'
    tail = sql[sel:]
    if any(kw_bounded(sql, i) and re.match(r'(union|except|intersect)\b', sql[i:i+10], re.I)
           for i, c in depth0_scan(sql) if c in 'ueiUEI'):
        # UNION ALL chains audit branch-by-branch: every branch is an
        # independent SELECT whose rows all reach the declared output
        branches = split_union_all(sql)
        if branches is None:
            return None, 0, False, 'depth-0 set operation (margin column would break branch arity)'
        # a round() in the union's trailing ORDER BY is stripped with it —
        # surface that instead of silently not auditing a sort round
        for i, c in depth0_scan(sql):
            if c in 'oO' and kw_bounded(sql, i) and re.match(r'order\s+by\b', sql[i:], re.I):
                if re.search(r'\bround\s*\(', sql[i:], re.I):
                    return None, 0, False, 'union final ORDER BY contains round() - unauditable per-branch'
                break
        # a WITH chain binds the WHOLE union: branches after the first lose
        # it when the text is cut at the UNION ALL keywords, so thread the
        # prefix into each of them (r14 — previously such branches failed
        # with 'Table ... does not exist' and the query read as skipped)
        chain = split_with_chain(sql)
        prefix = sql[:chain[1]] if chain else ''
        branches = [branches[0]] + [prefix + b for b in branches[1:]]
        wrapped, canon_rows = [], []
        cte_only = 0
        for b in branches:
            w, n, canon, reason = audit_one(b)
            if reason and reason.startswith('round(s) only inside CTEs'):
                # this branch selects already-rounded CTE columns and rounds
                # nothing itself — the CTE units audit those rounds, so the
                # branch contributes no margin columns (r14: previously the
                # whole union was declared unauditable over such a branch)
                cte_only += 1
                continue
            if reason:
                return None, 0, False, f'union-all branch unauditable: {reason}'
            if w is not None:
                wrapped.append((w, n, canon))
        if not wrapped:
            return (None, 0, False,
                    'round(s) only inside CTEs - keep final-select rounds auditable'
                    if cte_only else None)
        ncols = wrapped[0][1]
        if any(n != ncols for _, n, _ in wrapped):
            return None, 0, False, 'union-all branches disagree on round count'
        per = [f'SELECT * FROM ({w}) __b{k}' for k, (w, _, _) in enumerate(wrapped)]
        zsel = ', '.join(f'sum(neg{i}) AS neg{i}, sum(near{i}) AS near{i}'
                         for i in range(ncols))
        u = ' UNION ALL '.join(per)
        merged = f'SELECT min(min_margin) AS min_margin, {zsel} FROM ({u}) __u'
        # positional rounds are the same expression shape in each branch;
        # the merged flag is the AND (one non-canonicalized branch = exposed)
        canon = [all(c[i] for _, _, c in wrapped) for i in range(ncols)]
        return merged, ncols, canon, None
    m = re.match(r'select\s+(distinct\b)?', tail, re.I)
    if m.group(1):
        return None, 0, False, 'SELECT DISTINCT final'
    # select list = from end of SELECT keyword to the depth-0 FROM
    list_start = sel + m.end()
    from_idx = None
    for i, c in depth0_scan(sql[list_start:]):
        if c in 'fF' and kw_bounded(sql, list_start + i) and re.match(r'from\b', sql[list_start+i:list_start+i+5], re.I):
            from_idx = list_start + i
            break
    if from_idx is None:
        # a FROM-less final select (scalar-subquery report shape): the
        # select list runs to the depth-0 ORDER BY or end of string, and
        # margin columns append the same way — each is one more scalar expr
        from_idx = len(sql)
        for i, c in depth0_scan(sql[list_start:]):
            if c in 'oO' and kw_bounded(sql, list_start + i) and re.match(r'order\s+by\b', sql[list_start+i:], re.I):
                from_idx = list_start + i
                break
    select_list = sql[list_start:from_idx]

    # every round(expr, d) occurrence in the final select list OUTSIDE any
    # nested (SELECT ...) - a round inside a scalar subquery sees a
    # different FROM scope, so rewriting it there would mis-bind columns;
    # rounds inside plain function wrappers (coalesce, CASE, ...) are fine
    def inside_subquery(pos, text=None):
        text = select_list if text is None else text
        stack = []
        i = 0
        while i < pos:
            c = text[i]
            if c == "'":
                i += 1
                while i < len(text) and text[i] != "'":
                    i += 1
            elif c == '(':
                stack.append(i)
            elif c == ')':
                if stack:
                    stack.pop()
            i += 1
        return any(re.match(r'\s*select\b', text[p+1:], re.I) for p in stack)

    def parse_round(op):
        """(expr, d, close_paren) for a 1- or 2-arg literal-d round at
        open-paren op; None when unauditable (non-literal d, 3+ args).
        Single-arg round(x) is integer rounding: d = 0 (r15 — the cents
        pattern CAST(round(v*100) AS BIGINT) and the int8 quantizer
        round(x/m*127) were invisible to the audit before)."""
        cp = matching_paren(sql, op)
        args = split_top_comma(sql[op+1:cp])
        if len(args) == 1:
            expr, d = args[0].strip(), '0'
        elif len(args) == 2:
            expr, d = args[0].strip(), args[1].strip()
        else:
            return None
        if not re.fullmatch(r'\d+', d):
            return None
        return expr, d, cp

    def is_canon(cp):
        """A round is zero-canonicalized when followed by `+ 0.0` — or
        consumed by an integer CAST (`CAST(round(..) AS BIGINT)` /
        `round(..)::BIGINT`): integers carry no -0.0, so the sign bit is
        structurally dead (r15)."""
        after = sql[cp+1:]
        return bool(re.match(r'\s*\+\s*0\.0', after) or
                    re.match(r'\s*AS\s+(BIG|SMALL|TINY)?INT(EGER)?\b', after, re.I) or
                    re.match(r'\s*::\s*(BIG|SMALL|TINY)?INT(EGER)?\b', after, re.I))

    nested_rounds = 0
    margins = []   # inner margin exprs, positionally indexed with zcols
    zcols = []     # per-round signed-zero exposure probes (inner or outer)
    canon = []     # per-round: is this round zero-canonicalized?
    probes = []    # (index, mexpr, nexpr, iexpr) for WHERE rounds — these go
                   # in the OUTER select as standalone scalar subqueries so an
                   # EMPTY declared output cannot swallow them (r14 advisor)
    grouped = any(kw_bounded(sql, i) and re.match(r'group\s+by\b', sql[i:i+9], re.I)
                  for i, c in depth0_scan(sql[from_idx:]) for i in [i + from_idx] if c in 'gG')
    for rm in re.finditer(r'\bround\s*\(', select_list, re.I):
        if inside_subquery(rm.start()):
            nested_rounds += 1
            continue
        op = list_start + rm.end() - 1
        parsed = parse_round(op)
        if parsed is None:
            continue
        expr, d, cp = parsed
        canon.append(is_canon(cp))
        scale = f'1e{d}'
        mexpr = f'abs((({expr}) * {scale} - floor(({expr}) * {scale})) - 0.5) / {scale}'
        # can the pre-round value be negative at all (structural signed-zero
        # exposure), and does any value land in the actual divergence
        # interval (-0.5*10^-d, 0) today (near-miss, informational)?
        nexpr = f'CASE WHEN ({expr}) < 0 THEN 1 ELSE 0 END'
        iexpr = f'CASE WHEN ({expr}) < 0 AND ({expr}) > -0.5 / {scale} THEN 1 ELSE 0 END'
        # in a grouped final select, a margin over a non-aggregate expr
        # (e.g. a rounded GROUP BY key) must itself aggregate to bind
        if grouped and not ANY_AGG.search(expr):
            mexpr = f'min({mexpr})'
            nexpr = f'max({nexpr})'
            iexpr = f'max({iexpr})'
        margins.append(mexpr)
        zcols.append((nexpr, iexpr))
    # rounds in the final query's TAIL (WHERE / HAVING / ORDER BY) — a
    # rounded value compared to a threshold or driving a sort can flip a
    # row in/out of the declared output on a knife-edge exactly like an
    # output round flips a digit (r14; previously structurally invisible).
    # They never hash a sign bit, so the signed-zero gate does not apply
    # (canon forced true); margins audit as usual. Pre-aggregation rounds
    # (WHERE) in a grouped select aggregate their probe columns to bind.
    tail_text = sql[from_idx:]
    # locate the depth-0 WHERE span of the final query: a round inside it
    # decides output MEMBERSHIP, so its margin must be measured over the
    # UNFILTERED relation — measuring only surviving rows would hide a row
    # a knife-edge flips INTO the output (r14 reviewer finding). Rounds in
    # the WHERE get their probes as uncorrelated scalar subqueries over
    # the FROM clause alone; HAVING/ORDER rounds keep the declared
    # population (documented residual: LIMIT injection).
    where_span = None
    for i, c in depth0_scan(tail_text):
        if c in 'wW' and kw_bounded(tail_text, i) and re.match(r'where\b', tail_text[i:], re.I):
            end = len(tail_text)
            for j, c2 in depth0_scan(tail_text[i:]):
                if c2 in 'gGhHoOlLwW' and kw_bounded(tail_text, i + j) and re.match(
                        r'(group\s+by|having|order\s+by|limit|window)\b', tail_text[i+j:], re.I):
                    end = i + j
                    break
            where_span = (i, end)
            break
    from_clause = tail_text[:where_span[0]] if where_span else None
    for rm in re.finditer(r'\bround\s*\(', tail_text, re.I):
        if inside_subquery(rm.start(), tail_text):
            nested_rounds += 1
            continue
        op = from_idx + rm.end() - 1
        parsed = parse_round(op)
        if parsed is None:
            continue
        expr, d, cp = parsed
        # HAVING rounds already aggregate; WHERE/ORDER ones don't
        aggregated = bool(ANY_AGG.search(expr))
        scale = f'1e{d}'
        mexpr = f'abs((({expr}) * {scale} - floor(({expr}) * {scale})) - 0.5) / {scale}'
        nexpr = f'CASE WHEN ({expr}) < 0 THEN 1 ELSE 0 END'
        iexpr = f'CASE WHEN ({expr}) < 0 AND ({expr}) > -0.5 / {scale} THEN 1 ELSE 0 END'
        in_where = (where_span is not None and not aggregated and
                    where_span[0] <= rm.start() < where_span[1])
        if in_where:
            # a WHERE round decides output MEMBERSHIP: the failure mode is
            # a row whose PREDICATE outcome changes under summation-order
            # jitter, not any row near any rounding boundary (a flip that
            # leaves the predicate unchanged is harmless — e.g. a z-score
            # of 0.59845 flipping its 4th digit under an |z| > 2 filter).
            # Probe: evaluate the whole predicate with the round's argument
            # perturbed +jitter and -jitter over the UNFILTERED relation;
            # any row where the two outcomes differ is a genuine
            # membership knife-edge (margin 0.0 → gate fires); otherwise
            # this round contributes NULL (no gate, nothing to report).
            # The probe lives in the OUTER select, not the filtered select
            # list: riding the declared output meant an EMPTY output (or
            # one the flip would first have to inject a row into) silently
            # dropped the probe under min() over zero rows (r14 advisor).
            pred_start = where_span[0] + 5  # past the WHERE keyword
            pred = tail_text[pred_start:where_span[1]]
            occ = rm.start() - pred_start
            rend = (cp - from_idx) + 1 - pred_start
            pp = pred[:occ] + f'round(({expr}) + 1e-9, {d})' + pred[rend:]
            pm = pred[:occ] + f'round(({expr}) - 1e-9, {d})' + pred[rend:]
            pmex = (f'(SELECT CASE WHEN max(CASE WHEN ({pp}) IS DISTINCT FROM ({pm}) '
                    f'THEN 1 ELSE 0 END) = 1 THEN 0.0 END {from_clause})')
            pnex = f'(SELECT max({nexpr}) {from_clause})'
            piex = f'(SELECT max({iexpr}) {from_clause})'
            canon.append(True)  # filter rounds never hash a zero's sign
            probes.append((len(canon) - 1, pmex, pnex, piex))
            continue
        elif grouped and not aggregated:
            mexpr = f'min({mexpr})'
            nexpr = f'max({nexpr})'
            iexpr = f'max({iexpr})'
        canon.append(True)  # sort/having rounds never hash a zero's sign
        margins.append(mexpr)
        zcols.append((nexpr, iexpr))
    if not margins and not probes:
        if nested_rounds:
            return None, 0, [], f'{nested_rounds} round(s) only in nested subqueries of the final select'
        # the caller pre-filters on round( calls in the SQL, so reaching
        # here means every round lives inside a CTE: report it as a SKIP,
        # never silently - a query dropping out of the audit because its
        # rounds moved into a CTE (r14 reviewer finding: the fused-rrf and
        # whiten refactors did exactly this) would otherwise read as
        # audited. The CTE units cover such rounds; main suppresses this
        # skip when they exist.
        return None, 0, [], 'round(s) only inside CTEs - keep final-select rounds auditable'
    # the wrapper hoists the WITH prefix OUT of the derived table so the
    # outer select (where the WHERE probes live as standalone, evaluated-
    # exactly-once scalar subqueries) still sees the chain's CTEs in scope
    prefix = sql[:sel]
    n_inner = len(margins)
    total = len(canon)
    # positional output contract: row = (min_margin, neg0, near0, neg1, ...)
    # inner rounds map to riding columns, probe rounds to outer subqueries
    inner_ids, probe_at = [], {idx: (m, n, x) for idx, m, n, x in probes}
    k = 0
    for i in range(total):
        if i not in probe_at:
            inner_ids.append(k)
            k += 1
        else:
            inner_ids.append(None)
    zsel_parts = []
    for i in range(total):
        if inner_ids[i] is not None:
            j = inner_ids[i]
            zsel_parts.append(f'sum(__zn{j}) AS neg{i}, sum(__zi{j}) AS near{i}')
        else:
            _, n, x = probe_at[i]
            zsel_parts.append(f'{n} AS neg{i}, {x} AS near{i}')
    zsel = ', '.join(zsel_parts)
    probe_margins = [m for _, m, _, _ in probes]
    if n_inner:
        mcols = ', '.join(f'{m} AS __m{j}' for j, m in enumerate(margins))
        mcols += ', ' + ', '.join(f'{n} AS __zn{j}, {x} AS __zi{j}'
                                  for j, (n, x) in enumerate(zcols))
        final_text = sql[sel:from_idx].rstrip()
        if final_text.endswith(','):
            final_text = final_text[:-1]
        rewritten = final_text + ', ' + mcols + ' ' + sql[from_idx:]
        inner_min = 'least(' + ', '.join(f'__m{j}' for j in range(n_inner)) + ')' \
            if n_inner > 1 else '__m0'
        parts = [f'min({inner_min})'] + probe_margins
        # DuckDB least() ignores NULLs, so a NULL inner min (empty declared
        # output) or a NULL probe (no membership flip) drops out cleanly
        mfinal = 'least(' + ', '.join(parts) + ')' if len(parts) > 1 else parts[0]
        wrapped = f'{prefix}SELECT {mfinal} AS min_margin, {zsel} FROM ({rewritten}) __t'
    else:
        # only WHERE probes: no column rides the declared output, so the
        # wrapper needs no derived table at all — a FROM-less outer select
        # of the standalone probe subqueries (rows or no rows in the output)
        mfinal = 'least(' + ', '.join(probe_margins) + ')' \
            if len(probe_margins) > 1 else probe_margins[0]
        wrapped = f'{prefix}SELECT {mfinal} AS min_margin, {zsel}'
    return wrapped, total, canon, None


def split_with_chain(sql):
    """Parse a depth-0 WITH chain. Returns (ctes, final_start) where ctes is
    a list of (name, body, def_end_index) in definition order and
    final_start is the index where the final query begins — or None when
    the SQL has no WITH chain (or one this parser can't shape)."""
    m = re.match(r'\s*with\s+(recursive\s+)?', sql, re.I)
    if not m:
        return None
    pos = m.end()
    ctes = []
    while True:
        dm = re.match(r'\s*([A-Za-z_][A-Za-z0-9_]*)\s*(\([^()]*\))?\s+as\s+(materialized\s+)?\(',
                      sql[pos:], re.I)
        if not dm:
            return None
        op = pos + dm.end() - 1
        try:
            cp = matching_paren(sql, op)
        except ValueError:
            return None
        ctes.append((dm.group(1), sql[op+1:cp], cp + 1))
        nxt = cp + 1
        while nxt < len(sql) and sql[nxt].isspace():
            nxt += 1
        if nxt < len(sql) and sql[nxt] == ',':
            pos = nxt + 1
        else:
            return ctes, nxt


def cte_audit_units(name, sql):
    """Audit units for every round()-bearing CTE body (r14: rounds inside
    CTEs — e.g. q_knn_join's cos, q_zscore's z — reach the declared output
    or its filters/ordering exactly like final-select rounds, and were
    structurally invisible to this audit until now). Each unit replays the
    chain prefix and promotes the CTE body to the final select, so the
    existing rewriter audits it unchanged. Self-referencing (recursive)
    bodies are reported as skips — the promoted body would dangle.
    Returns (units, skips): units = [(label, synthesized_sql)]."""
    chain = split_with_chain(sql)
    if chain is None:
        # distinguish "no WITH chain" (nothing to do) from "WITH chain the
        # parser can't shape" (silent CTE non-coverage — forbidden): the
        # latter must surface as a skip
        if re.match(r'\s*with\b', sql, re.I):
            return [], [(f'{name}[ctes]',
                         'WITH chain unparseable - CTE rounds unaudited')]
        return [], []
    ctes, _ = chain
    units, skips = [], []
    for k, (cname, body, _) in enumerate(ctes):
        if not HAS_ROUND.search(body):
            continue
        if re.search(rf'\b(from|join)\s+{re.escape(cname)}\b', body, re.I):
            skips.append((f'{name}[cte:{cname}]',
                          'self-referencing (recursive) CTE body'))
            continue
        if re.match(r'\s*with\b', body, re.I) and k > 0:
            # splice the inner chain into the outer prefix (r15): the body
            # `WITH t AS (...) SELECT ...` becomes `, t AS (...) SELECT ...`
            # appended after the k-1'th outer CTE — one flat chain the
            # rewriter audits like any other. Guarded against RECURSIVE
            # (the keyword would be lost) and name shadowing (an inner CTE
            # named like an outer one would rebind the prefix).
            if re.match(r'\s*with\s+recursive\b', body, re.I):
                skips.append((f'{name}[cte:{cname}]',
                              'CTE body carries a RECURSIVE WITH chain'))
                continue
            inner = split_with_chain(body)
            if inner is None:
                skips.append((f'{name}[cte:{cname}]',
                              'CTE body carries an unparseable WITH chain'))
                continue
            outer_names = {c[0].lower() for c in ctes[:k]}
            if any(n.lower() in outer_names for n, _, _ in inner[0]):
                skips.append((f'{name}[cte:{cname}]',
                              'inner WITH chain shadows an outer CTE name'))
                continue
            synth = sql[:ctes[k-1][2]] + re.sub(r'^\s*with\s+', ', ', body,
                                                count=1, flags=re.I)
            units.append((f'{name}[cte:{cname}]', synth))
            continue
        synth = body if k == 0 else sql[:ctes[k-1][2]] + ' ' + body
        units.append((f'{name}[cte:{cname}]', synth))
    return units, skips


def subquery_audit_units(label, sql):
    """Audit units for round()-bearing NESTED SUBQUERIES of a unit's final
    query (r15 — closing the last structural blindness: a round inside a
    scalar subquery or derived table was SKIPPED when it was the unit's
    only round, and silently UNCOUNTED when the unit also had auditable
    rounds). Each nested `(SELECT ...)` span containing a round( call is
    promoted to its own unit: the unit's WITH prefix + the subquery body.
    Correlated subqueries (outer-scope column references) fail to execute
    standalone and surface through main's 'rewritten SQL failed' skip —
    loud, never silent. One nesting level (matching every current oracle);
    a deeper round would surface as this unit's own nested-round skip."""
    sel = find_final_select(sql)
    if sel is None:
        return []
    prefix = sql[:sel]
    final = sql[sel:]
    units = []
    k = 0
    i = 0
    while i < len(final):
        c = final[i]
        if c == "'":
            i += 1
            while i < len(final) and final[i] != "'":
                i += 1
        elif c == '(' and re.match(r'\s*select\b', final[i+1:], re.I):
            try:
                cp = matching_paren(final, i)
            except ValueError:
                break
            body = final[i+1:cp]
            if HAS_ROUND.search(body):
                units.append((f'{label}[sub:{k}]', prefix + body))
                k += 1
            i = cp
        i += 1
    return units


def classify(sql):
    """True if any final-select round arg contains a float aggregate."""
    sel = find_final_select(sql)
    if sel is None:
        return False
    for rm in re.finditer(r'\bround\s*\(', sql[sel:], re.I):
        op = sel + rm.end() - 1
        try:
            cp = matching_paren(sql, op)
        except ValueError:
            continue
        args = split_top_comma(sql[op+1:cp])
        if len(args) in (1, 2) and FLOAT_AGG.search(args[0]) \
                and not INT_BACKED.fullmatch(args[0].strip()):
            return True
    return False


def selftest():
    """Machine-check the audit machinery on planted fixtures (the
    tools_check --selftest discipline): each case is a structural behavior
    a silent regression of which would reopen a closed blindness class."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1, -0.00001), (2, 3.5)) v(k, x)")

    # 1. a CTE round over a negative-capable column without + 0.0 must
    #    surface as an audit unit whose canon flag is False and whose
    #    exposure probe fires (the r14 q_knn_join class)
    sql1 = "WITH c AS (SELECT k, round(x, 4) AS r FROM t) SELECT k, r FROM c ORDER BY k"
    units, skips = cte_audit_units('q_t1', sql1)
    assert len(units) == 1 and not skips, (units, skips)
    w, n, canon, reason = audit_one(units[0][1])
    assert w is not None and n == 1 and canon == [False], (n, canon, reason)
    row = con.execute(w).fetchone()
    assert row[1] >= 1, f'exposure probe did not fire: {row}'
    # and the final select (no own rounds, CTE units exist) is not a gap
    wf, nf, _, rf = audit_one(sql1)
    assert wf is None and rf and rf.startswith('round(s) only inside CTEs'), rf

    # 2. an alias ending in a keyword (valid_FROM) must not truncate the
    #    select list (the r14 q_scd2 parser finding)
    sql2 = "SELECT k, round(x, 2) AS price, 'a' AS valid_from FROM t ORDER BY k"
    w2, n2, _, r2 = audit_one(sql2)
    assert w2 is not None and n2 == 1, (n2, r2)
    con.execute(w2).fetchone()  # must parse and run

    # 3. union branches after the first must inherit the WITH prefix
    sql3 = ("WITH c AS (SELECT k, x FROM t) "
            "SELECT k, round(x, 2) + 0.0 AS r FROM c UNION ALL "
            "SELECT k, round(x, 2) + 0.0 AS r FROM c ORDER BY k")
    w3, n3, canon3, r3 = audit_one(sql3)
    assert w3 is not None and n3 == 1 and canon3 == [True], (n3, canon3, r3)
    con.execute(w3).fetchone()

    # 4. a WHERE-clause round gates on MEMBERSHIP flips, not raw boundary
    #    proximity: here no row's predicate outcome can change under
    #    +/-jitter, so the round contributes NULL (no gate)
    sql4 = "SELECT k, x FROM t WHERE round(x, 2) > -1 ORDER BY k"
    w4, n4, canon4, r4 = audit_one(sql4)
    assert w4 is not None and n4 == 1 and canon4 == [True], (n4, canon4, r4)
    assert con.execute(w4).fetchone()[0] is None

    # 4b. a planted membership knife-edge MUST fire: x = 1.005 sits on the
    #     round-2 half boundary AND its two rounded candidates straddle the
    #     threshold (1.0 > 1.0 is false, 1.01 > 1.0 is true) — note the row
    #     is EXCLUDED from today's output either way on one side, which is
    #     exactly the injection case the unfiltered probe exists to see
    con.execute("CREATE TABLE ft AS SELECT * FROM (VALUES (1, 1.005), (2, 9.0)) v(k, x)")
    sql4b = "SELECT k FROM ft WHERE round(x, 2) > 1.0 ORDER BY k"
    w4b, n4b, _, _ = audit_one(sql4b)
    m4b = con.execute(w4b).fetchone()[0]
    assert m4b is not None and m4b <= JITTER, f'membership knife-edge not detected: {m4b}'

    # 5. negative control: a planted knife-edge must measure as one —
    #    x = 0.005 sits EXACTLY on the round-2 half boundary
    con.execute("CREATE TABLE kt AS SELECT 0.005::DOUBLE AS x")
    w5, n5, _, _ = audit_one("SELECT round(x, 2) + 0.0 AS r FROM kt")
    m5 = con.execute(w5).fetchone()[0]
    assert m5 is not None and m5 <= JITTER, f'planted boundary not detected: {m5}'

    # 6. (r15) a WHERE-round membership flip must fire even when the
    #    declared output is EMPTY — the injected row IS the failure mode
    #    the probe exists for, and the old riding placement aggregated
    #    zero rows and returned NULL (r14 advisor finding)
    con.execute("CREATE TABLE et AS SELECT 1 AS k, 1.005::DOUBLE AS x")
    sql6 = "SELECT k FROM et WHERE round(x, 2) > 1.0 ORDER BY k"
    w6, n6, _, _ = audit_one(sql6)
    assert con.execute(sql6).fetchall() == [], 'case-6 fixture must be empty'
    m6 = con.execute(w6).fetchone()[0]
    assert m6 is not None and m6 <= JITTER, f'empty-output membership flip lost: {m6}'

    # 7. (r15) single-arg round(x) audits as d=0, and an integer CAST
    #    counts as zero canonicalization (integers carry no -0.0): the
    #    cents pattern CAST(round(v*100) AS BIGINT) over negative-capable
    #    v must audit clean, while a bare round(v*100) must stay exposed
    sql7 = "SELECT k, CAST(round(x * 100) AS BIGINT) AS cents FROM t ORDER BY k"
    w7, n7, canon7, r7 = audit_one(sql7)
    assert w7 is not None and n7 == 1 and canon7 == [True], (n7, canon7, r7)
    row7 = con.execute(w7).fetchone()
    assert row7[1] >= 1, f'd=0 negative probe did not fire: {row7}'
    w7b, n7b, canon7b, _ = audit_one("SELECT k, round(x * 100) AS c FROM t ORDER BY k")
    assert n7b == 1 and canon7b == [False], (n7b, canon7b)

    # 8. (r15) a CTE body carrying its own WITH chain splices into the
    #    outer prefix and audits (previously a hard skip class)
    sql8 = ("WITH a AS (SELECT k, x FROM t), "
            "b AS (WITH i AS (SELECT k, x * 2 AS y FROM a) "
            "SELECT k, round(y, 2) + 0.0 AS r FROM i) "
            "SELECT k, r FROM b ORDER BY k")
    units8, skips8 = cte_audit_units('q_t8', sql8)
    assert len(units8) == 1 and not skips8, (units8, skips8)
    w8, n8, canon8, r8 = audit_one(units8[0][1])
    assert w8 is not None and n8 == 1 and canon8 == [True], (n8, canon8, r8)
    con.execute(w8).fetchone()  # must parse and run

    # 9. (r15) a column merely ALIASED `round` is not a round call: the
    #    pre-filter must not drag a round-free oracle into the audit
    #    (q_kcore read as an unauditable skip for two rounds)
    assert not HAS_ROUND.search("SELECT CAST(0 AS BIGINT) AS round FROM t ORDER BY round")
    assert HAS_ROUND.search("SELECT round (x, 2) FROM t")

    # 10. (r15) a round inside a NESTED SCALAR SUBQUERY next to an
    #     auditable final round — previously silently uncounted (the skip
    #     only fired when nested rounds were the unit's ONLY rounds) —
    #     must surface as a promoted [sub:k] unit, and a signed-zero
    #     exposure inside it must fire
    sql10 = ("SELECT k, round(x, 2) + 0.0 AS r, "
             "(SELECT round(min(x), 2) FROM t) AS m FROM t ORDER BY k")
    wf10, n10, _, _ = audit_one(sql10)
    assert wf10 is not None and n10 == 1, 'parent must audit only its own round'
    subs10 = subquery_audit_units('q_t10', sql10)
    assert len(subs10) == 1 and subs10[0][0] == 'q_t10[sub:0]', subs10
    w10, n10s, canon10, _ = audit_one(subs10[0][1])
    assert n10s == 1 and canon10 == [False], (n10s, canon10)
    row10 = con.execute(w10).fetchone()
    assert row10[1] >= 1, f'nested-subquery exposure did not fire: {row10}'

    # 11. (r15) a round inside a DERIVED TABLE promotes the same way, and
    #     the WITH prefix threads into the promoted unit
    sql11 = ("WITH c AS (SELECT k, x FROM t) "
             "SELECT s FROM (SELECT round(x, 3) + 0.0 AS s FROM c) d ORDER BY s")
    subs11 = subquery_audit_units('q_t11', sql11)
    assert len(subs11) == 1, subs11
    w11, n11, canon11, _ = audit_one(subs11[0][1])
    assert w11 is not None and n11 == 1 and canon11 == [True], (n11, canon11)
    con.execute(w11).fetchone()  # must parse and run (prefix in scope)

    print('tools_margin selftest: 12/12 structural cases OK')


def main():
    if '--selftest' in sys.argv:
        selftest()
        sys.exit(0)
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    vdir = sys.argv[2] if len(sys.argv) > 2 else 'target/verify'
    con = duckdb.connect()
    for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
              'lineitem', 'events', 'documents', 'embeddings']:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(f'{vdir}/oracle_sql.json'))
    failures, zero_failures, skipped, audited = [], [], [], 0
    for name, sql in sorted(oracles.items()):
        if not HAS_ROUND.search(sql):
            continue
        # r14: audit EVERY round in the oracle — the final select (as
        # always) plus one unit per round-bearing CTE body (promoted to a
        # final select over its chain prefix). CTE rounds reach the
        # declared output or its filters/ordering just like final ones;
        # they were structurally invisible to this audit before.
        cte_units, cte_skips = cte_audit_units(name, sql)
        skipped.extend(cte_skips)
        units = [(name, sql, True)] + [(l, u, False) for l, u in cte_units]
        # r15: promote round()-bearing nested subqueries of every unit to
        # their own units — previously such rounds were a visible skip when
        # they were a unit's ONLY rounds and silently uncounted otherwise
        sub_map = {label: subquery_audit_units(label, usql)
                   for label, usql, _ in units}
        units += [(l, u, False) for subs in sub_map.values() for l, u in subs]
        for label, usql, is_final in units:
            wrapped, n, canon, reason = audit_one(usql)
            if wrapped is None:
                # a final select whose rounds all live in CTEs is fully
                # covered by the CTE units — not a coverage gap; same for
                # nested-subquery rounds covered by promoted sub units
                # reason may be None (e.g. audit_one's cte-only union path);
                # guard before the string probes (r15 advisor finding)
                covered = bool(reason) and (
                    (is_final and cte_units and
                     reason.startswith('round(s) only inside CTEs')) or
                    (bool(sub_map.get(label)) and
                     'nested subqueries' in reason))
                if reason and not covered:
                    skipped.append((label, reason))
                continue
            try:
                row = con.execute(wrapped).fetchone()
            except Exception as e:
                skipped.append((label, f'rewritten SQL failed: {str(e)[:120]}'))
                continue
            margin = row[0]
            audited += 1
            order_dep = classify(usql) or name in FORCE_ORDER_DEP
            tag = 'ORDER-DEP' if order_dep else 'exact/int'
            # exactness arguments are reviewed for the FINAL select only —
            # a name-scoped exemption must not silently waive the gate for
            # every CTE round of that query (r14 reviewer finding); CTE
            # units needing an exemption get their own EXACT_BACKED_UNITS
            # row under the full label
            if (is_final and name in EXACT_BACKED) or label in EXACT_BACKED_UNITS:
                tag = 'EXACT_BACKED'
            status = 'ok'
            if margin is not None and tag == 'ORDER-DEP':
                floor = THIN_MARGIN_REVIEWED.get(name, JITTER) if is_final else JITTER
                if margin <= floor:
                    status = 'KNIFE-EDGE'
                    failures.append((label, margin))
                elif is_final and name in THIN_MARGIN_REVIEWED:
                    status = 'thin-margin-reviewed'
            # signed-zero exposure: a round whose input can be negative must
            # be zero-canonicalized (`+ 0.0`) or a fixture shift can flip a
            # 0.0 cell's sign between engines (the r12 cov failure class).
            # Applied to CTE rounds too (blanket policy: `+ 0.0` is free and
            # semantics-neutral, so no reachability analysis is needed).
            zbits = []
            for i in range(n):
                neg, near = row[1 + 2 * i], row[2 + 2 * i]
                if neg and not canon[i]:
                    zero_failures.append((label, i, int(neg), int(near or 0)))
                    zbits.append(f'round#{i} SIGNED-ZERO-EXPOSED neg={int(neg)} near={int(near or 0)}')
                elif neg:
                    zbits.append(f'round#{i} neg={int(neg)} canonicalized')
            zinfo = (' | ' + '; '.join(zbits)) if zbits else ''
            print(f'{label}: min_margin={margin!r} rounds={n} [{tag}] {status}{zinfo}')
    print('---')
    for name, reason in skipped:
        print(f'SKIPPED {name}: {reason}')
    print(f'audited {audited} queries; {len(skipped)} skipped; '
          f'{len(failures)} knife-edges: {[f[0] for f in failures]}; '
          f'{len(zero_failures)} signed-zero exposures: '
          f'{sorted(set(z[0] for z in zero_failures))}')
    sys.exit(1 if failures or zero_failures else 0)


if __name__ == '__main__':
    main()
