"""Scalar/array expression builders (SURVEY.md §2.7, ops F3-F9).

Each builder returns SQL text. ``index_base`` parameterizes array indexing
(Spark SQL brackets are 0-based, DuckDB lists are 1-based) so the *same
arithmetic in the same order* runs on both engines — additions are
left-associative in both parsers, all math in double, hence bit-identical
results for the driver's value-hash comparison.

The reference computes these with torch (`loc2vec_nn.py:120-151`,
`trainset_validation.py:71-77`); here they are Catalyst expression trees.
"""

from __future__ import annotations

SPARK_BASE = 0   # spark SQL a[i] is 0-based
DUCKDB_BASE = 1  # duckdb l[i] is 1-based


def md5_id_sql(expr: str, base: int, hex_chars: int = 12) -> str:
    """Portable deterministic string -> int64 id via md5 prefix.

    Replaces global ``DENSE_RANK() OVER (ORDER BY tok)`` vocabulary ids:
    a rank id needs a single-task global sort over the vocabulary (never
    survives 10^12-row scale), a hash id is embarrassingly parallel. Both
    engines produce the same lowercase md5 hex, so the derived int64 is
    identical. ``hex_chars`` <= 15 keeps the value positive in int64
    (default 48 bits; callers doing modular arithmetic reduce further).
    """
    if base == SPARK_BASE:
        return (f"CAST(conv(substring(md5({expr}), 1, {hex_chars}), 16, 10) "
                f"AS BIGINT)")
    return f"CAST(('0x' || substr(md5({expr}), 1, {hex_chars})) AS BIGINT)"


def xor_sql(a: str, b: str, base: int) -> str:
    """Portable bitwise XOR: Spark spells it ``^`` (DuckDB's ``^`` is
    POWER — the classic silent-divergence trap), DuckDB spells it
    ``xor(a, b)``."""
    if base == SPARK_BASE:
        return f"(({a}) ^ ({b}))"
    return f"xor(({a}), ({b}))"


def shl_sql(a: str, n: str, base: int) -> str:
    """Portable left shift: Spark ``shiftleft`` (its ``<<`` only landed
    in 4.0 and takes INT), DuckDB infix ``<<``."""
    if base == SPARK_BASE:
        return f"shiftleft(CAST({a} AS INT), CAST({n} AS INT))"
    return f"(({a}) << ({n}))"


def morton_sql(i_expr: str, j_expr: str, bits: int) -> str:
    """Z-order (Morton) interleave of two non-negative ``bits``-wide ints
    as ONE shared arithmetic expression (no engine-specific bit ops:
    FLOOR-division and modulo extract each bit, multiplication places
    it). 2*bits terms — whole-stage codegen keeps this cheap; the engine
    uses it to co-locate spatially-near cells in file order so min/max
    stats prune 2-D range predicates (storage.zorder_by)."""
    terms = []
    for b in range(bits):
        terms.append(f"(CAST(FLOOR(({i_expr}) / {float(1 << b):.1f}E0) "
                     f"AS BIGINT) % 2) * {1 << (2 * b + 1)}")
        terms.append(f"(CAST(FLOOR(({j_expr}) / {float(1 << b):.1f}E0) "
                     f"AS BIGINT) % 2) * {1 << (2 * b)}")
    return "(" + " + ".join(terms) + ")"


def _terms(a: str, b: str, dim: int, base: int, op: str) -> list[str]:
    out = []
    for i in range(dim):
        xa = f"CAST({a}[{i + base}] AS DOUBLE)"
        xb = f"CAST({b}[{i + base}] AS DOUBLE)"
        if op == "sqdiff":
            # (x-y)*(x-y), NOT POW(x-y, 2): POW blocks whole-stage codegen
            # in Spark (measured 15x slower on the kNN hot path); the same
            # text runs in DuckDB so both engines change together
            out.append(f"(({xa} - {xb}) * ({xa} - {xb}))")
        elif op == "prod":
            out.append(f"({xa} * {xb})")
        elif op == "sq_a":
            out.append(f"({xa} * {xa})")
        elif op == "sq_b":
            out.append(f"({xb} * {xb})")
    return out


def euclid_sql(a: str, b: str, dim: int, base: int) -> str:
    """F3 — Euclidean distance between two fixed-dim array columns.

    Reference: ``F.pairwise_distance`` at `loc2vec_nn.py:138-140`,
    `triplet_mining.py:113`.
    """
    return f"SQRT({' + '.join(_terms(a, b, dim, base, 'sqdiff'))})"


def cosine_sql(a: str, b: str, dim: int, base: int) -> str:
    """F7 — cosine similarity (reference `trainset_validation.py:71-77`)."""
    dot = " + ".join(_terms(a, b, dim, base, "prod"))
    na = " + ".join(_terms(a, b, dim, base, "sq_a"))
    nb = " + ".join(_terms(a, b, dim, base, "sq_b"))
    return f"(({dot}) / (SQRT({na}) * SQRT({nb})))"


def dot_sql(a: str, b: str, dim: int, base: int) -> str:
    return f"({' + '.join(_terms(a, b, dim, base, 'prod'))})"


def norm_sql(a: str, dim: int, base: int) -> str:
    return f"SQRT({' + '.join(_terms(a, a, dim, base, 'sq_a'))})"


def triplet_margin_sql(d_ip: str, d_in: str, d_pn: str,
                       margin: float = 1.0) -> str:
    """F4+F5+F6 — the reference's triplet loss as one expression tree:
    ``max(0, d(i,p) - min(d(i,n), d(p,n)) + margin)``
    (`loc2vec_nn.py:138-142`: pairwise distances, torch.min, relu)."""
    return (f"GREATEST(CAST(0.0 AS DOUBLE), ({d_ip}) - "
            f"LEAST(({d_in}), ({d_pn})) + CAST({margin} AS DOUBLE))")


def array_var_sql(a: str, dim: int, base: int) -> str:
    """F9 — population variance of a fixed-dim array column (rowwise).

    Reference `triplet_mining.py:116-124` (including its `len*sample` typo,
    which we do NOT reproduce — documented divergence, SURVEY.md §5.1).
    """
    s1 = " + ".join(f"CAST({a}[{i + base}] AS DOUBLE)" for i in range(dim))
    s2 = " + ".join(f"(CAST({a}[{i + base}] AS DOUBLE) "
                    f"* CAST({a}[{i + base}] AS DOUBLE))"
                    for i in range(dim))
    # E[x^2] - E[x]^2 (one pass; multiplication, not POW — codegen)
    return (f"((({s2}) / {dim}) - ((({s1}) / {dim}) * (({s1}) / {dim})))")
