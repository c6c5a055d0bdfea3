"""Deterministic cross-engine math: SQL expression recipes whose
results are BIT-IDENTICAL on Spark (JVM) and DuckDB (libm).

The engine's oracle gate hashes query outputs across two engines, and
the one hard fact the DSIR round established (sampling.py round-8) is
that transcendental functions disagree between JVM ``Math.log`` and
libm ``ln`` in the last ulp on ~2-5% of arguments. The round-8 recipe
sidesteps ln by computing it driver-side over a BOUNDED table (the
4096-bucket codebook pattern). That does not extend to PER-ROW
transcendentals — Gumbel-top-k resampling needs ``-ln(-ln(u))`` of a
per-document uniform, corpus-sized by definition.

This module extends the recipe book: a fixed-precision ``ln`` built
ONLY from IEEE-754 double ``+ - * /`` and comparisons, every one of
which is CORRECTLY ROUNDED by the standard and therefore identical on
any conforming engine. Both engines evaluate the exact same expression
text, so the result is bit-identical by construction — no shared libm
required.

Algorithm (``detln_steps``): for x in [2^-60, 2^20]
  1. e = the exponent with m = x * 2^-e in [1/sqrt(2), sqrt(2)), via a
     67-branch comparison CASE against literal branch boundaries
     (Python ``repr`` doubles; both engines' literal parsers are
     correctly rounded). CENTERED reduction matters: with m in [1,2)
     the series error peaks exactly where x is just below a power of
     two — including u just below 1, whose E = -ln(u) is tiny, so an
     absolute error there explodes RELATIVELY (measured 1.4e-3 in the
     Gumbel tail); centering puts z -> 0 there instead,
  2. m  = x * 2^-e  (exact: multiplication by a power of two),
  3. ln(m) by the atanh series with z = (m-1)/(m+1), |z| <= 0.1716,
     Horner to z^13 (truncation < 1e-12; the DETERMINISM is exact,
     the approximation error is shared),
  4. ln(x) = series + e * ln2 (one int->double cast, one multiply,
     one add — all correctly rounded).

Accuracy is ~1e-12 relative-to-m plus correctly-rounded assembly —
noise-grade, NOT a general math library. Range covers the module's
consumers: Gumbel uniforms u = (2h+1)/2^53 in [2^-53, 1) and
exponentials E = -ln(u) in (~1.1e-16, 37], and entropy's per-type
token counts up to 2^20.

The generated text uses only shared SQL: CASE/WHEN, comparisons,
arithmetic, CAST(... AS DOUBLE). Spark consumes it via ``F.expr``,
DuckDB verbatim — see ``apply_steps_spark`` / ``wrap_steps_sql``.
"""

from __future__ import annotations

import math

#: repr of the correctly-rounded double nearest ln(2); both engines'
#: literal parsers reproduce the identical bits.
LN2 = repr(math.log(2.0))

_E_HI, _E_LO = 20, -60  # supported x range: [2^-60, 2^20]


def detln_steps(x_col: str, out_col: str) -> list[tuple[str, str]]:
    """[(column_name, sql_text)] steps computing ``out_col`` =
    deterministic ln(``x_col``) for x in [2^-60, 2^20] (the high end
    covers per-type token counts for entropy; the low end covers
    53-bit hash uniforms). Each step may reference previous steps'
    columns; apply in order (helpers below). Out-of-range x clamps to
    the nearest exponent branch — still deterministic, just less
    accurate; callers keep x in range."""
    p = f"{out_col}__"
    rsqrt2 = math.sqrt(0.5)
    e_branches = " ".join(
        f"WHEN {x_col} >= {repr(2.0 ** k * rsqrt2)} THEN {k}"
        for k in range(_E_HI, _E_LO, -1)
    )
    e_sql = f"(CASE {e_branches} ELSE {_E_LO} END)"
    m_branches = " ".join(
        f"WHEN {k} THEN {x_col} * {repr(2.0 ** -k)}"
        for k in range(_E_HI, _E_LO - 1, -1)
    )
    m_sql = f"(CASE {p}e {m_branches} END)"
    z_sql = f"(({p}m - 1.0) / ({p}m + 1.0))"
    zz_sql = f"({p}z * {p}z)"
    # 2*atanh(z) by Horner; coefficients are exact doubles of 2/(2j+1)
    c = [repr(2.0 / (2 * j + 1)) for j in range(7)]
    horner = c[-1]
    for cj in reversed(c[:-1]):
        horner = f"{cj} + {p}zz * ({horner})"
    ln_sql = f"({p}z * ({horner}) + CAST({p}e AS DOUBLE) * {LN2})"
    return [
        (f"{p}e", e_sql),
        (f"{p}m", m_sql),
        (f"{p}z", z_sql),
        (f"{p}zz", zz_sql),
        (out_col, ln_sql),
    ]


def apply_steps_spark(df, steps):
    """Apply [(name, sql)] steps as withColumn(F.expr) in order."""
    from pyspark.sql import functions as F

    for name, sql in steps:
        df = df.withColumn(name, F.expr(sql))
    return df


def wrap_steps_sql(inner: str, steps) -> str:
    """Wrap a SQL relation in one nested SELECT per step — the DuckDB
    twin of apply_steps_spark, same expression text verbatim."""
    out = f"({inner})"
    for name, sql in steps:
        out = f"(SELECT *, {sql} AS {name} FROM {out})"
    return out


def gumbel_steps(u_col: str, out_col: str) -> list[tuple[str, str]]:
    """Steps for ``out_col`` = -ln(-ln(u)) — standard Gumbel(0,1)
    noise from a uniform ``u_col`` in (0, 1), both ln's deterministic.
    E = -ln(u) lands in (~1.1e-16, 37] for u derived from 53-bit
    hashes, inside detln's range."""
    steps = detln_steps(u_col, f"{out_col}__lnu")
    steps.append((f"{out_col}__E", f"(0.0 - {out_col}__lnu)"))
    steps += detln_steps(f"{out_col}__E", f"{out_col}__lnE")
    steps.append((out_col, f"(0.0 - {out_col}__lnE)"))
    return steps
