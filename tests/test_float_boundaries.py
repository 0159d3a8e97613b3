"""Pure-Python boundary pins for every float-adjacent integer
threshold in the repo (VERDICT r8 item 4).

The h02 rank bug class is invisible to the DuckDB oracle: both engines
make the IDENTICAL IEEE error (e.g. ceil(0.07·100) =
ceil(7.000000000000001) = 8, a full rank high — host-verified in the
assertions below), so rows+schema+hash all match while both are
wrong. The fix was integer cross-multiplication on BOTH sides;
these tests pin each remaining float-adjacent site against exact
rational arithmetic (fractions.Fraction — the g03 pure-simulator
pattern), so the class cannot regress silently.

Audited sites (VERDICT r8 "What's wrong" #3):
- operators/quantiles.py _RANK_SQL — the fixed site; pinned here
  against Fraction-exact ceil over a dense (q, N) grid including the
  exact-integer boundaries that triggered the bug.
- operators/text.py chunk_documents n_chunks — ceil of an exact-
  integer division; IEEE division of exact small ints is correctly
  rounded and cannot cross an integer boundary, pinned at exact
  stride multiples.
- queries/curation_ext.py _synth_multiline n_lines (ceil(len/8.0))
  and the T15 oracle's ceil((len-overlap)/stride.0) — same class,
  pinned over the full relevant range.

No Spark session: these are exact-arithmetic facts about the formulas
both engines evaluate; the per-round driver oracle re-checks the
formulas in situ.
"""

from __future__ import annotations

import math
from fractions import Fraction


def _rank_integer(qm: int, n_total: int) -> int:
    """Python replica of quantiles._RANK_SQL:
    (decimal(qm) * n_total + 999999) div 1000000 — integer arithmetic
    end to end, exactly what Spark decimal div and the DuckDB HUGEINT
    // evaluate."""
    return (qm * n_total + 999_999) // 1_000_000


def test_rank_formula_equals_exact_ceil_on_dense_grid():
    """rank = ceil(q·N) for every micro-exact q and N up to 10_000,
    including the q·N exact-integer boundaries where the IEEE product
    rounds UP across the integer (the r8 bug)."""
    qs = [
        0.5, 0.9, 0.95, 0.99, 0.999, 0.1, 0.25, 0.75,
        0.333333, 0.000001, 1.0,
    ]
    ns = list(range(1, 200)) + [999, 1000, 9999, 10_000, 10**12]
    for q in qs:
        qm = int(round(q * 1_000_000))
        qf = Fraction(qm, 1_000_000)
        for n in ns:
            exact = -((-qf * n).__floor__())  # ceil of an exact rational
            assert _rank_integer(qm, n) == exact, (q, n)


def test_rank_formula_exact_integer_boundaries():
    """The r8 regression class, pinned by value with literals whose
    IEEE product really does cross the integer (host-verified by the
    assertions themselves): q=0.07 · 100 = 7.000000000000001 → float
    ceil 8, a full rank high; q=0.55 · 100 = 55.00000000000001 → 56.
    The micro-quantized integer path gives the exact rank."""
    assert math.ceil(0.07 * 100) == 8  # the IEEE trap is real on this host
    assert _rank_integer(70_000, 100) == 7  # ...the integer path dodges it
    assert math.ceil(0.55 * 100) == 56
    assert _rank_integer(550_000, 100) == 55
    assert _rank_integer(900_000, 10) == 9  # the canonical r8 example
    assert _rank_integer(500_000, 2) == 1  # q=0.5, N=2
    assert _rank_integer(250_000, 4) == 1  # q=0.25, N=4
    assert _rank_integer(990_000, 100) == 99  # q=0.99, N=100
    assert _rank_integer(1_000_000, 7) == 7  # q=1.0 is max, never N+1
    # non-exact products still round UP (true ceil semantics)
    assert _rank_integer(900_000, 11) == 10  # ceil(9.9)
    assert _rank_integer(333_333, 3) == 1  # ceil(0.999999)


def test_chunk_count_float_ceil_is_exact_for_integer_operands():
    """text.chunk_documents computes
    ceil((n_tok − overlap) / float(stride)); the oracle computes
    ceil((len − overlap) / stride.0). Both are IEEE double divisions
    of EXACT small integers — correctly-rounded division cannot land
    on the wrong side of an integer (unlike the inexact-coefficient
    MULTIPLY that bit h02). Pin over every (n_tok, chunk, overlap)
    the operators accept up to well past practical sizes, with the
    exact-stride-multiple boundaries called out."""
    for chunk in (1, 2, 3, 8, 64, 128, 512):
        for overlap in range(0, chunk):
            stride = chunk - overlap
            for n in range(1, 4 * chunk + 2):
                got = math.ceil((n - overlap) / float(stride))
                exact = -((overlap - n) // stride)  # integer ceil
                assert got == exact, (n, chunk, overlap)
    # boundary emphasis: n−overlap an exact multiple of stride must
    # give exactly that multiple, not one more
    assert math.ceil((512 * 7 + 64) / float(512 - 448)) >= 1  # smoke
    for k in (1, 2, 5, 100):
        n, ov, st = k * 56 + 8, 8, 56
        assert math.ceil((n - ov) / float(st)) == k


def test_line_count_float_ceil_is_exact():
    """curation_ext._synth_multiline: n_lines = ceil(len(t)/8.0).
    Exact-integer numerator over a power-of-two denominator is always
    an exact IEEE quotient; pinned anyway so a future change of the
    divisor to a non-representable value trips this test."""
    for n in range(1, 100_000, 7):
        assert math.ceil(n / 8.0) == -((-n) // 8)
    for n in (8, 16, 64, 4096, 2**20):  # exact multiples: never n//8+1
        assert math.ceil(n / 8.0) == n // 8
