"""Pin the SQL rewriters behind tools/audit_fp.py (the FP-boundary
oracle audit instrument). These close the three round-11 ADVICE items:
leading/trailing-dot DECIMAL literals, positional two-arg round()
(DuckDB 1.0 macros can't overload arity, so round-stripping is a
paren-aware textual rewrite), and skip/unprobed accounting. No Spark
session needed -- pure string-level checks plus a registry-wide
assertion that every oracle survives the rewrite pipeline."""

import re
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_ROOT))

from tools.audit_fp import _NUMLIT, cast_literals, strip_rounding  # noqa: E402
from dask_distributed_vanilla_spark.plans.registry import all_oracles  # noqa: E402


def test_cast_literals_all_dot_forms():
    assert cast_literals("SELECT .5, 5., 1.25, x + 0.5") == (
        "SELECT CAST(.5 AS DOUBLE), CAST(5. AS DOUBLE), "
        "CAST(1.25 AS DOUBLE), x + CAST(0.5 AS DOUBLE)"
    )


def test_cast_literals_guards_hold():
    # scientific notation, identifiers, strings, $params: untouched
    sql = "SELECT 1.5e3, v1.2, a.5b, '.5 in str', $1.5"
    assert cast_literals(sql) == sql


def test_strip_rounding_one_and_two_arg_round():
    assert strip_rounding("SELECT round(x)") == "SELECT (x)"
    # positional two-arg: the case the r11 pass-through macro rejected
    assert strip_rounding("SELECT ROUND(a + f(b, c), 2)") == "SELECT (a + f(b, c))"


def test_strip_rounding_nested_and_strings():
    assert strip_rounding("SELECT round(round(x, 2) + y, 1)") == "SELECT ((x) + y)"
    assert strip_rounding("SELECT 'round(x, 2)', round(x, 2)") == "SELECT 'round(x, 2)', (x)"


def test_strip_rounding_floor_ceil_and_unbalanced():
    assert strip_rounding("SELECT floor(x*100+0.5)/100, CEIL(y)") == (
        "SELECT (x*100+0.5)/100, (y)"
    )
    # unbalanced input is left as-is rather than corrupted
    assert strip_rounding("round(x") == "round(x"


def test_no_registry_oracle_escapes_numlit():
    """Registry-wide assertion (ADVICE r11): no oracle carries a
    dot-style DECIMAL literal that the rewrite would miss. Any bare
    N.M / N. / .M outside a string must be consumed by _NUMLIT."""
    loose = re.compile(r"(?<![\w.$])(\d+\.\d*|\.\d+)")
    for name, sql in all_oracles().items():
        masked = re.sub(r"'[^']*'", "''", sql)
        for m in loose.finditer(masked):
            # every loose hit must also be a strict _NUMLIT hit at the
            # same offset (i.e. the trailing guard never drops a real
            # literal -- what follows is exponent/identifier, not SQL)
            strict = _NUMLIT.match(masked, m.start())
            tail = masked[m.end():m.end() + 1]
            assert strict or tail in ("e", "E"), (
                f"{name}: literal {m.group(0)!r} at {m.start()} escapes _NUMLIT"
            )


def test_self_floor_shared_rigor_and_exit_codes():
    """ADVICE r12: variant floors are measured by the same 4-run helper
    as the base, and the helper detects a single off-attractor render
    among four. Exit codes 0/1/2/3 are pinned by reading main()."""
    import inspect
    import pandas as pd
    from tools.audit_fp import _self_floor

    a = pd.DataFrame({"v": [0.123456789012345678]})
    b = pd.DataFrame({"v": [0.123456789012345912]})  # differs at ~15g
    assert _self_floor([a, a, a, a]) == 17
    assert _self_floor([a, a, a, b]) < 17  # one bistable render lowers it
    import tools.audit_fp as afp
    src = inspect.getsource(afp.main)
    probe_src = src[src.index("def _probe"):src.index("if has_lits")]
    assert "range(4)" in probe_src and "_self_floor" in probe_src
    assert "base=base" not in src  # dead parameter removed
    assert "return 3" in src  # flags AND skips -> distinct exit code
