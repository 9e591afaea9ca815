"""Golden tests pinning tools/driver_sim.py's value normalizer.

The normalizer is the local stand-in for the external driver's hash: it
must stay TYPE-STRICT (round-1 lesson — a %.9g that collapsed int 3 and
float 3.0 let four oracle-typing bugs ship "green"). These goldens
exercise every branch so a future edit cannot silently re-collapse types.
"""

from __future__ import annotations

import decimal
import sys

sys.path.insert(0, ".")

from tools.driver_sim import norm, value_hash


def test_norm_goldens_every_branch():
    assert norm(None) == "NULL"
    assert norm(True) == "b:True"
    assert norm(False) == "b:False"
    assert norm(3) == "i:3"
    assert norm(-7) == "i:-7"
    assert norm(3.0) == "f:3"
    assert norm(float("nan")) == "NULL"
    assert norm(1.23456789012) == "f:1.23456789"  # %.9g rounding
    assert norm(decimal.Decimal("3.00")) == "d:3.00"
    assert norm([1, 2.0, None]) == "[i:1,f:2,NULL]"
    assert norm((True, "x")) == "[b:True,x]"
    assert norm("s") == "s"


def test_norm_type_strictness():
    """The pairs the driver distinguishes MUST normalize differently."""
    assert norm(3) != norm(3.0)  # int vs float
    assert norm(3.0) != norm(decimal.Decimal("3.0"))  # float vs decimal
    assert norm(3) != norm(decimal.Decimal("3"))  # int vs decimal
    assert norm(True) != norm(1)  # bool vs int
    assert norm(0) != norm(False)
    assert norm("3") != norm(3)  # string vs int
    assert norm("NULL") == norm(None)  # documented collapse: the driver
    # renders SQL NULL and the literal string "NULL" identically


def test_value_hash_column_order_insensitive():
    h1 = value_hash(["b", "a"], [(2.0, 1), (4.0, 3)])
    h2 = value_hash(["a", "b"], [(1, 2.0), (3, 4.0)])
    assert h1 == h2
    # row order insensitive too
    h3 = value_hash(["a", "b"], [(3, 4.0), (1, 2.0)])
    assert h2 == h3
    # but int/float flips change it
    h4 = value_hash(["a", "b"], [(1.0, 2.0), (3.0, 4.0)])
    assert h2 != h4
